"""VAE / ensemble-VAE training drivers.

Reference drivers: ``src/train.py:91-179`` (ensemble: Adam, per-epoch
train/val neg-ELBO, seeded 90/10 split) and
``src/single_decoder/vae_train.py`` (single VAE: beta warm-up
min(1, epoch/30), StepLR(200, 0.5), best-val checkpointing).

TPU-first structure: one jit per *epoch* — shuffle (device-side
permutation), batch reshape and the full batch loop run as ``lax.scan``
inside a single XLA program; the host only sees per-epoch scalar losses.
The dataset (23822 x 50 floats ~ 4.5 MB) lives on device for the whole run.

Semantics delta vs the reference (documented, benign): the trailing partial
batch of each epoch is dropped so batch shapes stay static under jit; the
reference's DataLoader keeps it.  With bs=64 over 21,440 training rows this
drops <0.3% of rows per epoch (reshuffled every epoch, so coverage in
expectation is uniform).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vae_latent_geometry_tpu.config import ModelConfig, TrainConfig
from vae_latent_geometry_tpu.data import train_val_split
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models import vae as vae_lib


def _primary() -> bool:
    """Process-0 write discipline (multi-host): every process computes the
    identical training trajectory (the sharded programs are global), so
    exactly one persists checkpoints — concurrent writers would duplicate
    work and, on a shared filesystem, race the temp+rename."""
    from vae_latent_geometry_tpu.parallel.multihost import is_primary

    return is_primary()


@dataclass
class TrainResult:
    params: object
    best_params: object          # best-val params (== params when not tracked)
    train_losses: np.ndarray     # (epochs,)
    val_losses: np.ndarray       # (epochs,)
    best_val_loss: float


def _lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    if cfg.lr_step_size <= 0:
        return cfg.lr
    boundaries_steps = cfg.lr_step_size * steps_per_epoch

    def sched(step):
        return cfg.lr * (cfg.lr_gamma ** (step // boundaries_steps))

    return sched


def make_block_fn(loss_fn: Callable, opt, batch_size: int, cfg: TrainConfig,
                  track_best: bool = False):
    """Jitted multi-epoch training block: scans ``n_epochs`` epochs (shuffle,
    batch scan, per-epoch val loss, beta warm-up by absolute epoch index)
    inside ONE jit — one host round trip per block instead of per epoch
    (significant on tunneled backends).

    track_best: carry (best_val, best_params) through the epoch scan (the
    single-VAE trainer's best-val checkpointing, reference
    ``src/single_decoder/vae_train.py:99-101`` — done on device instead of a
    host-side deepcopy per epoch); the block then takes and returns the two
    extra operands."""

    body = _make_block_body(loss_fn, opt, batch_size, cfg, track_best)

    @partial(jax.jit, static_argnames=("n_epochs",))
    def train_block(params, opt_state, key, train_x, val_x, epoch0,
                    n_epochs: int, *best):
        return body(params, opt_state, key, train_x, val_x, epoch0,
                    n_epochs, *best)

    return train_block


def make_multiseed_block_fn(loss_fn: Callable, opt, batch_size: int,
                            cfg: TrainConfig):
    """Like :func:`make_block_fn` but vmapped over a leading *seed* axis on
    (params, opt_state, key, train_x, val_x): S independent training runs
    advance in ONE XLA program.  The per-batch MLP matmuls acquire a seed
    batch axis, multiplying MXU arithmetic intensity instead of replaying
    the whole program S times (the reference trains its 6 seed models as 6
    serial processes, src/train.py:126)."""

    body = _make_block_body(loss_fn, opt, batch_size, cfg)

    @partial(jax.jit, static_argnames=("n_epochs",))
    def train_block(params, opt_state, keys, train_x, val_x, epoch0,
                    n_epochs: int):
        return jax.vmap(
            lambda p, o, k, tx, vx: body(p, o, k, tx, vx, epoch0, n_epochs)
        )(params, opt_state, keys, train_x, val_x)

    return train_block


def _make_block_body(loss_fn: Callable, opt, batch_size: int,
                     cfg: TrainConfig, track_best: bool = False):
    def train_block(params, opt_state, key, train_x, val_x, epoch0,
                    n_epochs: int, *best):
        if val_x.shape[0] == 0:
            raise ValueError(
                "empty validation split — per-epoch val losses are part of "
                "the training contract (best-val tracking, loss curves); "
                "use a val_ratio that keeps at least one row")
        n = train_x.shape[0]
        n_batches = n // batch_size
        vb = min(batch_size, val_x.shape[0])
        v_batches = val_x.shape[0] // vb
        val_b = val_x[: v_batches * vb].reshape(v_batches, vb, -1)

        def epoch(carry, e_idx):
            params, opt_state, best_val, best_params = carry
            # keyed by ABSOLUTE epoch index off the run key, so the epoch's
            # randomness is independent of how the run is partitioned into
            # blocks — a resumed run (any boundary) and any block_epochs
            # choice replay the identical trajectory
            ekey = jax.random.fold_in(key, epoch0 + e_idx)
            beta = (jnp.minimum(1.0, (epoch0 + e_idx) / cfg.beta_warmup_epochs)
                    if cfg.beta_warmup_epochs > 0 else jnp.asarray(1.0))
            perm = jax.random.permutation(jax.random.fold_in(ekey, 0), n)
            batches = train_x[perm[: n_batches * batch_size]].reshape(
                n_batches, batch_size, -1)

            def step(c, inp):
                p, o = c
                x, k = inp
                loss, grads = jax.value_and_grad(loss_fn)(p, k, x, beta)
                updates, o = opt.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            keys = jax.random.split(jax.random.fold_in(ekey, 1), n_batches)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, keys))

            vkeys = jax.random.split(jax.random.fold_in(ekey, 2), v_batches)
            vlosses = jax.lax.scan(
                lambda c, inp: (c, loss_fn(params, inp[1], inp[0],
                                           jnp.asarray(1.0))),
                None, (val_b, vkeys))[1]
            vmean = jnp.mean(vlosses)
            if track_best:
                better = vmean < best_val
                best_val = jnp.where(better, vmean, best_val)
                best_params = jax.tree_util.tree_map(
                    lambda bp, p: jnp.where(better, p, bp), best_params,
                    params)
            return ((params, opt_state, best_val, best_params),
                    (jnp.mean(losses), vmean))

        if not track_best:
            best = (jnp.asarray(0.0), jnp.asarray(0.0))  # inert tiny carry
        carry, (tl, vl) = jax.lax.scan(
            epoch, (params, opt_state) + tuple(best), jnp.arange(n_epochs))
        params, opt_state, best_val, best_params = carry
        if track_best:
            return params, opt_state, tl, vl, best_val, best_params
        return params, opt_state, tl, vl

    return train_block


def _cfg_stamp(cfg: TrainConfig, model_cfg: ModelConfig,
               drop_seed: bool = False, **extra) -> dict:
    """Serialize every trajectory-affecting input of a training run into a
    comparable stamp.  A resumed checkpoint is refused unless its stamp
    matches exactly (same policy as optimize_spline_batch's cfg_stamp).

    Deliberately EXCLUDED, because they do not affect the trajectory:
    ``epochs`` (a stop budget — "resume the same run with a larger budget"
    is the canonical legitimate resume) and ``block_epochs`` (per-epoch RNG
    keys are folded by ABSOLUTE epoch index off the run key, so the block
    partitioning — and therefore any resume boundary — cannot change the
    trajectory).  drop_seed: for the multiseed trainer, whose explicit seed
    list supersedes cfg.seed."""
    stamped = dataclasses.asdict(cfg)
    del stamped["epochs"]
    if drop_seed:
        stamped["seed"] = None
    return {
        "cfg": json.dumps(stamped, sort_keys=True, default=str),
        "model_cfg": json.dumps(dataclasses.asdict(model_cfg),
                                sort_keys=True, default=str),
        **extra,
    }


def _check_resume_stamp(path: str, cfg_stamp: dict, label: str) -> None:
    """Validate a checkpoint's config stamp BEFORE the structured load (a
    foreign-config checkpoint must be refused with the stamp diagnostic,
    not a shape mismatch from deep inside the tree)."""
    from vae_latent_geometry_tpu.io.checkpoint import load_meta

    stored_stamp = load_meta(path).get("cfg_stamp")
    if stored_stamp is None:
        warn(f"{label} checkpoint {path!r} carries no config stamp "
             "(pre-stamp format); resuming without validation — the "
             "restored trajectory may not match this run's config")
    elif stored_stamp != cfg_stamp:
        raise ValueError(
            f"{label} checkpoint {path!r} was written by a different run "
            f"setup and cannot be resumed here:\n"
            f"  checkpoint: {stored_stamp}\n  this run:   {cfg_stamp}\n"
            "delete the checkpoint (or point checkpoint_path elsewhere) "
            "to start fresh")


def train_evae(data: np.ndarray, cfg: TrainConfig = TrainConfig(),
               model_cfg: ModelConfig = ModelConfig(),
               params: Optional[evae_lib.EVAEParams] = None,
               log_every: int = 10,
               callback: Optional[Callable] = None,
               block_epochs: int = 20,
               checkpoint_path: Optional[str] = None) -> TrainResult:
    """Train the ensemble VAE (reference ``src/train.py``).

    Runs in jitted multi-epoch blocks (``block_epochs`` per device call);
    no best-val tracking is needed for this family (the reference saves the
    final state only, src/train.py:165).

    checkpoint_path: when set, the FULL training state (params + Adam
    moments + epoch + loss history) is persisted after every block and a
    preempted run resumes exactly where it stopped — the resumed loss curve
    is bitwise-identical to the uninterrupted one regardless of where the
    interruption fell or what ``block_epochs`` either run used (per-epoch
    keys are folded by absolute epoch index off the run key)."""
    key = jax.random.PRNGKey(cfg.seed)
    init_key, train_key = jax.random.split(key)
    if params is None:
        params = evae_lib.evae_init(init_key, model_cfg)

    train_idx, val_idx = train_val_split(len(data), cfg.val_ratio, cfg.seed)
    train_x = jnp.asarray(data[train_idx])
    val_x = jnp.asarray(data[val_idx])

    opt = optax.adam(_lr_schedule(cfg, len(train_idx) // cfg.batch_size))
    opt_state = opt.init(params)

    cfg_stamp = _cfg_stamp(cfg, model_cfg)

    train_losses, val_losses = [], []
    epoch = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        from vae_latent_geometry_tpu.io.checkpoint import load_train_state

        _check_resume_stamp(checkpoint_path, cfg_stamp, "training")
        params, opt_state, meta = load_train_state(
            checkpoint_path, params, opt_state)
        epoch = int(meta["epoch"])
        train_losses = list(meta.get("train_losses", []))
        val_losses = list(meta.get("val_losses", []))
        if log_every:
            print(f"[resume] training state restored at epoch {epoch}")

    # thread the per-epoch warm-up through as a RAMP on the model's own
    # KL weight (beta_warmup_epochs=0, the default, keeps the ramp at
    # 1.0, i.e. exactly cfg.beta — the reference ensemble trainer's
    # constant beta, upstream src/train.py:62)
    loss_fn = lambda p, k, x, ramp: evae_lib.neg_elbo(
        p, k, x, model_cfg, ramp * model_cfg.beta)
    train_block = make_block_fn(loss_fn, opt, cfg.batch_size, cfg)

    while epoch < cfg.epochs:
        n_ep = min(block_epochs, cfg.epochs - epoch)
        params, opt_state, tl, vl = train_block(
            params, opt_state, train_key, train_x, val_x, epoch, n_ep)
        tl, vl = np.asarray(tl), np.asarray(vl)
        train_losses.extend(tl.tolist())
        val_losses.extend(vl.tolist())
        if log_every:
            print(f"epoch {epoch + n_ep:4d} | train {tl[-1]:10.3f} "
                  f"| val {vl[-1]:10.3f}")
        if callback is not None:
            # NOTE: invoked once per BLOCK (epoch index of the block's last
            # epoch, block-final params/losses) — per-epoch hooks would
            # force a host round trip per epoch, defeating the block design
            callback(epoch + n_ep - 1, params, float(tl[-1]), float(vl[-1]))
        epoch += n_ep
        if checkpoint_path is not None and _primary():
            from vae_latent_geometry_tpu.io.checkpoint import (
                save_train_state,
            )

            save_train_state(
                params, opt_state, checkpoint_path, epoch=epoch,
                extra_meta={"train_losses": train_losses,
                            "val_losses": val_losses,
                            "seed": cfg.seed,
                            "cfg_stamp": cfg_stamp})
    return TrainResult(
        params=params, best_params=params,
        train_losses=np.asarray(train_losses),
        val_losses=np.asarray(val_losses),
        best_val_loss=float(val_losses[-1]) if val_losses else float("inf"),
    )


def train_evae_multiseed(data: np.ndarray, seeds,
                         cfg: TrainConfig = TrainConfig(),
                         model_cfg: ModelConfig = ModelConfig(),
                         log_every: int = 10,
                         block_epochs: int = 20,
                         checkpoint_path: Optional[str] = None,
                         mesh=None):
    """Train S independent ensemble VAEs — one per seed — in ONE vmapped
    XLA program; returns ``{seed: TrainResult}``.

    Each seed's trajectory is exactly the one ``train_evae`` with
    ``cfg.seed = s`` would produce (same init key, same seeded 90/10 split,
    same per-epoch shuffle keys); the seed axis is purely a vmap batch axis.
    The reference needs all six seed models (12..456) for its CoV analysis
    and trains them as six serial processes (``src/train.py:126``,
    ``src/eval.py:94``); here the tiny MLP matmuls gain a seed batch axis,
    so the MXU does 6x the arithmetic per weight load instead of the whole
    600-epoch program running six times.

    checkpoint_path: as in :func:`train_evae` — the full stacked state
    (params + Adam moments of every seed) is persisted per block; the stamp
    covers the seed list, so a resume with different seeds is refused.

    mesh: optional ('dp','ep') :class:`jax.sharding.Mesh`.  The seed axis —
    embarrassingly parallel (the S runs never communicate) — shards over
    'dp': every input's leading axis gets ``PartitionSpec('dp')`` and GSPMD
    partitions the vmapped program with zero collectives, so S seeds on S
    chips cost one seed's wall clock.  Requires ``S % dp == 0`` (seed runs
    cannot be split).
    """
    seeds = [int(s) for s in seeds]
    if len(set(seeds)) != len(seeds):
        raise ValueError(
            f"duplicate seeds in {seeds}: each vmapped run costs a full "
            "seed's compute but duplicates collapse in the results dict — "
            "pass each seed once")
    if mesh is not None and len(seeds) % mesh.shape["dp"] != 0:
        raise ValueError(
            f"multiseed training shards whole seed runs over 'dp': "
            f"{len(seeds)} seeds do not divide over dp={mesh.shape['dp']}; "
            "pick a dp that divides the seed count (or pad the seed list)")
    per_seed = []
    for s in seeds:
        init_key, train_key = jax.random.split(jax.random.PRNGKey(s))
        params_s = evae_lib.evae_init(init_key, model_cfg)
        tr_idx, va_idx = train_val_split(len(data), cfg.val_ratio, s)
        per_seed.append((params_s, train_key, tr_idx, va_idx))

    params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[p for p, _, _, _ in per_seed])
    train_keys = jnp.stack([k for _, k, _, _ in per_seed])
    train_x = jnp.stack([jnp.asarray(data[idx]) for _, _, idx, _ in per_seed])
    val_x = jnp.stack([jnp.asarray(data[idx]) for _, _, _, idx in per_seed])

    steps_per_epoch = train_x.shape[1] // cfg.batch_size
    opt = optax.adam(_lr_schedule(cfg, steps_per_epoch))
    # init per seed then stack EVERY leaf (including adam's scalar step
    # count, which becomes an (S,) vector) so the whole optimizer state
    # carries the seed axis and vmaps uniformly with in_axes=0
    opt_state = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[opt.init(p) for p, _, _, _ in per_seed])

    if mesh is not None:
        from vae_latent_geometry_tpu.parallel.mesh import named_sharding

        seed_sh = named_sharding(mesh, "dp")  # P('dp'): dim 0 sharded,
        put = lambda x: jax.device_put(x, seed_sh)  # the rest replicated
        params = jax.tree_util.tree_map(put, params)
        opt_state = jax.tree_util.tree_map(put, opt_state)
        train_keys = put(train_keys)
        train_x, val_x = put(train_x), put(val_x)

    cfg_stamp = _cfg_stamp(cfg, model_cfg, drop_seed=True, seeds=seeds)

    train_losses, val_losses = [], []  # lists of (S,) rows
    epoch = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        from vae_latent_geometry_tpu.io.checkpoint import load_train_state

        _check_resume_stamp(checkpoint_path, cfg_stamp,
                            "multiseed training")
        params, opt_state, meta = load_train_state(
            checkpoint_path, params, opt_state)
        if mesh is not None:  # restore the seed-axis sharding lost in the
            params = jax.tree_util.tree_map(put, params)     # host round
            opt_state = jax.tree_util.tree_map(put, opt_state)  # trip
        epoch = int(meta["epoch"])
        train_losses = [list(r) for r in meta.get("train_losses", [])]
        val_losses = [list(r) for r in meta.get("val_losses", [])]
        if log_every:
            print(f"[resume] multiseed training state restored at epoch "
                  f"{epoch}")

    # thread the per-epoch warm-up through as a RAMP on the model's own
    # KL weight (beta_warmup_epochs=0, the default, keeps the ramp at
    # 1.0, i.e. exactly cfg.beta — the reference ensemble trainer's
    # constant beta, upstream src/train.py:62)
    loss_fn = lambda p, k, x, ramp: evae_lib.neg_elbo(
        p, k, x, model_cfg, ramp * model_cfg.beta)
    train_block = make_multiseed_block_fn(loss_fn, opt, cfg.batch_size, cfg)

    while epoch < cfg.epochs:
        n_ep = min(block_epochs, cfg.epochs - epoch)
        params, opt_state, tl, vl = train_block(
            params, opt_state, train_keys, train_x, val_x, epoch, n_ep)
        tl, vl = np.asarray(tl), np.asarray(vl)      # (S, n_ep)
        train_losses.extend(tl.T.tolist())           # rows of (S,)
        val_losses.extend(vl.T.tolist())
        if log_every:
            print(f"epoch {epoch + n_ep:4d} | train "
                  + " ".join(f"{v:9.2f}" for v in tl[:, -1])
                  + " | val "
                  + " ".join(f"{v:9.2f}" for v in vl[:, -1]))
        epoch += n_ep
        if checkpoint_path is not None and _primary():
            from vae_latent_geometry_tpu.io.checkpoint import (
                save_train_state,
            )

            save_train_state(
                params, opt_state, checkpoint_path, epoch=epoch,
                extra_meta={"train_losses": train_losses,
                            "val_losses": val_losses,
                            "cfg_stamp": cfg_stamp})

    # reshape guards the epochs=0 / empty-history case (np.asarray([]) is
    # 1-D and would reject the [:, i] column index)
    tl_mat = np.asarray(train_losses).reshape(-1, len(seeds))  # (epochs, S)
    vl_mat = np.asarray(val_losses).reshape(-1, len(seeds))
    results = {}
    for i, s in enumerate(seeds):
        results[s] = TrainResult(
            params=jax.tree_util.tree_map(lambda x: x[i], params),
            best_params=jax.tree_util.tree_map(lambda x: x[i], params),
            train_losses=tl_mat[:, i], val_losses=vl_mat[:, i],
            best_val_loss=float(vl_mat[-1, i]) if len(vl_mat) else float("inf"),
        )
    return results


def train_single_vae(data: np.ndarray, cfg: TrainConfig = TrainConfig(),
                     model_cfg: ModelConfig = vae_lib.LEGACY_CONFIG,
                     params: Optional[vae_lib.VAEParams] = None,
                     log_every: int = 10,
                     callback: Optional[Callable] = None,
                     block_epochs: int = 20,
                     checkpoint_path: Optional[str] = None) -> TrainResult:
    """Train the legacy single VAE with beta warm-up + StepLR + best-val
    tracking (reference ``src/single_decoder/vae_train.py``: beta =
    min(1, epoch/30) at :77, StepLR(200, 0.5) at :63, best-val checkpoint
    at :99-101).

    Runs in the same jitted multi-epoch blocks as :func:`train_evae`, with
    the best-val state (value + params) carried INSIDE the epoch scan —
    per-epoch best tracking without a host round trip per epoch (the
    reference deepcopies the model on the host every improvement).

    checkpoint_path: full-state resume as in :func:`train_evae`; the best
    (val, params) pair is part of the persisted state, so a resumed run
    restores the same best-val checkpoint semantics."""
    key = jax.random.PRNGKey(cfg.seed)
    init_key, train_key = jax.random.split(key)
    if params is None:
        params = vae_lib.vae_init(init_key, model_cfg)

    train_idx, val_idx = train_val_split(len(data), cfg.val_ratio, cfg.seed)
    train_x = jnp.asarray(data[train_idx])
    val_x = jnp.asarray(data[val_idx])

    opt = optax.adam(_lr_schedule(cfg, len(train_idx) // cfg.batch_size))
    opt_state = opt.init(params)
    best_val = jnp.asarray(jnp.inf)
    best_params = params

    cfg_stamp = _cfg_stamp(cfg, model_cfg, family="single_vae")

    train_losses, val_losses = [], []
    epoch = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        from vae_latent_geometry_tpu.io.checkpoint import load_train_state

        _check_resume_stamp(checkpoint_path, cfg_stamp,
                            "single-VAE training")
        params, opt_state, extra, meta = load_train_state(
            checkpoint_path, params, opt_state,
            extra_state_like={"best_val": best_val,
                              "best_params": best_params})
        best_val, best_params = extra["best_val"], extra["best_params"]
        epoch = int(meta["epoch"])
        train_losses = list(meta.get("train_losses", []))
        val_losses = list(meta.get("val_losses", []))
        if log_every:
            print(f"[resume] single-VAE training state restored at epoch "
                  f"{epoch}")

    loss_fn = lambda p, k, x, beta: -vae_lib.elbo(p, k, x, beta, model_cfg)
    train_block = make_block_fn(loss_fn, opt, cfg.batch_size, cfg,
                                track_best=True)

    while epoch < cfg.epochs:
        n_ep = min(block_epochs, cfg.epochs - epoch)
        params, opt_state, tl, vl, best_val, best_params = train_block(
            params, opt_state, train_key,
            train_x, val_x, epoch, n_ep, best_val, best_params)
        tl, vl = np.asarray(tl), np.asarray(vl)
        train_losses.extend(tl.tolist())
        val_losses.extend(vl.tolist())
        if log_every:
            print(f"epoch {epoch + n_ep:4d} | train {tl[-1]:10.3f} "
                  f"| val {vl[-1]:10.3f}")
        if callback is not None:
            callback(epoch + n_ep - 1, params, float(tl[-1]), float(vl[-1]))
        epoch += n_ep
        if checkpoint_path is not None and _primary():
            from vae_latent_geometry_tpu.io.checkpoint import (
                save_train_state,
            )

            save_train_state(
                params, opt_state, checkpoint_path, epoch=epoch,
                extra_meta={"train_losses": train_losses,
                            "val_losses": val_losses,
                            "cfg_stamp": cfg_stamp},
                extra_state={"best_val": best_val,
                             "best_params": best_params})

    return TrainResult(
        params=params, best_params=best_params,
        train_losses=np.asarray(train_losses),
        val_losses=np.asarray(val_losses),
        best_val_loss=float(best_val),
    )
