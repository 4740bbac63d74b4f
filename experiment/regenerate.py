"""Regenerate every measured experiment artifact on the real TPU.

Round-2 context: round 1's TPU numbers were produced before the matmul
precision fix (docs/NUMERICS.md) — the arithmetic under them was bf16
rounding noise, so every timing/matrix artifact here is re-measured on
correct numerics.  Run stages selectively:

    python experiment/regenerate.py golden_a golden_b full133 \
        full133_entropy full133_mc cov train

Each stage writes its JSON artifact(s) under experiment/ and prints a
one-line summary.  Stage configs mirror the reference workloads exactly
(SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "experiment")

# Bulk optimization precision: f32x2 (2-pass; bf16 weights are a t-constant
# smooth decoder perturbation, final energies re-evaluated at float32 —
# docs/NUMERICS.md).  The MC stage uses f32x3 to keep the sampled estimator's
# per-step values near-exact as well.
BULK_PREC = "f32x2"


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    jax.device_put(np.zeros(8))
    float(jnp.sum(jnp.zeros(8)))      # tunnel warmup (block_until_ready no-op)
    return jax


def _write(name: str, payload: dict):
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"[regenerate] wrote {path}", flush=True)


def stage_golden_a():
    """Trajectory goldens: same inits as the reference's stored runs."""
    import golden_real_data as G

    G._setup_jax()
    out = {"mode": G.MODE}
    out.update(G.tier_a())
    path = os.path.join(OUT, "golden_real_data.json")
    existing = json.load(open(path)) if os.path.exists(path) else {}
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print("[regenerate] golden_a done", flush=True)


def stage_golden_b():
    """Full 133x133 from-scratch reproduction for both real seeds."""
    from vae_latent_geometry_tpu.pipeline.golden import run_golden

    for seed in (12, 123):
        # fresh run: drop any prior checkpoint blob or the optimize stage
        # resumes it and measures nothing
        stale = os.path.join(OUT, f"golden133_seed{seed}_blob.npz")
        if os.path.exists(stale):
            os.remove(stale)
        t0 = time.perf_counter()
        rep = run_golden(seed, OUT, steps=500, num_t=2000, batch_size=500,
                         mode="single_fused")
        rep["wall_s"] = round(time.perf_counter() - t0, 1)
        _write(f"golden133_seed{seed}_compare.json", rep)
        s = rep["vs_golden"]
        print(f"[golden_b seed {seed}] median_rel={s['median_rel']:.4f} "
              f"r={s['pearson_r']:.4f} frob={s['rel_frobenius']:.4f} "
              f"({rep['wall_s']}s)", flush=True)


def _full133(tag: str, mode: str, prec: str, use_entropy: bool):
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline

    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    t0 = time.perf_counter()
    res = run_distance_pipeline(
        params, data.x, data.labels, max_labels=133,
        init_cfg=InitConfig(use_entropy=use_entropy),
        geo_cfg=GeodesicConfig(
            steps=1000, batch_size=200,
            energy=EnergyConfig(num_t=2000, mode=mode,
                                kernel_precision=prec)),
        verbose=False,
    )
    wall = time.perf_counter() - t0
    _write(f"full133_{tag}_timing.json", {
        "note": "timing excludes one-time per-process tunnel warmup; "
                "numerics-correct rerun (docs/NUMERICS.md)",
        "workload": f"133 classes, 8778 pairs, 10 decoders, 1000 steps/pair, "
                    f"T=2000, {mode}@{prec}, single v5e chip",
        "wall_clock_seconds": round(wall, 1),
        "stage_timings": {k: round(v, 2) for k, v in res.timings.items()},
        "pairs_valid": int(res.artifact.valid.sum()),
        "matrix_labels": len(res.labels),
        "data": "synthetic surrogate (tasic-pca50.npy missing upstream) + "
                "reference model_seed12.pt",
    })
    with open(os.path.join(OUT, "plots",
                           f"geodesic_matrix_seed12_{tag}_133.json"), "w") as f:
        json.dump({"seed": 12, "cluster_ids": list(res.labels),
                   "distance_matrix": res.matrix.tolist()}, f)
    print(f"[full133 {tag}] {wall:.0f}s "
          f"(opt {res.timings['optimize']:.0f}s)", flush=True)
    return res


def stage_full133():
    _full133("euclidean", "expected_fused", BULK_PREC, False)


def stage_full133_entropy():
    _full133("entropy", "expected_fused", BULK_PREC, True)


def stage_full133_mc():
    _full133("mc", "mc_fused", "f32x3", False)


def stage_golden_ensemble():
    """Strict per-pair dominance for all four committed ensemble opt blobs
    (seeds 12/123 x euclidean/entropy): 800 steps from the reference's own
    omega_init at reference quadrature must end at expected energies <= the
    stored solutions' on EVERY pair (the stored runs are 1000 under-converged
    MC steps).  Complements the suite's 400-step agreement tests
    (tests/test_optimize.py::test_golden_ensemble_all_blobs)."""
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.geometry.spline import (
        design_matrix,
        eval_spline_design,
    )
    from vae_latent_geometry_tpu.models.torch_import import (
        load_evae_checkpoint,
        load_spline_blob,
    )
    from vae_latent_geometry_tpu.optim.geodesic import optimize_splines

    out = {}
    for seed in (12, 123):
        params = load_evae_checkpoint(f"{REF}/experiment/model_seed{seed}.pt")
        for init in ("euclidean", "entropy"):
            blob = load_spline_blob(
                f"{REF}/experiment/splines_opt_model_seed{seed}/"
                f"spline_batch_opt_{init}_10.pt")
            d = blob["spline_data"]
            a = jnp.stack([jnp.asarray(x["a"]) for x in d])
            b = jnp.stack([jnp.asarray(x["b"]) for x in d])
            stored = np.array([x["geodesic_length"] for x in d])
            basis = np.asarray(d[0]["basis"])
            om0 = jnp.stack([jnp.asarray(x["omega_init"]) for x in d])
            t0 = time.perf_counter()
            cfg = GeodesicConfig(steps=800, lr=1e-2,
                                 energy=EnergyConfig(num_t=2000,
                                                     mode="expected"))
            res = optimize_splines(params.decoders, om0, a, b, basis, cfg)
            t = jnp.linspace(0.0, 1.0, 2000)
            phi = design_matrix(t, jnp.asarray(basis), 4)
            gamma = eval_spline_design(res.omega, a, b, phi, t)
            e_ours = np.asarray(E.energy_expected(params.decoders, gamma))
            om_ref = jnp.stack([jnp.asarray(x["omega_optimized"])
                                for x in d])
            g_ref = eval_spline_design(om_ref, a, b, phi, t)
            e_ref = np.asarray(E.energy_expected(params.decoders, g_ref))
            lengths = np.sqrt(e_ours)
            rel = np.abs(lengths - stored) / stored
            key = f"seed{seed}_{init}"
            out[key] = {
                "n_pairs": len(d),
                "worst_energy_ratio": float(np.max(e_ours / e_ref)),
                "n_pairs_worse_than_ref": int(np.sum(e_ours > e_ref)),
                "median_rel_length_vs_stored": float(np.median(rel)),
                "pearson_r_lengths": float(np.corrcoef(lengths, stored)[0, 1]),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            print(f"[golden_ensemble {key}] worst ratio "
                  f"{out[key]['worst_energy_ratio']:.4f}, "
                  f"med rel {out[key]['median_rel_length_vs_stored']:.4f}",
                  flush=True)
    out["config"] = {"steps": 800, "lr": 1e-2, "num_t": 2000,
                     "mode": "expected",
                     "init": "reference omega_init (Dijkstra+LBFGS)"}
    _write("golden_ensemble_compare.json", out)


def stage_dscale():
    """The decoder-sigma=0.1 variant (reference ``experiment_dscale_0.1/``,
    which ships only trained models + plots; sigma is hard-coded upstream at
    src/train.py:46, config-reachable here via ModelConfig.decoder_sigma):
    reproduce the latent plot and run a 10-rep geodesic matrix on the REAL
    committed dscale model — demonstrating the config axis end to end.
    Note the decoder observation sigma affects training only; the pullback
    geometry uses decoder means, so the variant's geometry differs through
    its differently-trained weights."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models import evae as evae_lib
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline

    ckpt = f"{REF}/experiment_dscale_0.1/model_seed12.pt"
    params = load_evae_checkpoint(ckpt)
    data = load_tasic()
    lat = np.asarray(jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(params, jnp.asarray(data.x)))
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(lat[:, 0], lat[:, 1], s=2,
               c=data.colors if data.colors is not None else "k", alpha=0.5)
    ax.set_title("Latents, decoder sigma=0.1 model (seed 12)")
    ax.set_aspect("equal")
    plt.tight_layout()
    plt.savefig(os.path.join(OUT, "plots", "dscale01_latent_seed12.png"),
                dpi=200)
    plt.close(fig)

    t0 = time.perf_counter()
    res = run_distance_pipeline(
        params, data.x, data.labels, max_labels=10,
        init_cfg=InitConfig(use_entropy=False),
        geo_cfg=GeodesicConfig(
            steps=1000, batch_size=200,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision=BULK_PREC)),
        verbose=False,
    )
    wall = time.perf_counter() - t0
    _write("dscale01_seed12_result.json", {
        "model": "reference experiment_dscale_0.1/model_seed12.pt "
                 "(decoder sigma=0.1 variant)",
        "workload": "10 reps / 45 pairs, 1000 steps, T=2000, "
                    f"expected_fused@{BULK_PREC}",
        "wall_clock_seconds": round(wall, 1),
        "cluster_ids": list(res.labels),
        "distance_matrix": res.matrix.tolist(),
        "latent_std": [float(s) for s in lat.std(axis=0)],
        "data": "synthetic surrogate (upstream pca50 missing)",
    })
    print(f"[dscale] {wall:.0f}s, latent std {lat.std(axis=0)}", flush=True)


def stage_full133_earlystop():
    """Full 133x133 with batched early stopping (round-3 verdict item 5):
    chunk-level convergence exit instead of the fixed 1000-step budget.
    Asserts energy dominance against the committed fixed-run matrix.

    MEASURED NEGATIVE RESULT (probe_convergence.py /
    convergence_probe.json): at the reference recipe (Adam lr=1e-3) NO
    spline of the 600 probed meets a (patience=100, rel-delta<=1e-4)
    convergence criterion inside the 1000-step budget — Adam keeps
    improving every spline throughout — so early stopping cannot reduce
    this workload's wall clock (this run: every chunk burned the full
    budget; the +31% vs the fixed run is block-scan overhead + a fresh
    compile).  The wall-clock lever that DOES work is the cosine
    two-phase fast recipe (stage_full133_fast / fast_recipe_probe2.json)."""
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline

    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    t0 = time.perf_counter()
    res = run_distance_pipeline(
        params, data.x, data.labels, max_labels=133,
        init_cfg=InitConfig(use_entropy=False),
        geo_cfg=GeodesicConfig(
            steps=1000, batch_size=200, early_stop=True,
            # delta 1e-5 (not the reference single-spline 1e-6): at lr 1e-3
            # per-step improvements sit above 1e-6 for most of the run, so
            # the tighter delta never triggers and saves nothing (measured)
            patience=100, delta=1e-5,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision=BULK_PREC)),
        verbose=False,
    )
    wall = time.perf_counter() - t0

    fixed_path = os.path.join(OUT, "plots",
                              "geodesic_matrix_seed12_euclidean_133.json")
    cmp = None
    if os.path.exists(fixed_path):
        fixed = json.load(open(fixed_path))
        fm = np.asarray(fixed["distance_matrix"], float)
        labels_f = list(fixed["cluster_ids"])
        if labels_f == list(res.labels):
            iu = np.triu_indices(len(labels_f), k=1)
            es, fx = res.matrix[iu], fm[iu]
            ok = np.isfinite(es) & np.isfinite(fx)
            rel = np.abs(es[ok] - fx[ok]) / np.maximum(fx[ok], 1e-12)
            # lengths = sqrt(energy): dominance in energy <=> in length
            worse = float(np.max(es[ok] / np.maximum(fx[ok], 1e-12)))
            cmp = {"n_common": int(ok.sum()),
                   "median_rel_vs_fixed": float(np.median(rel)),
                   "p99_rel_vs_fixed": float(np.quantile(rel, 0.99)),
                   "max_len_ratio_vs_fixed": worse}
            print(f"[full133 earlystop] vs fixed: med rel "
                  f"{cmp['median_rel_vs_fixed']:.2e}, worst ratio "
                  f"{worse:.4f}", flush=True)
    _write("full133_earlystop_timing.json", {
        "note": "batched early stopping (patience=100, delta=1e-5, "
                "best-restore, exact-f32 final re-evaluation); timing "
                "excludes one-time tunnel warmup.  MEASURED NEGATIVE "
                "RESULT: no spline converges by this criterion inside the "
                "budget (convergence_probe.json), so every chunk burns the "
                "full 1000 steps and early stopping cannot beat the fixed "
                "run here; kept as mechanism validation",
        "workload": "133 classes, 8778 pairs, 10 decoders, <=1000 steps/pair "
                    f"early-stopped, T=2000, expected_fused@{BULK_PREC}, "
                    "single v5e chip",
        "wall_clock_seconds": round(wall, 1),
        "stage_timings": {k: round(v, 2) for k, v in res.timings.items()},
        "pairs_valid": int(res.artifact.valid.sum()),
        "fixed_run_comparison": cmp,
        "data": "synthetic surrogate (tasic-pca50.npy missing upstream) + "
                "reference model_seed12.pt",
    })
    print(f"[full133 earlystop] {wall:.0f}s "
          f"(opt {res.timings['optimize']:.0f}s)", flush=True)


def stage_cov():
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.evaluate import cov_analysis
    from vae_latent_geometry_tpu.pipeline.select_pairs import load_pairs

    seeds = [12, 123, 1234, 12345, 45, 456]
    models = [load_evae_checkpoint(f"{REF}/experiment/model_seed{s}.pt")
              for s in seeds]
    _, pairs = load_pairs(f"{REF}/experiment/pairs/selected_pairs_15.json")
    data = load_tasic()
    t0 = time.perf_counter()
    res = cov_analysis(models, seeds, data.x, pairs, steps=300, num_t=2000,
                       mode="mc_fused", batch_size=200)
    wall = time.perf_counter() - t0
    payload = res.to_json()
    payload.update({
        "workload": "105 pairs x 6 seeds x 10 decoder-counts x 300 steps, "
                    "T=2000, mc_fused@f32x3 (per-spline num_active), "
                    "single v5e",
        "reference_equivalent":
            "6300 serial 300-step optimizations (src/eval.py:74-176)",
        "wall_clock_seconds": round(wall, 1),
        "note": "numerics-correct rerun (docs/NUMERICS.md); data is the "
                "synthetic surrogate",
    })
    _write("cov_timing.json", payload)
    print(f"[cov] {wall:.0f}s  k=1 {res.avg_cov_geodesic[1]:.4f} "
          f"k=10 {res.avg_cov_geodesic[10]:.4f} "
          f"eucl {res.avg_cov_euclidean:.4f}", flush=True)


def stage_train():
    from vae_latent_geometry_tpu.config import TrainConfig
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.pipeline.train import train_evae

    data = load_tasic()
    # two invocations: the first carries the process's compile/cache-load
    # state, the second is in-process steady state (same convention as
    # stage_dp_slice / stage_train_multiseed)
    t0 = time.perf_counter()
    train_evae(data.x, TrainConfig(epochs=600, seed=42), log_every=0)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = train_evae(data.x, TrainConfig(epochs=600, seed=42), log_every=0)
    steady = time.perf_counter() - t0
    _write("train_timing.json", {
        "workload": "EVAE 600 epochs, bs 64, 10 decoders, 23822x50 "
                    "surrogate, single v5e",
        "wall_clock_seconds": round(steady, 1),
        "first_invocation_seconds": round(first, 1),
        "final_val_loss": float(np.asarray(out.val_losses)[-1]),
        "note": "numerics-correct rerun; package-global highest matmul "
                "precision applies to training too (docs/NUMERICS.md). "
                "wall_clock_seconds is the in-process steady state; the "
                "first invocation pays block compiles or persistent-cache "
                "executable loads depending on process state",
    })
    print(f"[train] 600 epochs in {steady:.1f}s steady "
          f"(first {first:.1f}s)", flush=True)


def stage_train_multiseed():
    """Train the reference's six CoV seed models (src/eval.py:94 needs
    model_seed{12,123,1234,12345,45,456}.pt; the reference produces them as
    six serial `python -m src.train` runs, src/train.py:126) in ONE vmapped
    XLA program, and time it against a measured single-seed serial run from
    the same session (so the ratio is apples-to-apples on this chip)."""
    from vae_latent_geometry_tpu.config import TrainConfig
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.pipeline.train import (train_evae,
                                                        train_evae_multiseed)

    seeds = [12, 123, 1234, 12345, 45, 456]
    data = load_tasic()
    cfg = TrainConfig(epochs=600, batch_size=64)

    # Both arms run TWICE: the first invocation carries whatever compile /
    # executable-load state the process happens to be in (an earlier run
    # of this stage recorded a hot in-process serial arm against a
    # cache-loading vmapped arm and got a meaningless ratio), the second
    # is steady state.  The ratio is steady-vs-steady.
    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = fn()
        return r, first, time.perf_counter() - t0

    single, s_first, s_steady = timed(
        lambda: train_evae(data.x, TrainConfig(epochs=600, seed=seeds[0]),
                           log_every=0))
    multi, m_first, m_steady = timed(
        lambda: train_evae_multiseed(data.x, seeds, cfg, log_every=0))

    # the vmapped run must reproduce the serial trajectory (same chip, same
    # program modulo the vmap batch axis) — final val losses should agree
    # closely; exact equality is asserted on CPU in tests/test_train.py
    v_serial = float(np.asarray(single.val_losses)[-1])
    v_multi = float(np.asarray(multi[seeds[0]].val_losses)[-1])
    _write("multiseed_train_timing.json", {
        "workload": "6 independent EVAE seed models (12..456), 600 epochs "
                    "each, bs 64, 10 decoders, 23822x50 surrogate, ONE "
                    "vmapped XLA program, single v5e",
        "wall_clock_seconds": round(m_steady, 1),
        "first_invocation_seconds": round(m_first, 1),
        "serial_one_seed_seconds": round(s_steady, 1),
        "serial_one_seed_first_invocation_seconds": round(s_first, 1),
        "serial_six_seed_estimate_seconds": round(6 * s_steady, 1),
        "speedup_vs_serial_steady": round(6 * s_steady / m_steady, 2),
        "final_val_losses": {str(s): float(np.asarray(r.val_losses)[-1])
                             for s, r in multi.items()},
        "seed12_val_serial_vs_vmapped": [v_serial, v_multi],
        "note": "trajectory equality of the vmapped path vs per-seed serial "
                "runs is asserted bitwise on CPU "
                "(tests/test_train.py::test_multiseed_training_matches_"
                "serial_runs); on TPU the batched matmul tilings may "
                "reassociate sums, so the cross-check here is final-loss "
                "agreement.  Steady-state ratio is in-process warm on BOTH "
                "arms; against the reference's actual workflow (six fresh "
                "`python -m src.train` processes, each paying startup + "
                "compile/executable loads) the one-program path "
                "additionally saves five process bring-ups — use the "
                "first-invocation numbers for that comparison",
    })
    print(f"[train-multiseed] 6 seeds in {m_steady:.1f}s steady "
          f"(first {m_first:.1f}s; serial est {6 * s_steady:.1f}s, "
          f"{6 * s_steady / m_steady:.2f}x)", flush=True)


def _run_full133_two_phase(tag, steps, traj_num_t, polish_steps, note,
                           phase_plan=None, mode="expected_fused",
                           prec=None, fixed_tag="euclidean"):
    """Shared driver for the multi-phase (coarse-T trajectory + full-T
    polish, or an explicit phase_plan ladder) full-matrix recipes; writes
    full133_<tag>_timing.json with a dominance comparison against the
    committed fixed-1000-step matrix for ``fixed_tag``."""
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.full_run import run_distance_pipeline

    prec = prec or BULK_PREC
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    t0 = time.perf_counter()
    res = run_distance_pipeline(
        params, data.x, data.labels, max_labels=133,
        init_cfg=InitConfig(use_entropy=False),
        geo_cfg=GeodesicConfig(
            steps=steps, lr=3e-3, lr_schedule="cosine", batch_size=200,
            traj_num_t=traj_num_t, polish_steps=polish_steps, polish_lr=1e-3,
            phase_plan=phase_plan,
            energy=EnergyConfig(num_t=2000, mode=mode,
                                kernel_precision=prec)),
        verbose=False,
    )
    wall = time.perf_counter() - t0

    fixed_path = os.path.join(OUT, "plots",
                              f"geodesic_matrix_seed12_{fixed_tag}_133.json")
    cmp = None
    if os.path.exists(fixed_path):
        fixed = json.load(open(fixed_path))
        fm = np.asarray(fixed["distance_matrix"], float)
        if list(fixed["cluster_ids"]) == list(res.labels):
            iu = np.triu_indices(len(res.labels), k=1)
            es, fx = res.matrix[iu], fm[iu]
            ok = np.isfinite(es) & np.isfinite(fx)
            ratio = es[ok] / np.maximum(fx[ok], 1e-12)
            # lengths = sqrt(energy): dominance in energy <=> in length
            cmp = {"n_common": int(ok.sum()),
                   "median_len_ratio_vs_fixed": float(np.median(ratio)),
                   "max_len_ratio_vs_fixed": float(ratio.max()),
                   "frac_strictly_better": float((ratio < 1.0).mean()),
                   "frac_not_worse_1pct": float((ratio <= 1.01).mean())}
            print(f"[full133 {tag}] vs fixed: med ratio "
                  f"{cmp['median_len_ratio_vs_fixed']:.4f}, worst "
                  f"{cmp['max_len_ratio_vs_fixed']:.4f}, strictly better "
                  f"{cmp['frac_strictly_better']:.1%}", flush=True)
    _write(f"full133_{tag}_timing.json", {
        "note": note,
        "workload": "133 classes, 8778 pairs, 10 decoders, "
                    f"{mode}@{prec} trajectory, single v5e chip",
        "wall_clock_seconds": round(wall, 1),
        "stage_timings": {k: round(v, 2) for k, v in res.timings.items()},
        "pairs_valid": int(res.artifact.valid.sum()),
        "fixed_run_comparison": cmp,
        "data": "synthetic surrogate (tasic-pca50.npy missing upstream) + "
                "reference model_seed12.pt",
    })
    print(f"[full133 {tag}] {wall:.0f}s "
          f"(opt {res.timings['optimize']:.0f}s)", flush=True)


def stage_full133_fast():
    """Full 133x133 with the measured two-phase fast recipe (the wall-clock
    lever that works where early stopping measured negative): cosine(3e-3)
    x 1000 trajectory steps at T=512 quadrature + 300 constant-lr polish
    steps at the full T=2000, per-chunk.  Probe evidence
    (fast_recipe_probe2.json, two production chunks): final exact-f32
    T=2000 energies strictly LOWER than the reference recipe's on
    99.5-100%% of pairs (median ~10%% lower, worst pair +2.5%%) at 1.79x
    the chunk throughput.  This stage runs the whole workload and asserts
    the same dominance against the committed fixed-run matrix."""
    _run_full133_two_phase(
        "fast", steps=1000, traj_num_t=512, polish_steps=300,
        note="two-phase fast recipe: cosine(3e-3) x 1000 @ T_traj=512 + "
             "300 polish @ T=2000 const 1e-3; final energies exact-f32 "
             "T=2000 (the standard contract); timing excludes one-time "
             "tunnel warmup")


def stage_full133_turbo():
    """The shipped --turbo preset (cos1200@256 + 200@2000, run through the
    phase_plan mechanism — bitwise-identical to the two-phase path, proven
    in tests/test_optimize.py::test_phase_plan_generalizes_two_phase).
    Committed full-scale numbers: 130 s, 99.2%% of pairs strictly better
    than the reference recipe (full133_turbo_timing.json).  More aggressive
    three-phase ladders were measured at full scale and rejected for the
    preset (dominance drops to ~97%%): turbo_ladder_fullscale.json."""
    from vae_latent_geometry_tpu.cli import TURBO_PHASES

    _run_full133_two_phase(
        "turbo", steps=1200, traj_num_t=None, polish_steps=0,
        phase_plan=TURBO_PHASES,
        note="two-phase turbo recipe: cosine(3e-3) x 1200 @ T_traj=256 + "
             "200 polish @ T=2000 const 1e-3; final energies exact-f32 "
             "T=2000 (the standard contract); timing excludes one-time "
             "tunnel warmup")


def stage_full133_mc_turbo():
    """The turbo phase ladder applied to the SEMANTICS-FAITHFUL estimator
    (mc_fused, the reference's own MC decoder-pair energy,
    src/optimize.py:38-75): the recipe mechanism is estimator-agnostic, so
    the 546 s fixed MC matrix (full133_mc_timing.json) should drop by a
    similar factor to the expected-mode turbo.  CLI equivalent:
    ``optimize --turbo --energy-mode mc_fused``.  Dominance is compared
    against the committed fixed MC matrix; both sides' final energies are
    single M=2 MC draws at exact f32 T=2000 (the per-pair ratio carries MC
    noise of a ~4,000-draw average, so expect a slightly wider band than
    the expected-mode comparisons)."""
    from vae_latent_geometry_tpu.cli import TURBO_PHASES

    _run_full133_two_phase(
        "mc_turbo", steps=1200, traj_num_t=None, polish_steps=0,
        phase_plan=TURBO_PHASES, mode="mc_fused", prec="f32x3",
        fixed_tag="mc",
        note="turbo ladder on the MC estimator: cosine(3e-3) x 1200 @ "
             "T=256 + 200 @ T=2000 const 1e-3, mc_fused@f32x3; final "
             "energies exact-f32 T=2000 MC draws; timing excludes one-time "
             "tunnel warmup and first-compile of the T=256 MC program")


def stage_full133_mc_turbo_f32x2():
    """MC turbo with the f32x2 trajectory rung (the same precision trade
    the expected-mode turbo uses: reduced precision steers the trajectory
    only, final energies exact-f32).  Measures whether the MC path keeps
    its dominance at the cheaper rung; the committed mc_turbo stays at
    f32x3 unless this measures clean."""
    from vae_latent_geometry_tpu.cli import TURBO_PHASES

    _run_full133_two_phase(
        "mc_turbo_f32x2", steps=1200, traj_num_t=None, polish_steps=0,
        phase_plan=TURBO_PHASES, mode="mc_fused", prec="f32x2",
        fixed_tag="mc",
        note="turbo ladder on the MC estimator at the f32x2 trajectory "
             "rung: cosine(3e-3) x 1200 @ T=256 + 200 @ T=2000 const 1e-3, "
             "mc_fused@f32x2; final energies exact-f32 T=2000 MC draws; "
             "timing excludes one-time tunnel warmup and first compiles")


def stage_ckpt_overhead():
    """Measure the per-chunk async-checkpoint overhead at FULL 133x133
    scale (round-2 verdict item 6's acceptance bar: <2% of optimize wall
    clock).  Same prebuilt init artifact, same turbo recipe, one optimize
    run WITHOUT checkpointing and one WITH the async per-chunk writer
    persisting the full 8,778-pair artifact after every chunk."""
    import tempfile

    from vae_latent_geometry_tpu.cli import TURBO_PHASES
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )
    from vae_latent_geometry_tpu.pipeline.select_pairs import (
        make_pairs,
        select_representatives,
    )
    from vae_latent_geometry_tpu.models import evae as evae_lib
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact

    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    latents = np.asarray(jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(params, jnp.asarray(data.x)))
    reps = select_representatives(latents, data.labels, max_labels=133)
    pairs = make_pairs(reps)
    init = initialize_splines(latents, pairs, decoders=params.decoders,
                              cfg=InitConfig(use_entropy=False))
    label_of = {r["index"]: r["label"] for r in reps}
    art = SplineBatchArtifact(
        a=init.a, b=init.b, omega_init=init.omega, basis=init.basis,
        n_poly=init.n_poly, pair_indices=init.pair_indices, valid=init.valid,
        pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                     for i, j in init.pair_indices],
        representatives=reps,
        metadata={"init_type": init.init_type, "pair_count": 133})
    cfg = GeodesicConfig(steps=1200, lr=3e-3, lr_schedule="cosine",
                         batch_size=200, phase_plan=TURBO_PHASES,
                         energy=EnergyConfig(num_t=2000,
                                             mode="expected_fused",
                                             kernel_precision=BULK_PREC))

    def run(ckpt):
        t0 = time.perf_counter()
        optimize_spline_batch(params, art, cfg=cfg, checkpoint_path=ckpt,
                              log_every_chunk=False)
        return time.perf_counter() - t0

    run(None)  # warmup: compiles paid outside both timed runs
    wall_plain = run(None)
    with tempfile.TemporaryDirectory() as td:
        wall_ckpt = run(os.path.join(td, "opt_ckpt.npz"))
    overhead = (wall_ckpt - wall_plain) / wall_plain
    _write("ckpt_overhead.json", {
        "workload": "full 8778-pair turbo optimize, per-chunk async "
                    "checkpointing of the FULL artifact vs none, single "
                    "v5e, warm compile cache",
        "wall_clock_no_checkpoint_s": round(wall_plain, 1),
        "wall_clock_with_checkpoint_s": round(wall_ckpt, 1),
        "overhead_fraction": round(overhead, 4),
        "note": "async latest-wins writer (pipeline/optimize_stage."
                "_AsyncCheckpointer): serialization off the critical path; "
                "run-to-run wall-clock noise on this rig is a few percent, "
                "so small negative/positive values mean 'below noise'",
    })
    print(f"[ckpt-overhead] plain {wall_plain:.1f}s  ckpt {wall_ckpt:.1f}s  "
          f"overhead {overhead:+.2%}", flush=True)


def stage_dp_slice():
    """Measured evidence for the v4-8 north-star (<1 min full matrix).

    dp over pairs is embarrassingly parallel: each chip optimizes a
    disjoint pair subset with ZERO cross-chip communication during
    optimization (the sharded path's single-device equality is proven on
    the 8-device CPU mesh, tests/test_sharding.py; the only collective is
    the final result gather of ~100 KB).  The per-chip cost of an 8-chip
    run is therefore the cost of a 1/8 pair slice — which THIS rig can
    measure on its one real chip, turning the round-2 verdict's
    "extrapolated /8" into a measurement of everything except the final
    gather.

    The slice is shard 0 of the strided 8-way split (1,098 of 8,778
    pairs -> 6 padded chunks of 200).  NOTE the projection's configuration
    assumption (recorded in the JSON): a dp=8 pod run must scale the GLOBAL
    batch_size to 200*dp=1600 so each device still sees 200-pair chunks —
    with the default batch_size=200, optimize_spline_batch chunks the full
    pair set by 200 and shards each chunk over dp, handing every device 44
    chunks of 25 pairs (more dispatch boundaries, smaller per-device
    batches), which this slice does NOT model.  Host-side stages (encode,
    select, Dijkstra init) are measured separately over the FULL workload:
    on a pod they run once on the host and are amortized across chips."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.cli import TURBO_PHASES
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.models import evae as evae_lib
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )
    from vae_latent_geometry_tpu.pipeline.select_pairs import (
        make_pairs,
        select_representatives,
    )

    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()

    host = {}
    t0 = time.perf_counter()
    latents = np.asarray(jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(params, jnp.asarray(data.x)))
    host["encode"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = select_representatives(latents, data.labels, max_labels=133)
    pairs = make_pairs(reps)
    host["select_pairs"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    init = initialize_splines(latents, pairs, decoders=params.decoders,
                              cfg=InitConfig(use_entropy=False))
    host["init_splines_full"] = time.perf_counter() - t0

    label_of = {r["index"]: r["label"] for r in reps}
    sl = np.arange(len(init.a))[0::8]  # shard 0 of the strided dp=8 split
    art = SplineBatchArtifact(
        a=init.a[sl], b=init.b[sl], omega_init=init.omega[sl],
        basis=init.basis, n_poly=init.n_poly,
        pair_indices=init.pair_indices[sl], valid=init.valid[sl],
        pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                     for i, j in init.pair_indices[sl]],
        representatives=reps,
        metadata={"init_type": init.init_type, "pair_count": 133})

    def run(cfg):
        # no data= here: passing it would re-encode the full dataset inside
        # every timed run while host["encode"] is ALSO added in projected()
        # (double count); the projection carries the encode cost once on the
        # host side, where a pod run computes the euclidean distances too
        t0 = time.perf_counter()
        optimize_spline_batch(params, art, cfg=cfg, log_every_chunk=False)
        return round(time.perf_counter() - t0, 1)

    turbo_cfg = GeodesicConfig(
        steps=1200, lr=3e-3, lr_schedule="cosine", batch_size=200,
        phase_plan=TURBO_PHASES,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision=BULK_PREC))
    # --turbo --coarse-bf16 (the measured next rung, full133_bf16coarse)
    first_phase, *rest_phases = TURBO_PHASES
    bf16_cfg = GeodesicConfig(
        steps=1200, lr=3e-3, lr_schedule="cosine", batch_size=200,
        phase_plan=((*first_phase[:4], "expected_fused_bf16"), *rest_phases),
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision=BULK_PREC))
    fixed_cfg = GeodesicConfig(
        steps=1000, batch_size=200,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision=BULK_PREC))
    mc_turbo_cfg = GeodesicConfig(
        steps=1200, lr=3e-3, lr_schedule="cosine", batch_size=200,
        phase_plan=TURBO_PHASES,
        energy=EnergyConfig(num_t=2000, mode="mc_fused",
                            kernel_precision="f32x2"))
    mc_fixed_cfg = GeodesicConfig(
        steps=1000, batch_size=200,
        energy=EnergyConfig(num_t=2000, mode="mc_fused",
                            kernel_precision="f32x3"))

    slices = {}
    # first invocation loads cached executables (or compiles); the second
    # is the steady-state number a pod run would see per chunk stream.
    # Every config runs twice: projecting one config from its first
    # invocation while the others use steady state would silently mix
    # compile time into the cross-config comparison.
    for tag, cfg in (
            ("turbo_expected_f32x2", turbo_cfg),
            ("turbo_coarse_bf16", bf16_cfg),
            ("reference_fixed_1000step", fixed_cfg),
            ("mc_turbo_f32x2", mc_turbo_cfg),
            ("mc_reference_fixed_f32x3", mc_fixed_cfg)):
        first = run(cfg)
        steady = run(cfg)
        slices[tag] = {"first_invocation_s": first,
                       "steady_state_s": steady}
        print(f"[dp-slice {tag}] first {first}s  steady {steady}s",
              flush=True)

    def projected(tag):
        s = slices[tag]
        opt = s["steady_state_s"] or s["first_invocation_s"]
        return round(host["encode"] + host["select_pairs"]
                     + host["init_splines_full"] + opt + 0.5, 1)

    _write("dp_slice_timing.json", {
        "workload": "shard 0 of the strided dp=8 split of the full 133x133 "
                    "workload: 1098 of 8778 pairs, 10 decoders, single v5e "
                    "chip; 6 padded chunks of 200",
        "assumed_pod_batch_size": 1600,
        "configuration_assumption": "the projection assumes the pod run "
                    "scales the global batch_size to 200*dp=1600 so each "
                    "device sees 200-pair chunks like this slice; at the "
                    "default batch_size=200 a dp=8 run would instead hand "
                    "each device 44 chunks of 25 pairs (8x more dispatch "
                    "boundaries) and land slower than projected",
        "encode_cost_side": "host_side_once_per_pod_s.encode (the timed "
                    "optimize runs do NOT pass data=, so encode is counted "
                    "exactly once)",
        "why_this_measures_the_pod": "dp over pairs exchanges nothing "
                    "between chips during optimization (per-pair programs "
                    "are independent; sharded-path equality tested on the "
                    "8-device CPU mesh, tests/test_sharding.py); the only "
                    "collective is the final ~100 KB result gather, "
                    "budgeted at 0.5 s in the projections",
        "host_side_once_per_pod_s": {k: round(v, 2) for k, v in host.items()},
        "slice_optimize_s": slices,
        "projected_v4_8_full_matrix_s": {
            "reference_fixed_1000step":
                projected("reference_fixed_1000step"),
            "turbo_expected_f32x2": projected("turbo_expected_f32x2"),
            "turbo_coarse_bf16": projected("turbo_coarse_bf16"),
            "mc_reference_fixed_f32x3":
                projected("mc_reference_fixed_f32x3"),
            "mc_turbo_f32x2": projected("mc_turbo_f32x2"),
        },
        "data": "synthetic surrogate (tasic-pca50.npy missing upstream) + "
                "reference model_seed12.pt",
    })


def stage_full133_backstop():
    """Full-scale run of the guaranteed contract (`optimize
    --backstop-fixed`, pipeline ``optimize_spline_batch_backstop``): turbo
    primary + reference fixed backstop, per-pair best-of merge.  Asserts
    the construction at scale: the merged matrix is elementwise <= the
    committed fixed matrix (up to the fixed arm's run-to-run determinism),
    and records how many pairs each arm won plus the total cost relative
    to running the fixed recipe alone."""
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.cli import TURBO_PHASES
    from vae_latent_geometry_tpu.config import (
        EnergyConfig,
        GeodesicConfig,
        InitConfig,
    )
    from vae_latent_geometry_tpu.data.tasic import load_tasic
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.models import evae as evae_lib
    from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
    from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch_backstop,
    )
    from vae_latent_geometry_tpu.pipeline.select_pairs import (
        make_pairs,
        select_representatives,
    )

    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    latents = np.asarray(jax.jit(
        lambda p, x: evae_lib.encode(p, x)[0])(params, jnp.asarray(data.x)))
    reps = select_representatives(latents, data.labels, max_labels=133)
    init = initialize_splines(latents, make_pairs(reps),
                              decoders=params.decoders,
                              cfg=InitConfig(use_entropy=False))
    label_of = {r["index"]: r["label"] for r in reps}
    art = SplineBatchArtifact(
        a=init.a, b=init.b, omega_init=init.omega, basis=init.basis,
        n_poly=init.n_poly, pair_indices=init.pair_indices, valid=init.valid,
        pair_labels=[[label_of.get(int(i), "?"), label_of.get(int(j), "?")]
                     for i, j in init.pair_indices],
        representatives=reps,
        metadata={"init_type": init.init_type, "pair_count": 133})

    primary = GeodesicConfig(
        steps=1200, batch_size=200, phase_plan=TURBO_PHASES,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision="f32x2"))
    backstop = GeodesicConfig(
        steps=1000, batch_size=200,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision=BULK_PREC))
    t0 = time.perf_counter()
    merged = optimize_spline_batch_backstop(params, art, cfg=primary,
                                            backstop_cfg=backstop,
                                            log_every_chunk=False)
    wall = time.perf_counter() - t0

    fixed_path = os.path.join(OUT, "plots",
                              "geodesic_matrix_seed12_euclidean_133.json")
    cmp = None
    if os.path.exists(fixed_path):
        fixed = json.load(open(fixed_path))
        lbl_idx = {l: i for i, l in enumerate(fixed["cluster_ids"])}
        fm = np.asarray(fixed["distance_matrix"], float)
        lf = np.array([fm[lbl_idx[p[0]], lbl_idx[p[1]]]
                       for p in merged.pair_labels])
        lm = np.asarray(merged.geodesic_length, float)
        ok = np.isfinite(lm) & np.isfinite(lf)
        ratio = lm[ok] / np.maximum(lf[ok], 1e-12)
        cmp = {"n_common": int(ok.sum()),
               "median_len_ratio_vs_fixed": float(np.median(ratio)),
               "max_len_ratio_vs_fixed": float(ratio.max()),
               "frac_not_worse_1pct": float((ratio <= 1.01).mean()),
               "frac_not_worse": float((ratio <= 1.0 + 1e-9).mean()),
               "note_on_max": "vs the COMMITTED fixed matrix from an "
                              "earlier invocation; vs its own fixed arm "
                              "the merge is <= 1.0 exactly by construction"}
        print(f"[backstop] vs committed fixed: worst {cmp['max_len_ratio_vs_fixed']:.5f}, "
              f"not-worse {cmp['frac_not_worse']:.2%}", flush=True)
    _write("full133_backstop_timing.json", {
        "note": "guaranteed contract at full scale: turbo primary + "
                "reference fixed backstop, per-pair best-of by exact-f32 "
                "final energies (optimize_spline_batch_backstop)",
        "workload": "133 classes, 8778 pairs, 10 decoders, single v5e",
        "wall_clock_seconds": round(wall, 1),
        "backstop_selected_pairs": int(merged.metadata["backstop_selected"]),
        "primary_won_pairs": int(np.isfinite(
            np.asarray(merged.geodesic_length)).sum()
            - merged.metadata["backstop_selected"]),
        "fixed_run_comparison": cmp,
        "data": "synthetic surrogate + reference model_seed12.pt",
    })
    print(f"[backstop] {wall:.0f}s, backstop won "
          f"{merged.metadata['backstop_selected']} pairs", flush=True)


STAGES = {
    "golden_a": stage_golden_a,
    "golden_b": stage_golden_b,
    "full133": stage_full133,
    "full133_entropy": stage_full133_entropy,
    "full133_mc": stage_full133_mc,
    "full133_earlystop": stage_full133_earlystop,
    "full133_fast": stage_full133_fast,
    "full133_turbo": stage_full133_turbo,
    "full133_mc_turbo": stage_full133_mc_turbo,
    "full133_mc_turbo_f32x2": stage_full133_mc_turbo_f32x2,
    "golden_ensemble": stage_golden_ensemble,
    "dscale": stage_dscale,
    "cov": stage_cov,
    "train": stage_train,
    "train_multiseed": stage_train_multiseed,
    "ckpt_overhead": stage_ckpt_overhead,
    "dp_slice": stage_dp_slice,
    "full133_backstop": stage_full133_backstop,
}


def main():
    names = sys.argv[1:] or list(STAGES)
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        # validate BEFORE running anything: a typo in a later name must not
        # surface only after hours of earlier TPU stages
        raise SystemExit(
            f"unknown stage(s) {unknown}; available: {sorted(STAGES)}")
    _setup()
    for n in names:
        print(f"[regenerate] === stage {n} ===", flush=True)
        STAGES[n]()


if __name__ == "__main__":
    main()
