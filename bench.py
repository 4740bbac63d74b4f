"""Headline benchmark: ensemble geodesic energy-optimization throughput.

Workload = the reference's core hot loop (upstream ``src/optimize.py``
config: batch 200 splines, T=2000 quadrature points, M=2 MC decoder pairs,
10 decoders, Adam lr 1e-3) measured as optimization steps/second.

- Ours: the full scan-jitted optimizer on the default JAX device (TPU).
- Baseline: a minimal PyTorch implementation of the identical computation
  (design-matrix spline eval -> 10-decoder decode -> MC pair gather ->
  backward -> Adam), measured on CPU (the only torch device in this image;
  the upstream repo ships no published speed numbers — BASELINE.md).
  The baseline number is cached in .bench_baseline.json after first run.

Prints ONE compact JSON line as the FINAL stdout line (the driver captures
only the last ~2 KB of stdout, so the headline must stay small — the full
record with caveat prose, baselines, and wall-clock semantics goes to stderr
and to the ``bench_details.json`` sidecar):
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N,
   "ladder_steps_per_sec": {...}, "mfu": {...}, "numerics_gate_ok": bool,
   "wall_clocks_s": {...}, "details": "bench_details.json"}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

B = 200          # splines per batch (reference batch_size)
T = 2000         # quadrature samples
M_DEC = 10       # ensemble size
MC = 2           # MC samples
STEPS_MEASURE = 60
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
EVAE_CKPT = "/root/reference/experiment/model_seed12.pt"


def _problem():
    rng = np.random.default_rng(12)
    omega = (rng.normal(size=(B, 5, 2)) * 0.01).astype(np.float32)
    a = (rng.normal(size=(B, 2)) * 1.5).astype(np.float32)
    b = (rng.normal(size=(B, 2)) * 1.5).astype(np.float32)
    return omega, a, b


def _sync(x) -> None:
    """Force device completion via the shared barrier in utils.profiling
    (on the tunneled 'axon' platform ``block_until_ready`` is a no-op; the
    barrier materializes a value on host)."""
    from vae_latent_geometry_tpu.utils.profiling import sync

    sync(x)


def bench_jax(mode: str = "mc", kernel_precision: str = "f32x3",
              inkernel_rng: bool = True, num_t: int = T,
              target_num_t=None, steps: int = STEPS_MEASURE) -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig, ModelConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.models.evae import evae_init
    from vae_latent_geometry_tpu.optim.geodesic import _optimize_scan

    if os.path.exists(EVAE_CKPT):
        from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint

        params = load_evae_checkpoint(EVAE_CKPT)
    else:
        params = evae_init(jax.random.PRNGKey(0), ModelConfig())
    decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)

    omega, a, b = _problem()
    basis, _ = nullspace_basis(4)
    cfg = GeodesicConfig(
        steps=steps, lr=1e-3,
        energy=EnergyConfig(num_t=num_t, mode=mode, mc_samples=MC,
                            kernel_precision=kernel_precision,
                            mc_inkernel_rng=inkernel_rng,
                            target_num_t=target_num_t),
    )
    args = (decoders, jnp.asarray(omega), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(basis), jax.random.PRNGKey(0), cfg)
    out = _optimize_scan(*args)  # compile + warmup
    _sync(out[1])
    t0 = time.perf_counter()
    out = _optimize_scan(*args)
    _sync(out[1])
    dt = time.perf_counter() - t0
    return steps / dt


def numerics_check(decoders) -> dict:
    """On-hardware numerics gate: median rel error of the energy paths vs a
    float64 host recomputation on SMOOTH curves.

    Smoothness is the adversarial case: adjacent decoded samples differ by
    ~|x|/T, far below bf16's input rounding, so any path that lets the MXU
    round f32 inputs to bf16 (JAX's DEFAULT matmul precision on TPU) turns
    the discrete energy into rounding noise.  Random-curve tests cannot see
    this; this check runs on the real device right before timing it.
    """
    import jax
    import jax.numpy as jnp

    from vae_latent_geometry_tpu.geometry import energy as E
    from vae_latent_geometry_tpu.ops.energy_pallas import (
        energy_expected_fused,
    )

    rng = np.random.default_rng(7)
    Tn, Bn = 2000, 16
    t = np.linspace(0, 1, Tn)[:, None, None]
    a = rng.normal(size=(1, Bn, 2))
    b = rng.normal(size=(1, Bn, 2))
    g64 = (1 - t) * a + t * b + 0.3 * np.sin(np.pi * t * 3) * rng.normal(
        size=(1, Bn, 2))
    g = jnp.asarray(g64, jnp.float32)

    ws = [np.asarray(l["w"]).astype(np.float64)
          for l in decoders["layers"]]
    bs = [np.asarray(l["b"]).astype(np.float64)
          for l in decoders["layers"]]
    M = ws[0].shape[0]
    xs = []
    for m in range(M):
        h = g64.reshape(-1, 2)
        for i in range(len(ws)):
            h = h @ ws[i][m] + bs[i][m]
            if i < len(ws) - 1:
                h = np.maximum(h, 0)
        xs.append(h.reshape(Tn, Bn, -1))
    xs = np.stack(xs)
    xbar = xs.mean(0)
    sq = (xs ** 2).sum(-1).mean(0)
    truth = (sq[1:] + sq[:-1] - 2 * (xbar[1:] * xbar[:-1]).sum(-1)).sum(0)

    def medrel(e):
        e = np.asarray(e)
        return float(np.median(np.abs(e - truth) / np.abs(truth)))

    out = {"xla_expected": medrel(E.energy_expected(decoders, g))}
    try:
        out["fused_expected"] = medrel(
            energy_expected_fused(decoders, g, None, "float32"))
    except Exception as ex:  # pragma: no cover
        out["fused_expected"] = f"failed: {type(ex).__name__}"
    try:
        from vae_latent_geometry_tpu.ops._research.energy_pallas_t import (
            energy_expected_fused_t,
        )

        out["fused_expected_t"] = medrel(
            energy_expected_fused_t(decoders, g, "float32"))
    except Exception as ex:  # pragma: no cover
        out["fused_expected_t"] = f"failed: {type(ex).__name__}"
    return out


# Peak dense bf16 MXU throughput per chip family (public spec sheets).
# Every rung of the precision ladder decomposes into bf16 MXU passes with
# f32 accumulation, so bf16 peak is the common denominator.
_PEAK_BF16_TFLOPS = (
    ("v6", 918.0),       # v6e (Trillium)
    ("v5p", 459.0),
    ("v5", 197.0),       # v5e / "TPU v5 lite"
    ("v4", 275.0),
)


def _chip_peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for tag, peak in _PEAK_BF16_TFLOPS:
        if tag in kind:
            return peak, kind
    return None, kind


def mfu_report(ladder: dict) -> dict:
    """Analytic FLOPs/step and MFU for every measured rung.

    Two accountings (both reported; the gap between them localizes waste):
    - model: logical 2*m*n*k FLOPs of the true shapes (X=50) — the number a
      perfect compiler on a padding-free chip would need.
    - mxu:   bf16 MXU passes actually issued: lane-padded shapes (X=50 pads
      to 128 output lanes) times the pass count of the precision rung
      (f32x3 = 3 passes/dot, f32x2 = 2, float32 = 6, backward cotangent
      chain runs single-pass bf16 under the reduced rungs).
    mfu_model = model_flops * steps_per_sec / peak;  mfu_mxu likewise with
    pass-FLOPs — mfu_mxu is the fraction of the MXU's cycles this program
    keeps busy; mfu_model is how much of that busyness is useful math.

    Trajectory steps run GRAD-ONLY by default (EnergyConfig.gradonly_traj:
    the forward kernel is skipped; the backward recomputes activations from
    the inputs), so one step = activation recompute (n_pass) + cotangent
    chain — there is no separate forward decode.  Both accountings reflect
    that: a perfect compiler computing just the gradient also needs
    recompute + chain = 2x one forward's FLOPs.
    """
    pts = T * B
    # one decoder forward, logical: 2->128 (VPU), 128->128, 128->50
    l1, l2, l3 = 2 * 2 * 128, 2 * 128 * 128, 2 * 128 * 50
    fwd_model = M_DEC * pts * (l1 + l2 + l3)
    # grad-only step = activation recompute (fwd FLOPs) + transpose chain
    model_per_step = 2 * fwd_model

    l3_pad = 2 * 128 * 128                   # X=50 -> 128 output lanes
    mxu_dots = M_DEC * pts * (l2 + l3_pad)   # per single-pass decode
    passes = {"f32x3": 3, "f32x2": 2, "float32": 6, "bfloat16": 1}

    peak, kind = _chip_peak_tflops()
    out = {"model_gflops_per_step": round(model_per_step / 1e9, 1),
           "chip": kind, "peak_bf16_tflops": peak,
           "step_model": "gradonly_traj: bwd recompute + chain, no fwd",
           "rungs": {}}
    if peak is None:
        return out
    for name, sps in ladder.items():
        if "jvp" in name:
            continue  # different T per step — the T=2000 FLOPs model is wrong
        prec = "f32x3"
        for p in ("f32x2", "float32", "bfloat16"):
            if name.endswith(p):
                prec = p
        n_pass = passes[prec]
        chain_pass = 1 if prec in ("f32x3", "f32x2") else n_pass
        # bwd recompute at n_pass + cotangent chain; no forward decode
        mxu_per_step = mxu_dots * (n_pass + chain_pass)
        out["rungs"][name] = {
            "mfu_model": round(model_per_step * sps / (peak * 1e12), 4),
            "mfu_mxu": round(mxu_per_step * sps / (peak * 1e12), 4),
        }
    return out


def _workload_wall_clocks() -> dict:
    """End-to-end wall clocks of the committed production-workload runs
    (measured on this rig by experiment/regenerate.py stages, NOT
    re-measured here; docs/PERFORMANCE.md has the full table)."""
    out = {}
    for key, fname in (
            ("full133_reference_recipe_s", "full133_euclidean_timing.json"),
            ("full133_fast_recipe_s", "full133_fast_timing.json"),
            ("full133_turbo_recipe_s", "full133_turbo_timing.json"),
            ("full133_mc_semantics_s", "full133_mc_timing.json"),
            ("full133_mc_turbo_s", "full133_mc_turbo_timing.json"),
            ("full133_mc_turbo_f32x2_s", "full133_mc_turbo_f32x2_timing.json"),
            ("cov_6300_runs_s", "cov_timing.json"),
            ("train_600_epochs_s", "train_timing.json"),
            ("train_6seeds_600_epochs_s", "multiseed_train_timing.json"),
            ("full133_backstop_guaranteed_s", "full133_backstop_timing.json"),
            ("full133_rescaled64_s", "full133_rescaled64_timing.json")):
        path = os.path.join(REPO, "experiment", fname)
        if os.path.exists(path):
            try:
                out[key] = json.load(open(path)).get("wall_clock_seconds")
            except Exception:
                pass
    cct = os.path.join(REPO, "experiment", "compile_cache_timing.json")
    if os.path.exists(cct):
        try:
            d = json.load(open(cct))
            out["cli_invocation_warm_vs_uncached_s"] = {
                "warm": d.get("warm_s"), "uncached": d.get("off_s")}
        except Exception:
            pass
    for key, fname in (
            ("full133_fast_vs_fixed", "full133_fast_timing.json"),
            ("full133_backstop_vs_fixed", "full133_backstop_timing.json")):
        path = os.path.join(REPO, "experiment", fname)
        if os.path.exists(path):
            try:
                out[key] = json.load(open(path)).get("fixed_run_comparison")
            except Exception:
                pass
    if out:
        # the keys do NOT all time the same span — comparing them raw is
        # apples-to-oranges (each source JSON carries a process_state_note
        # with the exact conditions)
        out["wall_clock_semantics"] = {
            "full133_backstop_guaranteed_s": "optimize stage only "
                "(no encode/init), single invocation",
            "full133_rescaled64_s": "full pipeline, FRESH process — the "
                "cold-start cost (tunnel + compile-cache load) landed in "
                "its encode stage; use stage_timings.optimize=176.8s for "
                "recipe comparisons",
            "default": "full pipeline (encode+init+optimize+matrix) in a "
                "warm process unless the source JSON's process_state_note "
                "says otherwise",
        }
    return out


def bench_torch_baseline(steps: int = 10):
    """Reference-equivalent PyTorch workload on CPU (own implementation).

    Returns (steps_per_sec, rel_spread) measured over ``steps`` steps with a
    per-step min/max spread estimate."""
    import torch

    torch.manual_seed(12)
    omega_np, a_np, b_np = _problem()

    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.geometry.spline import design_matrix

    basis, _ = nullspace_basis(4)
    t = np.linspace(0.0, 1.0, T, dtype=np.float32)
    phi = torch.from_numpy(np.asarray(design_matrix(t, basis, 4)))
    phi_end = torch.from_numpy(np.asarray(design_matrix(
        np.array([1.0], np.float32), basis, 4)))

    if os.path.exists(EVAE_CKPT):
        sd = torch.load(EVAE_CKPT, map_location="cpu")
        dec_w = [[(sd[f"decoder.{i}.decoder_net.{j}.weight"],
                   sd[f"decoder.{i}.decoder_net.{j}.bias"]) for j in (0, 2, 4)]
                 for i in range(M_DEC)]
    else:
        g = torch.Generator().manual_seed(0)
        def lin(i, o):
            return (torch.randn(o, i, generator=g) * 0.2,
                    torch.randn(o, generator=g) * 0.1)
        dec_w = [[lin(2, 128), lin(128, 128), lin(128, 50)]
                 for _ in range(M_DEC)]

    omega = torch.from_numpy(omega_np).clone().requires_grad_(True)
    a = torch.from_numpy(a_np)
    b = torch.from_numpy(b_np)
    opt = torch.optim.Adam([omega], lr=1e-3)

    def decode(w, z):
        h = torch.relu(torch.nn.functional.linear(z, *w[0]))
        h = torch.relu(torch.nn.functional.linear(h, *w[1]))
        return torch.nn.functional.linear(h, *w[2])

    tt = torch.from_numpy(t)[:, None, None]

    def one_step():
        opt.zero_grad()
        gamma = (1 - tt) * a[None] + tt * b[None] + torch.einsum(
            "tk,bkd->tbd", phi, omega)
        decoded = torch.stack([decode(w, gamma) for w in dec_w])  # (M,T,B,X)
        total = torch.zeros(B)
        for _ in range(MC):
            d1 = torch.randint(0, M_DEC, (T - 1, B))
            d2 = torch.randint(0, M_DEC, (T - 1, B))
            it = torch.arange(T - 1)[:, None]
            ib = torch.arange(B)[None, :]
            x1 = decoded[d1, it, ib]
            x2 = decoded[d2, it + 1, ib]
            total = total + ((x2 - x1) ** 2).sum(dim=2).sum(dim=0)
        energy = total / MC
        g_end = b + torch.einsum("tk,bkd->bd", phi_end, omega)
        loss = (energy + 1000.0 * ((g_end - b) ** 2).sum(dim=1)).sum()
        loss.backward()
        opt.step()

    one_step()  # warmup/allocation
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return float(1.0 / times.mean()), float(
        (times.max() - times.min()) / times.mean())


JAXCPU_CACHE = os.path.join(REPO, ".bench_baseline_jaxcpu.json")


def bench_jax_cpu_subprocess(steps: int = 8):
    """Second denominator: the SAME JAX program (plain-XLA MC mode, float32)
    on this host's CPU — same algorithm, same compiler family, different
    hardware.  Immune to the "torch-CPU reimplementation is a strawman"
    critique because the numerator and denominator share every line of
    model code.  Runs in a subprocess (JAX_PLATFORMS can't change after
    backend init); cached like the torch baseline."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu", VLG_BENCH_JAXCPU=str(steps))
    env.pop("XLA_FLAGS", None)  # no virtual-device splitting: use all cores
    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"jax-cpu child failed: {out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _jaxcpu_child_main():
    # the sitecustomize hook pins JAX_PLATFORMS=axon and the env var cannot
    # override it; the config API (before first jax use) can
    import jax

    jax.config.update("jax_platforms", "cpu")
    steps = int(os.environ["VLG_BENCH_JAXCPU"])
    sps = bench_jax("mc", "float32", steps=steps)
    print(json.dumps({"steps_per_sec": round(sps, 4), "steps_measured": steps,
                      "workload": f"B={B},T={T},Mdec={M_DEC},MC={MC}",
                      "device": "jax-cpu (same program, plain-XLA mc)"}))


def main():
    fresh_baseline = "--fresh-baseline" in sys.argv
    if os.path.exists(BASELINE_CACHE) and not fresh_baseline:
        cache = json.loads(open(BASELINE_CACHE).read())
        baseline = cache["steps_per_sec"]
        spread = cache.get("rel_spread")
    else:
        baseline, spread = bench_torch_baseline()
        with open(BASELINE_CACHE, "w") as f:
            json.dump({"steps_per_sec": baseline, "rel_spread": spread,
                       "steps_measured": 10,
                       "workload": f"B={B},T={T},Mdec={M_DEC},MC={MC}",
                       "device": "torch-cpu"}, f)
    if os.path.exists(JAXCPU_CACHE) and not fresh_baseline:
        jaxcpu = json.loads(open(JAXCPU_CACHE).read())
    else:
        try:
            jaxcpu = bench_jax_cpu_subprocess()
            with open(JAXCPU_CACHE, "w") as f:
                json.dump(jaxcpu, f)
        except Exception as ex:
            print(f"[bench] jax-cpu denominator failed "
                  f"({type(ex).__name__}: {ex})", file=sys.stderr)
            jaxcpu = None

    # headline: the fused Pallas MC path (identical estimator semantics to
    # the reference); fall back to the XLA MC path if the kernel cannot
    # compile on this backend.  The ladder records every rung so the
    # headline has an honest context: the torch-CPU denominator is a
    # last-resort stand-in (the reference publishes no speed numbers and
    # this image has no CUDA — BASELINE.md).
    ladder = {}
    # (name, mode, precision, in-kernel PRNG).  mc_fused draws decoder
    # indices with the TPU hardware PRNG inside the kernels; the _extidx
    # rung keeps the host-generated index planes for an A/B of that change.
    for name, mode, prec, rng_flag in (
            ("mc_fused", "mc_fused", "f32x3", True),
            ("mc_fused_f32x2", "mc_fused", "f32x2", True),
            ("mc_fused_extidx", "mc_fused", "f32x3", False),
            ("expected_fused", "expected_fused", "f32x3", True),
            ("expected_fused_f32x2", "expected_fused", "f32x2", True),
            # the bf16 rungs steer the turbo COARSE phase only
            # (--coarse-bf16; at T=2000, where this ladder measures, bf16
            # is numerically unusable for reported energies — the rung is
            # here for the throughput/MFU record)
            ("expected_fused_bfloat16", "expected_fused", "bfloat16", True),
            ("mc_fused_bfloat16", "mc_fused", "bfloat16", True),
            ("mc_fused_float32", "mc_fused", "float32", True),
            ("mc_float32", "mc", "float32", True)):
        try:
            ladder[name] = round(bench_jax(mode, prec, rng_flag), 3)
        except Exception as ex:
            print(f"[bench] mode {name} failed ({type(ex).__name__}: {ex})",
                  file=sys.stderr)
    # the north star's stated energy formulation: exact pullback metric via
    # decoder JVPs on a coarse grid, quadrature-transferred to the T=2000
    # objective (geometry.energy.energy_jvp_ensemble).  Not comparable
    # point-for-point with the T=2000 rungs above — it does T=128 of work
    # per step targeting the same objective; quality transfer measured in
    # experiment/jvp_quality_probe.json.
    try:
        ladder["jvp_ensemble_T128_tgt2000"] = round(
            bench_jax("jvp_ensemble", "f32x3", num_t=128,
                      target_num_t=T), 3)
    except Exception as ex:
        print(f"[bench] jvp rung failed ({type(ex).__name__}: {ex})",
              file=sys.stderr)
    # fall back through the MC rungs in quality order; "mc_float32" is the
    # plain-XLA rung's ladder key (there is no bare "mc" entry)
    ours = (ladder.get("mc_fused") or ladder.get("mc_fused_f32x2")
            or ladder.get("mc_fused_float32") or ladder.get("mc_float32"))
    if ours is None:
        print("[bench] FATAL: every MC rung failed to run "
              f"(ladder: {ladder}) — no headline number to report",
              file=sys.stderr)
        sys.exit(1)

    # on-hardware numerics gate (see numerics_check docstring): a steps/s
    # number on silently-corrupted arithmetic is not a result
    import jax
    import jax.numpy as jnp

    if os.path.exists(EVAE_CKPT):
        from vae_latent_geometry_tpu.models.torch_import import (
            load_evae_checkpoint,
        )

        dec = jax.tree_util.tree_map(
            jnp.asarray, load_evae_checkpoint(EVAE_CKPT).decoders)
    else:
        from vae_latent_geometry_tpu.config import ModelConfig
        from vae_latent_geometry_tpu.models.evae import evae_init

        dec = evae_init(jax.random.PRNGKey(0), ModelConfig()).decoders
    numerics = numerics_check(dec)
    # gate semantics: a path that RAN with wrong numbers is corruption
    # (fail); a fused path that could not run at all is exactly the case
    # the ladder's XLA fallback exists for (warn, don't fail) — but the
    # XLA reference check itself must have run, else nothing was validated
    # NOTE: `not (v <= tol)` rather than `v > tol` so a NaN medrel (the
    # most corrupted arithmetic possible) fails the gate instead of
    # slipping through the comparison
    bad = [k for k, v in numerics.items()
           if isinstance(v, float) and not (v <= 1e-3)]
    not_run = [k for k, v in numerics.items() if not isinstance(v, float)]
    if "xla_expected" in not_run:
        bad.append("xla_expected")
    if not_run:
        print(f"[bench] numerics paths not runnable here (skipped from "
              f"gate): {not_run}", file=sys.stderr)
    if bad:
        print(f"[bench] NUMERICS GATE FAILED for {bad}: {numerics}",
              file=sys.stderr)

    full = {
        "metric": "ensemble_energy_opt_steps_per_sec_B200_T2000_10dec",
        # a steps/s number on corrupted arithmetic is not a result: the
        # headline is nulled (and the exit code below is non-zero) when the
        # on-hardware numerics gate fails, so automation cannot consume it
        "value": None if bad else ours,
        "unit": "steps/s",
        "vs_baseline": None if bad else round(ours / baseline, 2),
        "ladder_steps_per_sec": ladder,
        "mfu": mfu_report(ladder),
        "workload_wall_clocks": _workload_wall_clocks(),
        "numerics_gate_medrel_vs_float64": numerics,
        "numerics_gate_ok": not bad,
        "torch_cpu_baseline": {"steps_per_sec": round(baseline, 4),
                               "rel_spread": spread},
        "jax_cpu_baseline": jaxcpu,
        "vs_jax_cpu_same_program": (
            None if (bad or not jaxcpu) else
            round(ours / jaxcpu["steps_per_sec"], 2)),
        "fused_vs_unfused_same_tpu": (
            None if not (ladder.get("mc_fused_float32")
                         and ladder.get("mc_float32")) else
            round(ladder["mc_fused_float32"] / ladder["mc_float32"], 2)),
        "vs_baseline_caveat": (
            "vs_baseline's denominator is a torch-CPU reimplementation "
            "(this image has no CUDA and upstream publishes no speed "
            "numbers — BASELINE.md); vs_jax_cpu_same_program re-runs the "
            "IDENTICAL JAX program on the host CPU, and "
            "fused_vs_unfused_same_tpu isolates the kernel win on "
            "identical hardware at identical float32 precision; never "
            "quote vs_baseline without these and the workload wall-clocks "
            "in docs/PERFORMANCE.md"),
    }
    # the FULL record (baselines, caveat prose, wall-clock semantics) goes to
    # a sidecar + stderr; the final stdout line is the compact headline that
    # must survive the driver's ~2 KB tail capture
    details_path = os.path.join(REPO, "bench_details.json")
    with open(details_path, "w") as f:
        json.dump(full, f, indent=1)
    print(f"[bench] full record: {json.dumps(full)}", file=sys.stderr)
    print(make_headline(full, details_path))
    if bad:
        sys.exit(2)


# the driver captures only the final ~2,000 chars of stdout; leave headroom
HEADLINE_CHAR_BUDGET = 1500


def make_headline(full: dict, details_path: str = "bench_details.json") -> str:
    """Compact single-line headline JSON derived from the full record.

    Carries: value, vs_* ratios, the steps/s ladder, per-rung MFU, the
    numerics-gate verdict, and the key production wall clocks.  Everything
    else (caveat prose, baseline provenance, wall-clock semantics) lives in
    the ``details`` sidecar (the headline records its path).  Kept under
    HEADLINE_CHAR_BUDGET by dropping sections in priority order — wall
    clocks, then MFU, then the ladder — rather than risking a truncated
    record; value/vs_*/gate always survive (at realistic record sizes
    nothing is dropped: the real round-5 line is ~930 chars with every
    section present)."""
    mfu = full.get("mfu") or {}
    compact_mfu = {"chip": mfu.get("chip"),
                   "peak_bf16_tflops": mfu.get("peak_bf16_tflops")}
    for name, r in (mfu.get("rungs") or {}).items():
        compact_mfu[name] = [r.get("mfu_model"), r.get("mfu_mxu")]
    wc = full.get("workload_wall_clocks") or {}
    wall = {k: wc[k] for k in (
        "full133_reference_recipe_s", "full133_turbo_recipe_s",
        "full133_backstop_guaranteed_s", "cov_6300_runs_s",
        "train_600_epochs_s") if isinstance(wc.get(k), (int, float))}
    head = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "vs_baseline": full["vs_baseline"],
        "vs_jax_cpu_same_program": full.get("vs_jax_cpu_same_program"),
        "fused_vs_unfused_same_tpu": full.get("fused_vs_unfused_same_tpu"),
        "ladder_steps_per_sec": full.get("ladder_steps_per_sec"),
        "mfu": compact_mfu,
        "numerics_gate_ok": full.get("numerics_gate_ok"),
        "wall_clocks_s": wall,
        # absolute path: bench may run from any cwd (vlg-tpu bench), and a
        # consumer resolving a bare name against ITS cwd would miss the file
        "details": os.path.abspath(details_path),
    }
    line = json.dumps(head, separators=(",", ":"))
    for drop in ("wall_clocks_s", "mfu", "ladder_steps_per_sec"):
        if len(line) <= HEADLINE_CHAR_BUDGET:
            break
        head.pop(drop, None)
        line = json.dumps(head, separators=(",", ":"))
    return line


if __name__ == "__main__":
    if os.environ.get("VLG_BENCH_JAXCPU"):
        _jaxcpu_child_main()
    else:
        main()
