"""Probe: design data for adaptive polish (round-3 verdict item 2).

The shipped --turbo preset ends >1% worse than the reference fixed recipe
on ~0.6% of the 8,778 pairs (BENCH_r03 full133_fast_vs_fixed), worst pair
~1.19x in length.  Before building the production repair pass this probe
answers, at full scale on hardware:

1. WHICH pairs fail — per-pair ratio of turbo vs the committed fixed-run
   matrix (experiment/plots/geodesic_matrix_seed12_euclidean_133.json).
2. Can a turbo-side-only signal FLAG them cheaply?  Candidate features,
   all computable without the fixed run: final/init energy improvement,
   latent detour factor, coarse-grid sensitivity of the final curve,
   ensemble disagreement along the final curve.  Reported as recall of
   the bad set at flag budgets of 200-1500 pairs.
3. Which REPAIR arm fixes a flagged pair within budget?
   a. +800 polish steps @T=2000 from the turbo omega (same basin);
   b. full fixed recipe 1000@2000 from the graph init (the reference
      contract, /root/reference/src/optimize.py:153-162);
   c. quadrature-transfer arm cos1200@64(rescaled)+200@2000 from init
      (the diverse-basin arm measured in jvp_quality_probe.json).
   Each arm is merged per-pair-best with turbo (best-restore semantics
   make min() sound: energies are exact-f32 T=2000 re-evaluations).

Writes experiment/adaptive_polish_probe.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from vae_latent_geometry_tpu.cli import TURBO_PHASES
from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig, InitConfig
from vae_latent_geometry_tpu.data.tasic import load_tasic
from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.geometry.spline import design_matrix, eval_spline_design
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import evae as evae_lib
from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.optim import optimize_splines
from vae_latent_geometry_tpu.pipeline.init_splines import initialize_splines
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch
from vae_latent_geometry_tpu.pipeline.select_pairs import (
    make_pairs,
    select_representatives,
)

REF = "/root/reference"
OUT = os.path.dirname(os.path.abspath(__file__))
BS = 200


def exact_energies(decoders, basis, omega, a, b, num_t=2000, n_poly=4):
    """Exact-f32 expected energies, chunked at BS (canonical shapes)."""
    t = jnp.linspace(0.0, 1.0, num_t)
    phi = design_matrix(t, jnp.asarray(basis), n_poly)

    @jax.jit
    def ev(om, aa, bb):
        gamma = eval_spline_design(om, aa, bb, phi, t)
        return E.energy_expected(decoders, gamma)

    P = len(a)
    out = np.empty(P, np.float64)
    for s in range(0, P, BS):
        idx = np.arange(s, min(s + BS, P))
        pad = np.concatenate([idx, np.full(BS - len(idx), idx[-1])])
        e = np.asarray(ev(jnp.asarray(omega[pad]), jnp.asarray(a[pad]),
                          jnp.asarray(b[pad])))
        out[idx] = e[:len(idx)]
    return out


def per_decoder_energy_stats(decoders, basis, omega, a, b, num_t=2000,
                             n_poly=4):
    """(mean, std) over the 10 per-decoder single energies of each final
    curve — disagreement along the optimized path."""
    t = jnp.linspace(0.0, 1.0, num_t)
    phi = design_matrix(t, jnp.asarray(basis), n_poly)

    @jax.jit
    def ev(om, aa, bb):
        gamma = eval_spline_design(om, aa, bb, phi, t)
        es = jax.vmap(lambda d: E.energy_single(d, gamma))(decoders)  # (M,B)
        return es.mean(0), es.std(0)

    P = len(a)
    mu = np.empty(P, np.float64)
    sd = np.empty(P, np.float64)
    for s in range(0, P, BS):
        idx = np.arange(s, min(s + BS, P))
        pad = np.concatenate([idx, np.full(BS - len(idx), idx[-1])])
        m, d = ev(jnp.asarray(omega[pad]), jnp.asarray(a[pad]),
                  jnp.asarray(b[pad]))
        mu[idx] = np.asarray(m)[:len(idx)]
        sd[idx] = np.asarray(d)[:len(idx)]
    return mu, sd


def main():
    params = load_evae_checkpoint(f"{REF}/experiment/model_seed12.pt")
    data = load_tasic()
    decoders = jax.tree_util.tree_map(jnp.asarray, params.decoders)

    z_mean = jax.jit(lambda p, x: evae_lib.encode(p, x)[0])(
        params, jnp.asarray(data.x))
    latents = np.asarray(z_mean)
    reps = select_representatives(latents, data.labels, 133)
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
    P = len(art.a)
    basis = np.asarray(art.basis)

    # ---- 1. full turbo run --------------------------------------------
    turbo_cfg = GeodesicConfig(
        steps=1200, lr=3e-3, lr_schedule="cosine", batch_size=BS,
        phase_plan=TURBO_PHASES,
        energy=EnergyConfig(num_t=2000, mode="expected_fused",
                            kernel_precision="f32x2"))
    t0 = time.perf_counter()
    res = optimize_spline_batch(params, art, cfg=turbo_cfg,
                                log_every_chunk=False)
    turbo_wall = time.perf_counter() - t0
    om_turbo = np.asarray(res.omega_optimized)
    L_turbo = np.asarray(res.geodesic_length, np.float64)
    print(f"[turbo] {turbo_wall:.1f}s", flush=True)

    # ---- 2. per-pair ratio vs the committed fixed matrix --------------
    fixed = json.load(open(os.path.join(
        OUT, "plots", "geodesic_matrix_seed12_euclidean_133.json")))
    lbl_idx = {l: i for i, l in enumerate(fixed["cluster_ids"])}
    fm = np.asarray(fixed["distance_matrix"], float)
    L_fixed = np.array([fm[lbl_idx[p[0]], lbl_idx[p[1]]]
                        for p in art.pair_labels])
    ok = np.isfinite(L_turbo) & np.isfinite(L_fixed) & np.asarray(art.valid)
    ratio = np.where(ok, L_turbo / np.maximum(L_fixed, 1e-12), 1.0)
    bad = ok & (ratio > 1.0)
    bad1 = ok & (ratio > 1.01)
    print(f"[compare] worse-than-fixed {bad.sum()}, >1% {bad1.sum()}, "
          f"max {ratio.max():.4f}", flush=True)

    # ---- 3. turbo-side flag features -----------------------------------
    t0 = time.perf_counter()
    E0 = exact_energies(decoders, basis, np.asarray(art.omega_init),
                        np.asarray(art.a), np.asarray(art.b))
    Ef = L_turbo ** 2
    mu1, sd1 = per_decoder_energy_stats(decoders, basis, om_turbo,
                                        np.asarray(art.a), np.asarray(art.b))
    E256 = exact_energies(decoders, basis, om_turbo, np.asarray(art.a),
                          np.asarray(art.b), num_t=256)
    eucl = np.linalg.norm(np.asarray(art.a) - np.asarray(art.b), axis=1)
    feat_wall = time.perf_counter() - t0

    r255 = 255.0 / 1999.0
    feats = {
        # big value = suspicious
        "improve": Ef / np.maximum(E0, 1e-12),
        "detour": np.sqrt(np.maximum(Ef, 0)) / np.maximum(eucl, 1e-12),
        "grid_sens": np.abs(E256 / r255 / np.maximum(Ef, 1e-12) - 1.0),
        "disagree": sd1 / np.maximum(mu1, 1e-12),
    }
    budgets = [200, 400, 600, 1000, 1500]
    flag_eval = {}
    nbad, nbad1 = int(bad.sum()), int(bad1.sum())
    for name, v in feats.items():
        v = np.where(ok, v, -np.inf)
        order = np.argsort(-v)
        rec = {}
        for kb in budgets:
            sel = np.zeros(P, bool)
            sel[order[:kb]] = True
            rec[str(kb)] = {
                "recall_worse": round(float((sel & bad).sum() / max(nbad, 1)), 4),
                "recall_worse1pct": round(
                    float((sel & bad1).sum() / max(nbad1, 1)), 4),
            }
        flag_eval[name] = rec
        print(f"[flag {name}] {rec}", flush=True)

    # ---- 4. repair arms on the bad set ---------------------------------
    bad_idx = np.where(bad)[0]
    pad = np.concatenate([bad_idx,
                          np.full((-len(bad_idx)) % BS,
                                  bad_idx[-1] if len(bad_idx) else 0)])
    a_c = jnp.asarray(np.asarray(art.a)[pad])
    b_c = jnp.asarray(np.asarray(art.b)[pad])
    om_init_c = jnp.asarray(np.asarray(art.omega_init)[pad])
    om_turbo_c = jnp.asarray(om_turbo[pad])
    key = jax.random.PRNGKey(101)

    def run_arm(plan, om0):
        cfg = GeodesicConfig(
            steps=plan[0][0], batch_size=BS, phase_plan=plan,
            energy=EnergyConfig(num_t=2000, mode="expected_fused",
                                kernel_precision="f32x2", target_num_t=2000))
        t0 = time.perf_counter()
        r = optimize_splines(params.decoders, om0, a_c, b_c, basis, cfg,
                             key=key)
        wall = time.perf_counter() - t0
        e = exact_energies(decoders, basis, np.asarray(r.omega),
                           np.asarray(a_c), np.asarray(b_c))
        return np.sqrt(np.maximum(e, 0)), wall

    arms = {
        "repolish800@2000": (((800, 2000, "constant", 1e-3,
                               "expected_fused"),), om_turbo_c),
        "fixed1000@2000": (((1000, 2000, "constant", 1e-3,
                             "expected_fused"),), om_init_c),
        "rescaled64+polish": (((1200, 64, "cosine", 3e-3,
                                "expected_rescaled"),
                               (200, 2000, "constant", 1e-3,
                                "expected_fused")), om_init_c),
    }
    arm_out = {}
    for name, (plan, om0) in arms.items():
        L_arm, wall = run_arm(plan, om0)
        L_arm = L_arm[:len(bad_idx)]
        merged = np.minimum(L_turbo[bad_idx], L_arm)
        mr = merged / np.maximum(L_fixed[bad_idx], 1e-12)
        arm_out[name] = {
            "wall_s_per_200chunk": round(wall, 2),
            "n_pairs": int(len(bad_idx)),
            "after_merge_max_ratio": round(float(mr.max()), 5)
            if len(bad_idx) else None,
            "after_merge_frac_not_worse_1pct": round(
                float((mr <= 1.01).mean()), 4) if len(bad_idx) else None,
            "after_merge_frac_not_worse": round(
                float((mr <= 1.0 + 1e-9).mean()), 4) if len(bad_idx) else None,
        }
        print(f"[arm {name}] {arm_out[name]}", flush=True)

    out = {
        "workload": "full 8778-pair turbo run (cos1200@256+200@2000, "
                    "expected_fused@f32x2) vs the committed fixed-run "
                    "matrix; exact-f32 T=2000 energies throughout",
        "turbo_wall_s": round(turbo_wall, 1),
        "feature_wall_s": round(feat_wall, 1),
        "n_pairs": int(P),
        "n_worse": nbad,
        "n_worse_1pct": nbad1,
        "max_ratio": round(float(ratio.max()), 5),
        "worst20": [
            {"pair": list(art.pair_labels[i]), "ratio": round(float(ratio[i]), 5),
             "L_turbo": round(float(L_turbo[i]), 4),
             "L_fixed": round(float(L_fixed[i]), 4),
             "improve": round(float(feats["improve"][i]), 4),
             "detour": round(float(feats["detour"][i]), 4),
             "grid_sens": round(float(feats["grid_sens"][i]), 5),
             "disagree": round(float(feats["disagree"][i]), 4)}
            for i in np.argsort(-np.where(ok, ratio, 0))[:20]],
        "flag_recall_at_budget": flag_eval,
        "repair_arms_on_worse_set": arm_out,
    }
    path = os.path.join(OUT, "adaptive_polish_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
