"""Golden tail forensics (round-3 verdict item 4).

The seed-12 golden comparisons have an excellent median (1.0%) but a fat
tail: p90 0.11, max 0.52 vs the golden matrix; the trajectory golden (tier
A, identical inits) shows the same shape (p90 0.109, max 0.40).  This
script diagnoses the tail per-pair instead of hand-waving it.

Tier A is the forensically clean set: the reference blob
(/root/reference/src/artifacts/optimized_geodesics_seed12_p50.pt, 1225
splines) carries the reference's OWN omega_init, omega_optimized and
recorded length_geodesic — so for every pair we can evaluate, under the
identical decoder and T=2000 grid:

- E_ours:  discrete energy of OUR final curve (500 steps from their init,
  reference config src/single_decoder/optimize_energy_batched.py:59-125);
- E_gold:  discrete energy of THEIR final curve;
- L_gold_recomputed vs their recorded length (quantifies the reference's
  stale-by-one energy recording, src/optimize.py:168, and any
  arc-length-vs-grid mismatch in their recording).

Whoever has the lower exact energy found the better optimum of the SAME
objective; a large length gap with near-equal energies is a
near-degenerate multimodal pair, not an optimizer failure.  For the
worst-20 pairs where ours is LONGER, two repair probes answer whether the
golden basin is reachable:

- polish-from-golden: 300 steps lr 1e-4 from THEIR omega under OUR
  objective — if energy stays at E_gold the basin is genuine and distinct
  (init-sensitive multimodality); if it collapses to ours, their recorded
  optimum is not a minimum of the exact objective;
- restart: 500 steps from a perturbed init (3 noise scales), does any
  restart reach E_gold?

Tier B (p133 matrix golden, no omegas committed upstream) gets the sign
tally: on the tail, is OUR length shorter (we found the better minimum) or
longer?  Plus the worst-20 pair list with per-pair values.

Writes experiment/golden_tail_analysis.json.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/src/artifacts"

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry import energy as E
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.geometry.spline import (
    design_matrix,
    eval_spline_design,
)
from vae_latent_geometry_tpu.models.torch_import import (
    load_single_vae_mean_decoder,
)
from vae_latent_geometry_tpu.optim import optimize_splines

BS = 512


def _pad(idx, n):
    return np.concatenate([idx, np.full(n - len(idx), idx[-1])]) \
        if len(idx) < n else idx


def eval_curves(decoder, basis, omega, a, b, num_t=2000):
    """(energy, data-space length) of each curve, exact f32, chunked."""
    t = jnp.linspace(0.0, 1.0, num_t)
    phi = design_matrix(t, jnp.asarray(basis), 4)

    @jax.jit
    def ev(om, aa, bb):
        gamma = eval_spline_design(om, aa, bb, phi, t)
        return E.energy_single(decoder, gamma), E.geodesic_lengths(
            decoder, gamma)

    P = len(a)
    en = np.empty(P, np.float64)
    ln = np.empty(P, np.float64)
    for s in range(0, P, BS):
        idx = _pad(np.arange(s, min(s + BS, P)), BS)
        e_, l_ = ev(jnp.asarray(omega[idx]), jnp.asarray(a[idx]),
                    jnp.asarray(b[idx]))
        k = min(BS, P - s)
        en[s:s + k] = np.asarray(e_)[:k]
        ln[s:s + k] = np.asarray(l_)[:k]
    return en, ln


def opt(decoder, basis, omega0, a, b, steps=500, lr=1e-3, num_t=2000):
    cfg = GeodesicConfig(steps=steps, lr=lr,
                         energy=EnergyConfig(num_t=num_t, mode="single_fused"))
    P = len(a)
    out = np.zeros_like(omega0)
    for s in range(0, P, BS):
        idx = _pad(np.arange(s, min(s + BS, P)), BS)
        r = optimize_splines(decoder, jnp.asarray(omega0[idx]),
                             jnp.asarray(a[idx]), jnp.asarray(b[idx]),
                             basis, cfg)
        k = min(BS, P - s)
        out[s:s + k] = np.asarray(r.omega)[:k]
    return out


def tier_a():
    import torch

    blob = torch.load(f"{REF}/optimized_geodesics_seed12_p50.pt",
                      map_location="cpu", weights_only=False)
    entries = blob if isinstance(blob, list) else blob["spline_data"]
    a = np.stack([e["a"].numpy() for e in entries]).astype(np.float32)
    b = np.stack([e["b"].numpy() for e in entries]).astype(np.float32)
    om0 = np.stack([e["omega_init"].numpy() for e in entries]).astype(
        np.float32)
    om_gold = np.stack([e["omega_optimized"].numpy() for e in entries]).astype(
        np.float32)
    len_rec = np.array([e["length_geodesic"] for e in entries], np.float64)
    basis, _ = nullspace_basis(4)
    decoder = load_single_vae_mean_decoder(f"{REF}/vae_best_seed12.pth")

    t0 = time.perf_counter()
    om_ours = opt(decoder, basis, om0, a, b)
    e_ours, l_ours = eval_curves(decoder, basis, om_ours, a, b)
    e_gold, l_gold = eval_curves(decoder, basis, om_gold, a, b)
    wall = time.perf_counter() - t0

    rel = np.abs(l_ours - len_rec) / np.maximum(len_rec, 1e-12)
    rec_err = np.abs(l_gold - len_rec) / np.maximum(len_rec, 1e-12)
    e_ratio = e_ours / np.maximum(e_gold, 1e-12)
    tail = rel > 0.1

    order = np.argsort(-rel)
    worst = []
    for i in order[:20]:
        worst.append({
            "i": int(i), "rel_len": round(float(rel[i]), 4),
            "L_ours": round(float(l_ours[i]), 4),
            "L_gold_recorded": round(float(len_rec[i]), 4),
            "L_gold_recomputed": round(float(l_gold[i]), 4),
            "E_ours": round(float(e_ours[i]), 4),
            "E_gold": round(float(e_gold[i]), 4),
            "ours_lower_energy": bool(e_ours[i] <= e_gold[i] * (1 + 1e-3)),
        })

    # repair probes on the worst-20 pairs where OUR energy is higher
    worse_idx = np.array([w["i"] for w in worst
                          if not w["ours_lower_energy"]], int)
    probes = {}
    if len(worse_idx):
        sub = _pad(worse_idx, min(BS, max(len(worse_idx), 1)))
        # polish-from-golden under our exact objective
        om_p = opt(decoder, basis, om_gold[sub], a[sub], b[sub],
                   steps=300, lr=1e-4)
        e_p, _ = eval_curves(decoder, basis, om_p, a[sub], b[sub])
        stay = e_p[:len(worse_idx)] <= e_gold[worse_idx] * 1.01
        probes["polish_from_golden_stays_in_basin"] = [
            bool(x) for x in stay]
        # restarts from perturbed inits: is the golden basin reachable?
        best = np.full(len(worse_idx), np.inf)
        rng = np.random.default_rng(0)
        for scale in (0.05, 0.15, 0.3):
            noise = rng.normal(size=om0[sub].shape).astype(np.float32)
            om_r = opt(decoder, basis,
                       om0[sub] + scale * noise *
                       np.abs(om_gold[sub] - om0[sub]).mean(),
                       a[sub], b[sub], steps=500)
            e_r, _ = eval_curves(decoder, basis, om_r, a[sub], b[sub])
            best = np.minimum(best, e_r[:len(worse_idx)])
        probes["restart_best_reaches_golden"] = [
            bool(x) for x in best <= e_gold[worse_idx] * 1.01]
        probes["restart_best_energy_ratio_vs_golden"] = [
            round(float(x), 4) for x in best / e_gold[worse_idx]]

    return {
        "n": int(len(a)), "wall_s": round(wall, 1),
        "median_rel_len": round(float(np.median(rel)), 5),
        "p90_rel_len": round(float(np.quantile(rel, 0.9)), 5),
        "max_rel_len": round(float(rel.max()), 5),
        "golden_recording_error": {
            "note": "recorded length_geodesic vs recomputing the length of "
                    "the golden omega on the same T=2000 grid — nonzero "
                    "values are the reference's own recording artifact "
                    "(stale-by-one energy, src/optimize.py:168, and "
                    "grid/arc-length differences), not optimization error",
            "median": round(float(np.median(rec_err)), 6),
            "p90": round(float(np.quantile(rec_err, 0.9)), 6),
            "max": round(float(rec_err.max()), 6),
        },
        "energy_dominance": {
            "frac_ours_energy_not_worse": round(
                float((e_ratio <= 1.001).mean()), 4),
            "median_energy_ratio": round(float(np.median(e_ratio)), 5),
            "tail_rel_gt_0.1": {
                "n": int(tail.sum()),
                "frac_ours_energy_not_worse": round(
                    float((e_ratio[tail] <= 1.001).mean()), 4)
                if tail.any() else None,
                "median_energy_ratio": round(
                    float(np.median(e_ratio[tail])), 5)
                if tail.any() else None,
            },
        },
        "worst20": worst,
        "repair_probes_on_worst20_ours_worse": probes,
    }


def tier_b():
    from vae_latent_geometry_tpu.pipeline import golden as G

    t0 = time.perf_counter()
    mat, labels, art = G.reproduce_matrix(12, steps=500, num_t=2000,
                                          batch_size=500, log=False)
    wall = time.perf_counter() - t0
    gold, gold_labels = G.golden_matrix(12)
    ours_c, gold_c, common = G.align_by_labels(mat, labels, gold, gold_labels)
    iu = np.triu_indices(len(common), k=1)
    x, y = ours_c[iu], gold_c[iu]
    ok = np.isfinite(x) & np.isfinite(y)
    rel = np.where(ok, np.abs(x - y) / np.maximum(np.abs(y), 1e-12), 0)
    shorter = x < y
    tail = ok & (rel > 0.1)
    order = np.argsort(-rel)
    worst = [{
        "pair": [common[iu[0][k]], common[iu[1][k]]],
        "rel": round(float(rel[k]), 4),
        "L_ours": round(float(x[k]), 4),
        "L_gold": round(float(y[k]), 4),
        "ours_shorter": bool(shorter[k]),
    } for k in order[:20]]
    return {
        "n_common": int(ok.sum()), "wall_s": round(wall, 1),
        "median_rel": round(float(np.median(rel[ok])), 5),
        "p90_rel": round(float(np.quantile(rel[ok], 0.9)), 5),
        "max_rel": round(float(rel[ok].max()), 5),
        "tail_rel_gt_0.1": {
            "n": int(tail.sum()),
            "frac_ours_shorter": round(float(shorter[tail].mean()), 4)
            if tail.any() else None,
        },
        "frac_ours_shorter_overall": round(float(shorter[ok].mean()), 4),
        "worst20": worst,
    }


def tier_c():
    """Reachability of the golden p133 lengths on the tier-B worst-20 pairs:
    from our init (identical method to the reference's init_spline.py:
    euclidean 200x200 grid, k=8), can ANY of {3000-step run, 4 perturbed
    restarts x 1000 steps} reach the golden length?  If no arm comes close,
    those golden entries are not minima reachable from the published init
    recipe (the uncommitted p133 blob may carry a different init or the
    recording mismatch measured in tier A's seed-12 blob); if some arm
    reaches them, our single 500-step run lands a worse basin and the gap
    is real optimizer headroom."""
    from vae_latent_geometry_tpu.pipeline import golden as G

    prev = json.load(open(os.path.join(
        REPO, "experiment", "golden_tail_analysis.json")))
    worst = prev["tier_b_matrix_seed12"]["worst20"]
    art = G.build_init_artifact(12)
    decoder = load_single_vae_mean_decoder(f"{REF}/vae_best_seed12.pth")
    basis = np.asarray(art.basis)

    lab2idx = {}
    for k, (la, lb) in enumerate(art.pair_labels):
        lab2idx[(la, lb)] = k
        lab2idx[(lb, la)] = k
    idx = np.array([lab2idx[tuple(w["pair"])] for w in worst], int)
    sub = _pad(idx, BS)
    a = np.asarray(art.a)[sub]
    b = np.asarray(art.b)[sub]
    om0 = np.asarray(art.omega_init)[sub]

    t0 = time.perf_counter()
    om_l, _ = (opt(decoder, basis, om0, a, b, steps=3000), None)
    _, l_long = eval_curves(decoder, basis, om_l, a, b)
    best = l_long.copy()
    rng = np.random.default_rng(7)
    for r in range(4):
        noise = rng.normal(size=om0.shape).astype(np.float32)
        scale = (0.3, 0.6, 1.0, 2.0)[r]
        om_r = opt(decoder, basis, om0 + scale * noise, a, b, steps=1000)
        _, l_r = eval_curves(decoder, basis, om_r, a, b)
        best = np.minimum(best, l_r)
    wall = time.perf_counter() - t0

    rows = []
    for k, w in enumerate(worst):
        rows.append({**w,
                     "L_3000step": round(float(l_long[k]), 4),
                     "L_best_of_restarts": round(float(best[k]), 4),
                     "reaches_golden_5pct": bool(
                         best[k] <= w["L_gold"] * 1.05)})
    n_reach = sum(r["reaches_golden_5pct"] for r in rows)
    return {
        "n_probed": len(worst), "wall_s": round(wall, 1),
        "n_reach_golden_within_5pct": int(n_reach),
        "rows": rows,
    }


def tier_d():
    """Does a stronger recipe collapse the p133 tail?  Tier C showed the
    worst pairs are convergence headroom (3000 steps or restarts reach or
    beat the golden), so re-run the FULL p133 reproduction with the
    turbo-style ladder (cos1200@256 + 200@2000 polish) plus a 1000-step
    backstop-free long fixed arm, and report ASYMMETRIC stats: a pair
    where ours is SHORTER than golden is a win (the golden itself is a
    500-step Adam artifact, not ground truth), so the parity claim is
    'ours <= golden * (1+tol) on X% of pairs'."""
    from vae_latent_geometry_tpu.pipeline import golden as G

    t0 = time.perf_counter()
    mat, labels, art = G.reproduce_matrix(
        12, steps=3000, num_t=2000, batch_size=500, log=False)
    wall = time.perf_counter() - t0
    gold, gold_labels = G.golden_matrix(12)
    ours_c, gold_c, common = G.align_by_labels(mat, labels, gold, gold_labels)
    iu = np.triu_indices(len(common), k=1)
    x, y = ours_c[iu], gold_c[iu]
    ok = np.isfinite(x) & np.isfinite(y)
    x, y = x[ok], y[ok]
    ratio = x / np.maximum(y, 1e-12)
    rel = np.abs(x - y) / np.maximum(y, 1e-12)
    return {
        "recipe": "3000 fixed steps @T=2000 (6x the reference budget; "
                  "tier C showed the 500-step tail is convergence "
                  "headroom on far-cluster pairs)",
        "n_common": int(ok.sum()), "wall_s": round(wall, 1),
        "median_rel": round(float(np.median(rel)), 5),
        "p90_rel": round(float(np.quantile(rel, 0.9)), 5),
        "max_rel": round(float(rel.max()), 5),
        "frac_ours_not_longer_1pct": round(float((ratio <= 1.01).mean()), 4),
        "frac_ours_shorter": round(float((ratio < 1.0).mean()), 4),
        "p99_ratio": round(float(np.quantile(ratio, 0.99)), 5),
        "max_ratio": round(float(ratio.max()), 5),
    }


def main():
    out = {}
    tiers = sys.argv[1:] or ["a", "b"]
    if "a" in tiers:
        out["tier_a_trajectory_seed12"] = tier_a()
        print(json.dumps(out["tier_a_trajectory_seed12"], indent=1)[:2000],
              flush=True)
    if "b" in tiers:
        out["tier_b_matrix_seed12"] = tier_b()
        print(json.dumps(out["tier_b_matrix_seed12"], indent=1)[:1500],
              flush=True)
    if "c" in tiers:
        out["tier_c_reachability_worst20"] = tier_c()
        print(json.dumps(out["tier_c_reachability_worst20"], indent=1)[:1500],
              flush=True)
    if "d" in tiers:
        out["tier_d_strong_recipe_p133"] = tier_d()
        print(json.dumps(out["tier_d_strong_recipe_p133"], indent=1),
              flush=True)
    path = os.path.join(REPO, "experiment", "golden_tail_analysis.json")
    existing = {}
    if os.path.exists(path):
        existing = json.load(open(path))
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
