"""Probe: T-chunk (rows-per-block) sweep for the fused kernels.

The kernels stream the curve through VMEM in Tc x B row blocks; Tc is
picked so Tc*B ~ a target row count (ops/energy_pallas._pick_chunk,
default 4096 rows -> Tc=16 at the reference workload; the MC backward uses
2048).  Larger blocks amortize per-dot and loop overhead and give the MXU
longer row streams per resident weight tile; smaller blocks pipeline more.
This sweep measures full fwd+bwd+Adam steps/s at the bench workload for
each candidate block size.

Writes experiment/tc_sweep_probe.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import bench
from vae_latent_geometry_tpu.ops import energy_pallas
from vae_latent_geometry_tpu.ops import energy_mc_pallas

OUT = os.path.dirname(os.path.abspath(__file__))
_ORIG_PICK = energy_pallas._pick_chunk


def set_rows(expected_rows, mc_rows):
    def pick(T, B, target_rows=4096):
        # MC call sites pass target_rows=2048 explicitly; expected sites use
        # the default — distinguish on that
        tgt = mc_rows if target_rows == 2048 else expected_rows
        return _ORIG_PICK(T, B, tgt)
    energy_pallas._pick_chunk = pick
    energy_mc_pallas._pick_chunk = pick
    # the patch only changes TRACE-time behavior: drop every cached jit
    # executable or each config silently reruns the first one's program
    jax.clear_caches()


def main():
    out = {"workload": "bench workload B=200 T=2000 M=10, full "
                       "fwd+bwd+Adam steps/s", "rows": {}}
    # (label, expected-kernel target rows, mc target rows)
    for label, er, mr in [
        ("base_3200_2048", 4096, 2048),       # current defaults
        ("big_8000_5120", 8000, 5120),        # Tc=40 both
        ("small_1600_1024", 1600, 1024),      # Tc=8 both
    ]:
        set_rows(er, mr)
        row = {}
        for mode, prec in [("expected_fused", "f32x2"),
                           ("expected_fused", "f32x3"),
                           ("mc_fused", "f32x3")]:
            sps = bench.bench_jax(mode, prec)
            row[f"{mode}@{prec}"] = round(sps, 1)
            print(f"[{label}] {mode}@{prec}: {sps:.1f} steps/s", flush=True)
        out["rows"][label] = row
    energy_pallas._pick_chunk = _ORIG_PICK
    energy_mc_pallas._pick_chunk = _ORIG_PICK

    with open(os.path.join(OUT, "tc_sweep_probe.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote tc_sweep_probe.json")


if __name__ == "__main__":
    main()
