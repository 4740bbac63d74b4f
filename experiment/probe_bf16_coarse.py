"""Can the turbo ladder's coarse phase run at bfloat16?

The kernel precision ladder (docs/NUMERICS.md) exists because discrete
curve energies difference adjacent t-samples whose relative gap (~5e-4 at
T=2000) sits below bf16's input rounding (~2e-3) — so bf16 is unusable at
the full grid.  But the turbo COARSE phase runs at T=256, where segments
are ~8x longer and the relative gaps correspondingly larger, and the
coarse phase only steers the trajectory (polish at T=2000 f32x2 + exact-f32
final eval follow).  bf16 halves the coarse phase's MXU passes vs f32x2,
so if quality holds this is free wall-clock.

This probe runs the FULL 8,778-pair workload with the turbo plan's coarse
phase at ``expected_fused_bf16`` (per-phase energy modes,
``optim/geodesic._phase_cfgs``), twice (first invocation pays the bf16
kernels' compiles; second is steady state), and records the same
per-pair dominance stats vs the committed fixed matrix that the turbo
preset is held to.  Decision rule: the preset only changes if dominance
matches turbo's (99.2% strictly better, same tail); otherwise this
commits as a measured negative.  Writes
experiment/full133_bf16coarse_timing.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import regenerate as R

PLAN = ((1200, 256, "cosine", 3e-3, "expected_fused_bf16"),
        (200, 2000, "constant", 1e-3))
NOTE = ("turbo plan with the coarse phase at bfloat16 "
        "(cos1200@T=256 expected_fused_bf16 + 200@T=2000 f32x2 polish; "
        "final energies exact-f32 as always): at T=256 the segment gaps "
        "are ~8x the T=2000 ones, so bf16 input rounding may be tolerable "
        "for trajectory steering only")


def main():
    R._setup()
    t0 = time.perf_counter()
    R._run_full133_two_phase("bf16coarse", 1200, None, 0, NOTE,
                             phase_plan=PLAN, prec="f32x2")
    first = time.perf_counter() - t0
    R._run_full133_two_phase("bf16coarse", 1200, None, 0, NOTE,
                             phase_plan=PLAN, prec="f32x2")
    path = os.path.join(R.OUT, "full133_bf16coarse_timing.json")
    d = json.load(open(path))
    d["first_invocation_wall_s"] = round(first, 1)
    d["process_state_note"] = (
        "second of two back-to-back in-process invocations (steady state); "
        "the first (recorded above) paid the bf16 coarse kernels' "
        "compiles/cache loads")
    json.dump(d, open(path, "w"), indent=2)
    print("patched", path, flush=True)


if __name__ == "__main__":
    main()
