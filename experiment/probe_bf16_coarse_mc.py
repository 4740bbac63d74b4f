"""MC analogue of the bf16-coarse probe (see probe_bf16_coarse.py): the
turbo plan with the coarse phase at mc_fused_bf16.  The MC kernels are
select/accumulate VPU-bound (experiment/mc_gap_profile.json), so halving
the coarse phase's MXU passes should buy LESS than the expected-mode
12.5% — this measures how much.  Writes
experiment/full133_mc_bf16coarse_timing.json."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import regenerate as R

PLAN = ((1200, 256, "cosine", 3e-3, "mc_fused_bf16"),
        (200, 2000, "constant", 1e-3))
NOTE = ("MC turbo plan with the coarse phase at bfloat16 "
        "(cos1200@T=256 mc_fused_bf16 + 200@T=2000 mc_fused f32x2 polish; "
        "final energies single MC draws at exact f32, like the reference)")

def main():
    R._setup()
    t0 = time.perf_counter()
    R._run_full133_two_phase("mc_bf16coarse", 1200, None, 0, NOTE,
                             phase_plan=PLAN, mode="mc_fused", prec="f32x2",
                             fixed_tag="mc")
    first = time.perf_counter() - t0
    R._run_full133_two_phase("mc_bf16coarse", 1200, None, 0, NOTE,
                             phase_plan=PLAN, mode="mc_fused", prec="f32x2",
                             fixed_tag="mc")
    path = os.path.join(R.OUT, "full133_mc_bf16coarse_timing.json")
    d = json.load(open(path))
    d["first_invocation_wall_s"] = round(first, 1)
    d["process_state_note"] = (
        "second of two back-to-back in-process invocations (steady state); "
        "the first (recorded above) paid the bf16 coarse kernels' "
        "compiles/cache loads.  Both sides' final energies are single MC "
        "draws, so the per-pair ratios carry both draws' noise")
    json.dump(d, open(path, "w"), indent=2)
    print("patched", path, flush=True)

if __name__ == "__main__":
    main()
