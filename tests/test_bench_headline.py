"""The bench headline must survive the driver's ~2 KB stdout-tail capture.

Round 4's official perf record (BENCH_r04.json) came back ``parsed: null``
because bench.py's single output line grew past the capture window and the
tail started mid-key.  These tests pin the contract: ``make_headline`` emits
ONE line of valid JSON, under budget, carrying the headline value, the
steps/s ladder, per-rung MFU, and the numerics-gate verdict — fed with a
full record at least as large as the real round-4 one.
"""

import json

import bench


def _realistic_full_record() -> dict:
    """A full bench record mirroring the real round-4 output (same keys,
    same cardinality, unrounded floats) so the length check is honest."""
    rungs = ["mc_fused", "mc_fused_f32x2", "mc_fused_extidx",
             "expected_fused", "expected_fused_f32x2", "mc_fused_float32",
             "mc_float32"]
    ladder = {name: 80.0 + 13.456789 * i for i, name in enumerate(rungs)}
    ladder["jvp_ensemble_T128_tgt2000"] = 148.512
    mfu = {"model_gflops_per_step": 553.0, "chip": "tpu v5 lite",
           "peak_bf16_tflops": 197.0,
           "rungs": {name: {"mfu_model": 0.2257 + 0.01 * i,
                            "mfu_mxu": 0.7489 + 0.01 * i}
                     for i, name in enumerate(rungs)}}
    wall = {
        "full133_reference_recipe_s": 374.0932189464,
        "full133_fast_recipe_s": 236.12,
        "full133_turbo_recipe_s": 166.4921,
        "full133_mc_semantics_s": 411.2,
        "full133_mc_turbo_s": 201.3,
        "full133_mc_turbo_f32x2_s": 188.8,
        "cov_6300_runs_s": 164.2,
        "train_600_epochs_s": 18.1,
        "train_6seeds_600_epochs_s": 36.6,
        "full133_backstop_guaranteed_s": 529.003,
        "full133_rescaled64_s": 240.1,
        "cli_invocation_warm_vs_uncached_s": {"warm": 11.4, "uncached": 522.0},
        "full133_fast_vs_fixed": {
            "n_common": 8778, "median_len_ratio_vs_fixed": 0.9479370885396653,
            "max_len_ratio_vs_fixed": 1.195844000064635,
            "frac_strictly_better": 0.9925951241740716,
            "frac_not_worse_1pct": 0.9944178628389154},
        "full133_backstop_vs_fixed": {
            "n_common": 8778, "median_len_ratio_vs_fixed": 0.949553224227047,
            "max_len_ratio_vs_fixed": 1.0, "frac_not_worse_1pct": 1.0,
            "frac_not_worse": 1.0, "note_on_max": "x" * 120},
        "wall_clock_semantics": {"default": "y" * 200},
    }
    return {
        "metric": "ensemble_energy_opt_steps_per_sec_B200_T2000_10dec",
        "value": ladder["mc_fused"],
        "unit": "steps/s",
        "vs_baseline": 4518.65,
        "ladder_steps_per_sec": ladder,
        "mfu": mfu,
        "workload_wall_clocks": wall,
        "numerics_gate_medrel_vs_float64": {
            "xla_expected": 5.64646937937197e-08,
            "fused_expected": 2.6892341592360673e-08,
            "fused_expected_t": 7.725575064596537e-08},
        "numerics_gate_ok": True,
        "torch_cpu_baseline": {"steps_per_sec": 0.0178,
                               "rel_spread": 1.9296565031146862},
        "jax_cpu_baseline": {"steps_per_sec": 0.0484, "steps_measured": 8,
                             "workload": "B=200,T=2000,Mdec=10,MC=2",
                             "device": "jax-cpu"},
        "vs_jax_cpu_same_program": 1657.6,
        "fused_vs_unfused_same_tpu": 3.79,
        "vs_baseline_caveat": "z" * 600,
    }


def test_headline_parses_and_fits_budget():
    line = bench.make_headline(_realistic_full_record())
    assert "\n" not in line
    assert len(line) <= bench.HEADLINE_CHAR_BUDGET, len(line)
    assert bench.HEADLINE_CHAR_BUDGET <= 1800  # driver tail is ~2,000 chars
    head = json.loads(line)
    assert head["value"] == 80.0
    assert head["unit"] == "steps/s"
    assert head["numerics_gate_ok"] is True
    assert len(head["ladder_steps_per_sec"]) == 8
    # per-rung MFU for the shipping rungs must be in the driver record
    assert head["mfu"]["expected_fused_f32x2"][1] > 0
    assert head["mfu"]["mc_fused_f32x2"][0] > 0
    assert head["wall_clocks_s"]["full133_backstop_guaranteed_s"] == 529.003
    # absolute so any-cwd consumers can resolve the sidecar
    assert head["details"].endswith("bench_details.json")
    assert head["details"].startswith("/")


def test_headline_from_committed_details_record():
    """The committed bench_details.json (the real hardware record) must
    itself compress to an under-budget, parseable headline."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_details.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no committed bench_details.json")
    with open(path) as f:
        full = json.load(f)
    line = bench.make_headline(full)
    assert len(line) <= bench.HEADLINE_CHAR_BUDGET, len(line)
    head = json.loads(line)
    assert head["unit"] == "steps/s"
    assert "ladder_steps_per_sec" in head and "mfu" in head


def test_headline_nulled_value_survives():
    full = _realistic_full_record()
    full["value"] = None
    full["vs_baseline"] = None
    full["numerics_gate_ok"] = False
    head = json.loads(bench.make_headline(full))
    assert head["value"] is None
    assert head["numerics_gate_ok"] is False


def test_headline_drops_sections_rather_than_overflowing():
    full = _realistic_full_record()
    # pathological: a ladder 10x the real size still may not overflow the
    # final line — the guard drops wall clocks then MFU before giving up
    full["ladder_steps_per_sec"] = {
        f"rung_with_a_rather_long_name_{i:03d}": 123.456789
        for i in range(30)}
    full["mfu"]["rungs"] = {k: {"mfu_model": 0.1234, "mfu_mxu": 0.5678}
                            for k in full["ladder_steps_per_sec"]}
    line = bench.make_headline(full)
    head = json.loads(line)
    assert len(line) <= bench.HEADLINE_CHAR_BUDGET
    # the headline value and the gate verdict ALWAYS survive
    assert head["value"] == 80.0
    assert "numerics_gate_ok" in head
