"""CLI smoke tests: tiny end-to-end pipeline in a temp workdir."""

import json
import os

import numpy as np
import pytest

from vae_latent_geometry_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, rng):
    """Isolated workdir with a tiny synthetic dataset on disk."""
    wd = tmp_path_factory.mktemp("cliwork")
    data_dir = wd / "data"
    data_dir.mkdir()
    n = 600
    labels = np.array([f"c{i % 8}" for i in range(n)])
    x = rng.normal(size=(n, 50)).astype(np.float32)
    x[:, :2] += 5.0 * np.stack([np.cos(2 * np.pi * (np.arange(n) % 8) / 8),
                                np.sin(2 * np.pi * (np.arange(n) % 8) / 8)],
                               axis=1)
    np.save(data_dir / "tasic-pca50.npy", x)
    np.save(data_dir / "tasic-ttypes.npy", labels)
    cwd = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(cwd)


def test_full_cli_pipeline(workdir):
    dd = str(workdir / "data")
    # 1. train
    main(["train", "--data-dir", dd, "--epochs", "2", "--seed", "5",
          "--num-decoders", "3"])
    assert (workdir / "experiment" / "model_seed5.npz").exists()
    # 2. select pairs
    main(["select-pairs", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz", "--max-labels", "4"])
    pairfile = workdir / "experiment" / "pairs" / "selected_pairs_4.json"
    assert pairfile.exists()
    pdata = json.loads(pairfile.read_text())
    assert len(pdata["representatives"]) == 4 and len(pdata["pairs"]) == 6
    # 3. init splines (euclidean)
    main(["init-splines", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--pairfile", str(pairfile), "--grid", "40"])
    init_path = (workdir / "experiment" / "splines_init_model_seed5" /
                 "spline_batch_init_euclidean_4.npz")
    assert init_path.exists()
    # 4. optimize (tiny config)
    main(["optimize", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--steps", "15", "--num-t", "48", "--energy-mode", "expected"])
    opt_path = (workdir / "experiment" / "splines_opt_model_seed5" /
                "spline_batch_opt_euclidean_4.npz")
    assert opt_path.exists()
    # 5. eval matrix
    main(["eval", "--mode", "matrix", "--seed", "5",
          "--init-type", "euclidean", "--pair-count", "4",
          "--splines", str(opt_path)])
    mat_json = (workdir / "experiment" / "plots" /
                "geodesic_matrix_seed5_euclidean_4.json")
    assert mat_json.exists()
    m = json.loads(mat_json.read_text())
    assert len(m["distance_matrix"]) == 4
    # 6. eval cov (model-dir holds the npz checkpoint)
    main(["eval", "--mode", "cov", "--data-dir", dd, "--seeds", "5",
          "--pair-count", "4", "--pairfile", str(pairfile),
          "--steps", "5", "--num-t", "32"])
    cov_json = workdir / "experiment" / "plots" / "cov_values_alldec_4.json"
    assert cov_json.exists()


def _ensure_trained(workdir):
    """Prerequisites for stages past training — self-contained so tests
    survive selection/reordering (e.g. `pytest -k entropy` or xdist) instead
    of depending on test_full_cli_pipeline's side effects."""
    dd = str(workdir / "data")
    if not (workdir / "experiment" / "model_seed5.npz").exists():
        main(["train", "--data-dir", dd, "--epochs", "2", "--seed", "5",
              "--num-decoders", "3"])
    if not (workdir / "experiment" / "pairs" /
            "selected_pairs_4.json").exists():
        main(["select-pairs", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz", "--max-labels", "4"])


def test_cli_entropy_init(workdir):
    _ensure_trained(workdir)
    main(["init-splines", "--data-dir", str(workdir / "data"),
          "--model", "experiment/model_seed5.npz",
          "--pairfile", "experiment/pairs/selected_pairs_4.json",
          "--grid", "30", "--use-entropy"])
    assert (workdir / "experiment" / "splines_init_model_seed5" /
            "spline_batch_init_entropy_4.npz").exists()


def test_cli_unknown_command_errors():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_fast_preset_respects_explicit_flags():
    """--fast fills the measured recipe; flags the user passed explicitly
    win — including values that coincide with the reference defaults."""
    from vae_latent_geometry_tpu.cli import (
        FAST_PRESET,
        apply_fast_preset,
        build_parser,
        fill_optimize_flag_defaults,
    )

    p = build_parser()
    args = p.parse_args(["optimize", "--model", "m.pt", "--fast"])
    apply_fast_preset(args)
    for k, v in FAST_PRESET.items():
        assert getattr(args, k) == v

    args = p.parse_args(["optimize", "--model", "m.pt", "--fast",
                         "--steps", "400", "--traj-num-t", "1024"])
    apply_fast_preset(args)
    assert args.steps == 400
    assert args.traj_num_t == 1024
    assert args.lr_schedule == "cosine"      # untouched flags still filled
    assert args.polish_steps == 300

    # explicitly pinning a value equal to the reference default must stick
    # (the old default-sentinel check silently overrode it)
    args = p.parse_args(["optimize", "--model", "m.pt", "--fast",
                         "--lr", "1e-3", "--lr-schedule", "constant"])
    apply_fast_preset(args)
    assert args.lr == 1e-3
    assert args.lr_schedule == "constant"
    assert args.traj_num_t == 512            # unset flags still get the preset


def test_optimize_flags_without_fast_get_reference_defaults():
    """Without --fast/--turbo the None sentinels resolve to the reference
    semantics (1000 steps, lr 1e-3, constant schedule, no phases)."""
    from vae_latent_geometry_tpu.cli import (
        build_parser,
        fill_optimize_flag_defaults,
    )

    p = build_parser()
    args = p.parse_args(["optimize", "--model", "m.pt"])
    fill_optimize_flag_defaults(args)
    assert args.steps == 1000
    assert args.lr == 1e-3
    assert args.lr_schedule == "constant"
    assert args.traj_num_t is None
    assert args.polish_steps == 0
    assert args.polish_lr == 1e-3


def test_turbo_phase_plan_parses_and_expands():
    """--turbo maps to the measured two-phase ladder (TURBO_PHASES,
    full133_turbo_timing.json); _phase_cfgs expands it into per-phase
    configs with the ladder's steps/num_t/schedule/lr."""
    from vae_latent_geometry_tpu.cli import TURBO_PHASES, build_parser
    from vae_latent_geometry_tpu.config import GeodesicConfig
    from vae_latent_geometry_tpu.optim.geodesic import _phase_cfgs

    p = build_parser()
    args = p.parse_args(["optimize", "--model", "m.pt", "--turbo"])
    assert args.turbo

    cfg = GeodesicConfig(phase_plan=TURBO_PHASES)
    phases = _phase_cfgs(cfg)
    assert len(phases) == len(TURBO_PHASES) == 2
    for pcfg, (s, T, sched, lr) in zip(phases, TURBO_PHASES):
        assert pcfg.steps == s
        assert pcfg.energy.num_t == T
        assert pcfg.lr_schedule == sched
        assert pcfg.lr == lr
        assert pcfg.phase_plan is None      # no recursive expansion
    # the ladder ends at the full reference quadrature resolution
    assert TURBO_PHASES[-1][1] == cfg.energy.num_t == 2000


def test_turbo_flag_wires_phase_plan_through_cmd_optimize(workdir,
                                                          monkeypatch):
    """Regression guard on the actual CLI wiring: `optimize --turbo` must
    run the ladder (not the reference recipe).  Verified end-to-end on a
    tiny monkeypatched ladder via the recipe stamp the run writes into the
    artifact metadata."""
    from vae_latent_geometry_tpu import cli as cli_mod
    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    if not (workdir / "experiment" / "splines_init_model_seed5" /
            "spline_batch_init_euclidean_4.npz").exists():
        main(["init-splines", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--pairfile", "experiment/pairs/selected_pairs_4.json",
              "--grid", "30"])
    tiny = ((7, 16, "cosine", 3e-3), (3, 32, "constant", 1e-3))
    monkeypatch.setattr(cli_mod, "TURBO_PHASES", tiny)
    out = workdir / "turbo_out.npz"
    main(["optimize", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--batch-size", "4", "--num-t", "32", "--energy-mode", "expected",
          "--turbo", "--output", str(out)])
    art = load_spline_batch(str(out))
    assert '"phase_plan": [[7, 16, "cosine", 0.003]' in art.metadata["recipe"]
    # invalid pairs (unreachable Dijkstra inits) are NaN-masked by design
    assert np.isfinite(art.geodesic_length[art.valid]).all()


def test_coarse_bf16_flag_wires_through_cmd_optimize(workdir, monkeypatch):
    """`optimize --turbo --coarse-bf16` must swap the coarse phase's energy
    mode to the fused bf16 rung (measured full-scale rung,
    experiment/full133_bf16coarse_timing.json) while the polish phase and
    the exact final re-evaluation keep their modes; verified via the
    recipe stamp.  Without --turbo, or with a mode lacking a bf16 rung,
    the flag must refuse loudly."""
    from vae_latent_geometry_tpu import cli as cli_mod
    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    if not (workdir / "experiment" / "splines_init_model_seed5" /
            "spline_batch_init_euclidean_4.npz").exists():
        main(["init-splines", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--pairfile", "experiment/pairs/selected_pairs_4.json",
              "--grid", "30"])
    tiny = ((7, 16, "cosine", 3e-3), (3, 32, "constant", 1e-3))
    monkeypatch.setattr(cli_mod, "TURBO_PHASES", tiny)
    out = workdir / "bf16coarse_out.npz"
    main(["optimize", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--batch-size", "4", "--num-t", "32",
          "--energy-mode", "expected",
          "--turbo", "--coarse-bf16", "--output", str(out)])
    art = load_spline_batch(str(out))
    assert ('"phase_plan": [[7, 16, "cosine", 0.003, '
            '"expected_fused_bf16"]' in art.metadata["recipe"])
    assert np.isfinite(art.geodesic_length[art.valid]).all()

    with pytest.raises(SystemExit, match="requires --turbo"):
        main(["optimize", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--init-type", "euclidean", "--pair-count", "4",
              "--coarse-bf16", "--output", str(out)])
    with pytest.raises(SystemExit, match="bf16 rung"):
        main(["optimize", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--init-type", "euclidean", "--pair-count", "4",
              "--energy-mode", "single",
              "--turbo", "--coarse-bf16", "--output", str(out)])


def test_optimize_kernel_precision_flag_wires_through(workdir):
    """`optimize --kernel-precision` must reach EnergyConfig (trajectory
    rung selection): the default is the f32x2 bulk rung every committed
    full-scale timing artifact uses, and an explicit value lands in the
    recipe stamp the run writes into the artifact metadata."""
    from vae_latent_geometry_tpu.cli import build_parser

    p = build_parser()
    args = p.parse_args(["optimize", "--model", "m.pt"])
    assert args.kernel_precision == "f32x2"

    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    if not (workdir / "experiment" / "splines_init_model_seed5" /
            "spline_batch_init_euclidean_4.npz").exists():
        main(["init-splines", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--pairfile", "experiment/pairs/selected_pairs_4.json",
              "--grid", "30"])
    out = workdir / "prec_out.npz"
    main(["optimize", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--batch-size", "4", "--num-t", "32", "--steps", "3",
          "--energy-mode", "expected_fused",
          "--kernel-precision", "float32", "--output", str(out)])
    art = load_spline_batch(str(out))
    assert '"kernel_precision": "float32"' in art.metadata["recipe"]
    assert np.isfinite(art.geodesic_length[art.valid]).all()


def test_optimize_batch_size_scales_with_dp():
    """Default chunk size keeps 200 pairs PER dp device (the dp-slice
    projection's operating point); an explicit --batch-size always wins."""
    from vae_latent_geometry_tpu.cli import build_parser, resolve_batch_size

    assert resolve_batch_size(None, None) == 200
    assert resolve_batch_size(None, 8) == 1600
    assert resolve_batch_size(500, 8) == 500
    p = build_parser()
    args = p.parse_args(["optimize", "--model", "m.pt"])
    assert args.batch_size is None  # sentinel: resolved inside cmd_optimize


def test_cli_cov_with_mesh(workdir):
    """eval --mode cov --dp runs the CoV grid through the sharded optimizer
    and produces the same JSON artifact schema."""
    import json

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    main(["eval", "--mode", "cov", "--data-dir", dd, "--seeds", "5",
          "--pair-count", "4",
          "--pairfile", "experiment/pairs/selected_pairs_4.json",
          "--steps", "5", "--num-t", "32", "--energy-mode", "expected",
          "--dp", "4"])
    cov_json = workdir / "experiment" / "plots" / "cov_values_alldec_4.json"
    vals = json.loads(cov_json.read_text())
    assert all(np.isfinite(v) for v in vals["avg_cov_geodesic"].values())


def test_cli_cov_expected_fused(workdir):
    """eval --mode cov accepts the fused production estimator (and its
    precision flag) — the fastest kernel must be reachable from the CLI CoV
    path, not only from cov_analysis directly (round-3 verdict weak #5)."""
    import json

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    main(["eval", "--mode", "cov", "--data-dir", dd, "--seeds", "5",
          "--pair-count", "4",
          "--pairfile", "experiment/pairs/selected_pairs_4.json",
          "--steps", "5", "--num-t", "32",
          "--energy-mode", "expected_fused",
          "--kernel-precision", "float32"])
    cov_json = workdir / "experiment" / "plots" / "cov_values_alldec_4.json"
    vals = json.loads(cov_json.read_text())
    assert all(np.isfinite(v) for v in vals["avg_cov_geodesic"].values())


def test_cli_backstop_fixed_merges_per_pair_best(workdir, monkeypatch):
    """optimize --turbo --backstop-fixed: the written artifact carries the
    per-pair min of the ladder arm and the fixed-recipe arm, plus the
    backstop bookkeeping in metadata."""
    from vae_latent_geometry_tpu import cli as cli_mod
    from vae_latent_geometry_tpu.io.artifacts import load_spline_batch

    _ensure_trained(workdir)
    dd = str(workdir / "data")
    if not (workdir / "experiment" / "splines_init_model_seed5" /
            "spline_batch_init_euclidean_4.npz").exists():
        main(["init-splines", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--pairfile", "experiment/pairs/selected_pairs_4.json",
              "--grid", "30"])
    tiny = ((7, 16, "cosine", 3e-3), (3, 32, "constant", 1e-3))
    monkeypatch.setattr(cli_mod, "TURBO_PHASES", tiny)
    out = workdir / "backstop_out.npz"
    main(["optimize", "--data-dir", dd,
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--batch-size", "4", "--num-t", "32", "--energy-mode", "expected",
          "--steps", "9",  # fixed arm's 1000 steps are a CLI constant; the
                           # primary ladder is the monkeypatched tiny one
          "--turbo", "--backstop-fixed", "--output", str(out)])
    merged = load_spline_batch(str(out))
    p = load_spline_batch(str(workdir / "backstop_out.primary.npz"))
    b = load_spline_batch(str(workdir / "backstop_out.backstop.npz"))
    lm = np.asarray(merged.geodesic_length)
    lp = np.asarray(p.geodesic_length)
    lb = np.asarray(b.geodesic_length)
    v = merged.valid & np.isfinite(lp) & np.isfinite(lb)
    np.testing.assert_allclose(lm[v], np.minimum(lp, lb)[v], rtol=1e-7)
    assert "backstop_selected" in merged.metadata


def _ensure_optimized(workdir):
    """An optimized 4-pair artifact for eval-stage tests (self-contained)."""
    _ensure_trained(workdir)
    dd = str(workdir / "data")
    opt_path = (workdir / "experiment" / "splines_opt_model_seed5" /
                "spline_batch_opt_euclidean_4.npz")
    if not opt_path.exists():
        if not (workdir / "experiment" / "splines_init_model_seed5" /
                "spline_batch_init_euclidean_4.npz").exists():
            main(["init-splines", "--data-dir", dd,
                  "--model", "experiment/model_seed5.npz",
                  "--pairfile", "experiment/pairs/selected_pairs_4.json",
                  "--grid", "30"])
        main(["optimize", "--data-dir", dd,
              "--model", "experiment/model_seed5.npz",
              "--init-type", "euclidean", "--pair-count", "4",
              "--steps", "15", "--num-t", "48", "--energy-mode", "expected"])
    return opt_path


def test_eval_matrix_output_flag(workdir):
    """eval --output redirects the matrix JSON (and its heatmap) anywhere,
    instead of the hardwired experiment/plots/ convention."""
    opt_path = _ensure_optimized(workdir)
    out = workdir / "custom" / "nested" / "my_matrix.json"
    main(["eval", "--mode", "matrix", "--seed", "5",
          "--init-type", "euclidean", "--pair-count", "4",
          "--splines", str(opt_path), "--output", str(out)])
    assert out.exists()
    m = json.loads(out.read_text())
    assert len(m["distance_matrix"]) == 4
    assert out.with_suffix(".png").exists()


def test_stability_rejects_binary_artifact(workdir, capsys):
    """Feeding a spline .npz where a JSON is expected must produce a clear
    one-line error naming the expected artifact kind, not a raw
    UnicodeDecodeError traceback."""
    opt_path = _ensure_optimized(workdir)
    pairfile = workdir / "experiment" / "pairs" / "selected_pairs_4.json"
    with pytest.raises(SystemExit) as e:
        main(["stability", "pairs", "--a", str(opt_path),
              "--b", str(pairfile)])
    msg = str(e.value.code)
    assert "selected-pairs JSONs" in msg and str(opt_path) in msg


def test_stability_pairs_and_frobenius_happy_paths(workdir):
    opt_path = _ensure_optimized(workdir)
    pairfile = str(workdir / "experiment" / "pairs" / "selected_pairs_4.json")
    with pytest.raises(SystemExit) as e:
        main(["stability", "pairs", "--a", pairfile, "--b", pairfile])
    assert e.value.code == 0
    mat = workdir / "experiment" / "plots" / "geodesic_matrix_seed5_euclidean_4.json"
    if not mat.exists():
        main(["eval", "--mode", "matrix", "--seed", "5",
              "--init-type", "euclidean", "--pair-count", "4",
              "--splines", str(opt_path)])
    main(["stability", "frobenius", "--a", str(mat), "--b", str(mat)])


def test_optimize_missing_init_hints_sibling_init_type(workdir):
    """All-defaults flow inherits the reference's init-type skew
    (init writes euclidean-named artifacts, optimize defaults entropy,
    src/optimize.py:226): when the entropy artifact is missing but the
    euclidean sibling exists, the error must say to pass
    --init-type euclidean instead of a FileNotFoundError traceback."""
    _ensure_optimized(workdir)  # guarantees the euclidean init artifact
    # establish the test's own precondition: the entropy artifact must be
    # MISSING, but test_cli_entropy_init (same module-scoped workdir)
    # creates it when the whole file runs in order
    entropy_art = (workdir / "experiment" / "splines_init_model_seed5" /
                   "spline_batch_init_entropy_4.npz")
    if entropy_art.exists():
        entropy_art.unlink()
    with pytest.raises(SystemExit) as e:
        main(["optimize", "--data-dir", str(workdir / "data"),
              "--model", "experiment/model_seed5.npz",
              "--pair-count", "4"])  # --init-type defaults to entropy
    msg = str(e.value.code)
    assert "--init-type euclidean" in msg and "entropy" in msg


def test_optimize_ep_only_batch_size_uses_derived_dp(workdir, capsys):
    """--ep alone derives dp = n_devices // ep inside make_mesh; the
    default batch size must be 200 x that derived dp, not 200 total
    (code-review r5: ep-only runs silently got 200/dp per device)."""
    opt_path = _ensure_optimized(workdir)  # noqa: F841 (init artifact dep)
    main(["optimize", "--data-dir", str(workdir / "data"),
          "--model", "experiment/model_seed5.npz",
          "--init-type", "euclidean", "--pair-count", "4",
          "--steps", "3", "--num-t", "32", "--energy-mode", "expected",
          "--ep", "2",  # 8 virtual devices -> derived dp = 4
          "--output", str(workdir / "ep_only_out.npz")])
    out = capsys.readouterr().out
    assert "mesh {'dp': 4, 'ep': 2}" in out
    assert "scaled to 800 (200 per dp device)" in out


def test_plot_uncertainty_rejects_single_vae(workdir):
    dd = str(workdir / "data")
    if not (workdir / "vae_best_seed3.npz").exists():
        main(["train-single", "--data-dir", dd, "--epochs", "2",
              "--seed", "3", "--save-dir", str(workdir)])
    with pytest.raises(SystemExit) as e:
        main(["plot", "uncertainty", "--data-dir", dd,
              "--model", str(workdir / "vae_best_seed3.npz"),
              "--resolution", "20"])
    assert "EVAE" in str(e.value.code)


def test_empty_reference_blob_raises_clearly():
    from vae_latent_geometry_tpu.io.artifacts import from_reference_blob

    with pytest.raises(ValueError, match="empty 'spline_data'"):
        from_reference_blob({"spline_data": [], "representatives": None,
                             "pairs": None})
