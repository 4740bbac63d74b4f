"""Measure the CLI persistent-compile-cache benefit (cold vs warm vs off).

The pipeline runs as one process per stage (reference model: one
``python -m src.<script>`` per stage), so every fresh ``optimize``
invocation used to pay full XLA compilation of the scan-jitted phase
programs.  ``cli.main`` now enables JAX's persistent compilation cache
(utils/compile_cache.py); this script quantifies the effect on a real
invocation: the turbo recipe on the committed 45-pair seed-12 euclidean
init blob, single chip.

Three timed subprocess invocations of the identical command:
  off   VLG_NO_COMPILE_CACHE=1          (pre-change behavior)
  cold  fresh cache dir                 (compile + write entries)
  warm  same cache dir                  (load executables from disk)

Writes experiment/compile_cache_timing.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT_BLOB = ("/root/reference/experiment/splines_init_model_seed12/"
             "spline_batch_init_euclidean_10.pt")
MODEL = "/root/reference/experiment/model_seed12.pt"


def run_once(workdir: str, env_extra: dict) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    cmd = [sys.executable, "-m", "vae_latent_geometry_tpu", "optimize",
           "--model", MODEL, "--splines", INIT_BLOB,
           "--init-type", "euclidean", "--pair-count", "10",
           "--turbo", "--no-euclidean",
           "--output", os.path.join(workdir, "out.npz")]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, cwd=workdir, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.perf_counter() - t0


def main() -> None:
    work = tempfile.mkdtemp(prefix="vlg_cctest_")
    cache = os.path.join(work, "jax_cache")
    results = {}
    try:
        results["off_s"] = round(run_once(work, {"VLG_NO_COMPILE_CACHE": "1"}), 1)
        results["cold_s"] = round(run_once(work, {"VLG_COMPILE_CACHE": cache}), 1)
        n_entries = len(os.listdir(cache)) if os.path.isdir(cache) else 0
        results["warm_s"] = round(run_once(work, {"VLG_COMPILE_CACHE": cache}), 1)
        results["cache_entries_after_cold"] = n_entries
        results["compile_s_saved_warm_vs_off"] = round(
            results["off_s"] - results["warm_s"], 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out = {
        "workload": ("CLI `optimize --turbo` on the committed 45-pair "
                     "seed-12 euclidean init blob, single chip; fresh "
                     "subprocess per invocation"),
        "note": ("off = pre-change CLI behavior (no persistent cache); "
                 "cold = first run against an empty cache dir (compiles + "
                 "persists); warm = second run, executables loaded from "
                 "disk.  Every committed full-scale *_timing.json was "
                 "measured through experiment/regenerate.py which always "
                 "enabled the cache, so those numbers are 'warm' semantics "
                 "already — this change brings plain CLI users to the same "
                 "point.  CAVEAT on this rig: the tunneled backend "
                 "remote-compiles, and the compile server briefly reuses "
                 "recently-compiled programs — so a 'cold' run launched "
                 "right after 'off' can hit that short-lived server-side "
                 "reuse and come in near-warm (observed both 18.6 s and "
                 "14.7 s); 'off' itself varied 236-522 s across two "
                 "measurements of the identical command (remote-compiler "
                 "queueing).  The robust comparison is warm-vs-off: "
                 "minutes of compile per fresh process without the "
                 "persistent cache, ~11-15 s end-to-end with it."),
        **results,
    }
    path = os.path.join(REPO, "experiment", "compile_cache_timing.json")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=2)
    os.replace(tmp, path)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
