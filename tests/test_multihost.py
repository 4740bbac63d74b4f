"""Multi-host e2e: the package pipeline over a 2-process virtual-CPU
cluster (round-3 verdict item 3: multi-host must be a first-class package
path with a suite test, not an experiment script).

Spawns two coordinator-linked processes (4 virtual CPU devices each, 8
global), which run ``init_multihost`` + ``optimize_spline_batch`` over a
(dp=4, ep=2) mesh spanning BOTH processes — genuinely non-addressable
shards, so collectives cross the process boundary (the DCN codepath).
Asserts:

- both processes return identical results,
- the results match a single-process (no-mesh) run of the same problem,
- the checkpoint artifact is written by process 0 only (write discipline),
- ``is_primary`` reports correctly on both sides.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    """OS-assigned ephemeral port: a fixed constant collides under parallel
    pytest runs or a lingering TIME_WAIT listener from a killed worker."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]

_WORKER = r"""
import json, os, sys
import numpy as np

sys.path.insert(0, os.environ["VLG_TEST_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from vae_latent_geometry_tpu.parallel.multihost import (
    init_multihost, is_primary, is_multiprocess)

pid = int(os.environ["VLG_PROCESS_ID"])      # exercised env autodetection
init_multihost()
assert jax.process_count() == 2, jax.process_count()
assert is_multiprocess()
assert is_primary() == (pid == 0)

import jax.numpy as jnp
from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import stack_decoders, EVAEParams
from vae_latent_geometry_tpu.pipeline.optimize_stage import optimize_spline_batch
from vae_latent_geometry_tpu.parallel.mesh import make_mesh

out_dir = os.environ["VLG_TEST_OUT"]
rng = np.random.default_rng(7)
B = 8
basis, _ = nullspace_basis(4)
decoders = stack_decoders([
    nets.decoder_init(k, 2, 12, (16, 16))
    for k in jax.random.split(jax.random.PRNGKey(3), 4)
])
art = SplineBatchArtifact(
    a=rng.normal(size=(B, 2)).astype(np.float32),
    b=rng.normal(size=(B, 2)).astype(np.float32),
    omega_init=np.zeros((B, 5, 2), np.float32),
    basis=np.asarray(basis, np.float32),
    n_poly=4,
    pair_indices=np.stack([np.arange(B), np.arange(B) + B], 1),
    pair_labels=[["a", "b"]] * B,
    representatives=[],
    valid=np.ones(B, bool),
)
cfg = GeodesicConfig(steps=4, batch_size=B,
                     energy=EnergyConfig(num_t=32, mode="expected_fused"))
mesh = make_mesh(dp=4, ep=2)
ckpt = os.path.join(out_dir, "mh_opt.npz")


class FakeParams:
    decoders = decoders


res = optimize_spline_batch(FakeParams(), art, cfg=cfg, mesh=mesh,
                            checkpoint_path=ckpt, log_every_chunk=False)
np.save(os.path.join(out_dir, f"lengths_p{pid}.npy"),
        np.asarray(res.geodesic_length))
np.save(os.path.join(out_dir, f"omega_p{pid}.npy"),
        np.asarray(res.omega_optimized))
if pid == 1:
    # non-primary must not have written the checkpoint; existence here can
    # only come from process 0 (timing-tolerant: just record our primary
    # status — the parent asserts the file exists after both exit)
    with open(os.path.join(out_dir, "p1_done.json"), "w") as f:
        json.dump({"is_primary": is_primary()}, f)
print("WORKER_OK", pid)
"""


def test_multihost_optimize_e2e(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["VLG_TEST_REPO"] = REPO
    env["VLG_TEST_OUT"] = str(tmp_path)
    env["VLG_COORDINATOR"] = f"localhost:{_free_port()}"
    env["VLG_NUM_PROCESSES"] = str(N_PROC)

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    logs = [open(tmp_path / f"worker{i}.log", "w+") for i in range(N_PROC)]
    procs = []
    for i in range(N_PROC):
        e = dict(env, VLG_PROCESS_ID=str(i))
        # output to files, not pipes: the workers are coupled through
        # collectives — one blocking on a full pipe deadlocks the group
        procs.append(subprocess.Popen([sys.executable, str(worker_py)],
                                      env=e, cwd=REPO, stdout=logs[i],
                                      stderr=subprocess.STDOUT, text=True))
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    tails = []
    for f in logs:
        f.flush()
        f.seek(0)
        tails.append(f.read()[-2000:])
        f.close()
    rcs = [p.returncode for p in procs]
    assert rcs == [0, 0], f"worker rcs={rcs}\n" + "\n---\n".join(tails)

    l0 = np.load(tmp_path / "lengths_p0.npy")
    l1 = np.load(tmp_path / "lengths_p1.npy")
    om0 = np.load(tmp_path / "omega_p0.npy")
    om1 = np.load(tmp_path / "omega_p1.npy")
    # both processes saw identical global results
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(om0, om1)
    assert np.isfinite(l0).all() and (l0 > 0).all()
    # write discipline: the checkpoint artifact exists (process 0 wrote it)
    assert (tmp_path / "mh_opt.npz").exists()
    assert json.loads((tmp_path / "p1_done.json").read_text()) == {
        "is_primary": False}

    # cross-check against a single-process run of the identical problem in
    # THIS process (same seeds, no mesh)
    import jax

    from vae_latent_geometry_tpu.config import EnergyConfig, GeodesicConfig
    from vae_latent_geometry_tpu.geometry.basis import nullspace_basis
    from vae_latent_geometry_tpu.io.artifacts import SplineBatchArtifact
    from vae_latent_geometry_tpu.models import nets
    from vae_latent_geometry_tpu.models.evae import stack_decoders
    from vae_latent_geometry_tpu.pipeline.optimize_stage import (
        optimize_spline_batch,
    )

    rng = np.random.default_rng(7)
    B = 8
    basis, _ = nullspace_basis(4)
    decoders = stack_decoders([
        nets.decoder_init(k, 2, 12, (16, 16))
        for k in jax.random.split(jax.random.PRNGKey(3), 4)
    ])
    art = SplineBatchArtifact(
        a=rng.normal(size=(B, 2)).astype(np.float32),
        b=rng.normal(size=(B, 2)).astype(np.float32),
        omega_init=np.zeros((B, 5, 2), np.float32),
        basis=np.asarray(basis, np.float32),
        n_poly=4,
        pair_indices=np.stack([np.arange(B), np.arange(B) + B], 1),
        pair_labels=[["a", "b"]] * B,
        representatives=[],
        valid=np.ones(B, bool),
    )

    class FakeParams:
        pass

    FakeParams.decoders = decoders
    cfg = GeodesicConfig(steps=4, batch_size=B,
                         energy=EnergyConfig(num_t=32, mode="expected"))
    ref = optimize_spline_batch(FakeParams(), art, cfg=cfg,
                                log_every_chunk=False)
    # dp=4 x ep=2 sharded-vs-single agreement: same optimization, modulo
    # fused-kernel (interpret) vs XLA accumulation order
    np.testing.assert_allclose(l0, np.asarray(ref.geodesic_length),
                               rtol=2e-4)


def test_init_multihost_explicit_request_failure_raises(monkeypatch):
    """An explicit multi-process request (a named coordinator or a process
    count > 1) that fails to initialize must raise, not silently degrade to
    a second single-process 'primary' that races process 0's artifact
    writes.  Only the no-argument autodetect path may fall back."""
    import jax
    import pytest

    from vae_latent_geometry_tpu.parallel.multihost import init_multihost

    for var in ("VLG_COORDINATOR", "VLG_NUM_PROCESSES", "VLG_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)

    def boom(*a, **k):
        raise RuntimeError("no cluster")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="no cluster"):
        init_multihost("localhost:1", None, 1)
    with pytest.raises(RuntimeError, match="no cluster"):
        init_multihost(None, 2, 0)
    with pytest.warns(UserWarning, match="multihost init skipped"):
        pid, n = init_multihost()
    assert (pid, n) == (jax.process_index(), jax.process_count())
