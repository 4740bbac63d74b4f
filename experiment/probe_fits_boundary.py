"""Hardware probe: fused_fits boundary approvals must compile AND run.
Approved boundaries: expected M=16 B=200, mc M=16 B=200, expected M=10 B=256.
Compares fused forward to the XLA closed form for correctness."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from vae_latent_geometry_tpu.models import nets
from vae_latent_geometry_tpu.models.evae import stack_decoders
from vae_latent_geometry_tpu.ops.energy_pallas import energy_expected_fused, fused_fits
from vae_latent_geometry_tpu.ops.energy_mc_pallas import energy_mc_fused_rng
from vae_latent_geometry_tpu.geometry import energy as E

jax.device_put(np.zeros(8)).block_until_ready()
results = {}

def mkdec(M, key):
    ks = jax.random.split(key, M)
    return stack_decoders([nets.decoder_init(k, 2, 50, (128, 128)) for k in ks])

def probe_expected(M, B, tag):
    assert fused_fits(2000, B, 2, 50, M, mc=False), f"{tag}: guard rejects"
    dec = mkdec(M, jax.random.PRNGKey(M * 1000 + B))
    g = jax.random.normal(jax.random.PRNGKey(7), (2000, B, 2), jnp.float32) * 0.5
    f = jax.jit(lambda d, x: energy_expected_fused(d, x, None, "float32"))
    t0 = time.time()
    e = f(dec, g).block_until_ready()
    t_f = time.time() - t0
    gfn = jax.jit(jax.grad(lambda d, x: jnp.sum(energy_expected_fused(d, x, None, "float32")), argnums=1))
    t0 = time.time()
    gr = gfn(dec, g).block_until_ready()
    t_b = time.time() - t0
    ref = jax.jit(lambda d, x: E.energy_expected(d, x, None))(dec, g)
    rel = float(jnp.max(jnp.abs(e - ref) / (jnp.abs(ref) + 1e-9)))
    assert np.isfinite(np.asarray(e)).all() and np.isfinite(np.asarray(gr)).all()
    results[tag] = {"fwd_compile_run_s": round(t_f, 1), "bwd_compile_run_s": round(t_b, 1),
                    "max_rel_vs_xla_fwd": rel}
    print(tag, results[tag], flush=True)

def probe_mc(M, B, tag):
    assert fused_fits(2000, B, 2, 50, M, mc=True), f"{tag}: guard rejects"
    dec = mkdec(M, jax.random.PRNGKey(M * 2000 + B))
    g = jax.random.normal(jax.random.PRNGKey(9), (2000, B, 2), jnp.float32) * 0.5
    kmax = jnp.full((B,), float(M))
    f = jax.jit(lambda d, x: energy_mc_fused_rng(d, x, 3, kmax, 2, "float32"))
    t0 = time.time()
    e = f(dec, g).block_until_ready()
    t_f = time.time() - t0
    gfn = jax.jit(jax.grad(lambda d, x: jnp.sum(energy_mc_fused_rng(d, x, 3, kmax, 2, "float32")), argnums=1))
    t0 = time.time()
    gr = gfn(dec, g).block_until_ready()
    t_b = time.time() - t0
    assert np.isfinite(np.asarray(e)).all() and np.isfinite(np.asarray(gr)).all()
    results[tag] = {"fwd_compile_run_s": round(t_f, 1), "bwd_compile_run_s": round(t_b, 1)}
    print(tag, results[tag], flush=True)

probe_expected(16, 200, "expected_M16_B200")
probe_expected(10, 256, "expected_M10_B256")
probe_mc(16, 200, "mc_M16_B200")
json.dump({"note": "fused_fits boundary shapes: the _FITS_BUDGET=72MB screen's "
                   "approved edges compile and run on the v5e (float32 rung; "
                   "forward checked against the XLA closed form)",
           "probes": results},
          open("/root/repo/experiment/fits_boundary_probe.json", "w"), indent=2)
print("ALL BOUNDARY PROBES PASS", flush=True)
