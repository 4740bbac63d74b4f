"""

HISTORICAL NOTE (round 2): the ms/call numbers recorded from this script
predate the MXU precision ladder; they were measured on 1-pass bf16-rounded
arithmetic (docs/NUMERICS.md) and are kept only as relative layout
comparisons, not absolute throughputs.
One-off fwd-kernel variant timing for the sampled MC energy.


Variants (fwd only, B=200 single block, identical arithmetic semantics
except V1 which drops selection to bound its cost):
  v0      current design: (Tc,B) index slices, mask[:, :, None] FMAs
  v1      selection removed (los += x) — lower-bounds the select cost
  v2      indices passed as (S, T, B, 1): masks born in the 3D layout, so
          the lane-broadcast multiply needs no 2D->3D relayout
  v3      v0 with target_rows=8192 (Tc=40, fewer chunk iterations)

Writes one line per variant; results inform the production kernel design.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from vae_latent_geometry_tpu.models.torch_import import load_evae_checkpoint
from vae_latent_geometry_tpu.ops.energy_pallas import (
    _compiler_params,
    _first_layer,
    _pick_chunk,
    _stack_weights,
    _tail_layers,
)

B, T, M, S, X, CALLS = 200, 2000, 10, 2, 50, 60


def make_kernel(variant, Tc, n_layers):
    def kernel(*refs, idx3d):
        D = 2
        g_refs = refs[:D]
        d1_ref, d2_ref = refs[D], refs[D + 1]
        w_refs = refs[D + 2:D + 2 + n_layers]
        b_refs = refs[D + 2 + n_layers:D + 2 + 2 * n_layers]
        out_ref = refs[D + 2 + 2 * n_layers]
        lo_ext = refs[D + 2 + 2 * n_layers + 1]
        seg_ref = refs[D + 2 + 2 * n_layers + 2]

        ws = [w_refs[i][:] for i in range(n_layers)]
        bs = [b_refs[i][:] for i in range(n_layers)]
        n_chunks = T // Tc

        out_ref[:] = jnp.zeros_like(out_ref)
        for s in range(S):
            lo_ext[s, pl.ds(0, 8), :, :] = jnp.zeros((8, B, X), jnp.float32)

        def body(c, _):
            start = pl.multiple_of(c * Tc, 8)
            g_planes = [g_refs[d][pl.ds(start, Tc), :] for d in range(D)]
            if idx3d:
                m1s = [d1_ref[s, pl.ds(start, Tc), :, :] for s in range(S)]
                m2s = [d2_ref[s, pl.ds(start, Tc), :, :] for s in range(S)]
            else:
                m1s = [d1_ref[s, pl.ds(start, Tc), :] for s in range(S)]
                m2s = [d2_ref[s, pl.ds(start, Tc), :] for s in range(S)]
            los = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
            his = [jnp.zeros((Tc, B, X), jnp.float32) for _ in range(S)]
            for m in range(M):
                h1 = _first_layer(g_planes, ws[0][m], bs[0][m], jnp.float32)
                x = _tail_layers(h1, ws, bs, m, "float32").reshape(Tc, B, X)
                for s in range(S):
                    if variant == "v1":
                        los[s] = los[s] + x
                        his[s] = his[s] + x
                    elif idx3d:
                        w1 = (m1s[s] == m).astype(jnp.float32)
                        w2 = (m2s[s] == m).astype(jnp.float32)
                        los[s] = los[s] + w1 * x
                        his[s] = his[s] + w2 * x
                    else:
                        w1 = (m1s[s] == m).astype(jnp.float32)[:, :, None]
                        w2 = (m2s[s] == m).astype(jnp.float32)[:, :, None]
                        los[s] = los[s] + w1 * x
                        his[s] = his[s] + w2 * x

            first_w = jnp.where(c == 0, 0.0, 1.0)
            seg_total = jnp.zeros((Tc, B), jnp.float32)
            for s in range(S):
                lo_ext[s, pl.ds(8, Tc), :, :] = los[s]
                le = lo_ext[s, :, :, :]
                diff = his[s] - le[7:7 + Tc]
                seg_total = seg_total + jnp.sum(diff * diff, axis=-1)
            seg_ref[:, :] = seg_total
            seg = seg_ref[:]
            out_ref[0, :] = out_ref[0, :] + jnp.sum(seg[1:], axis=0) \
                + seg[0] * first_w
            for s in range(S):
                lo_ext[s, 7, :, :] = lo_ext[s, 7 + Tc, :, :]
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


def build(variant, ws, bs):
    target = 8192 if variant == "v3" else 4096
    Tc = _pick_chunk(T, B, target_rows=target)
    idx3d = variant == "v2"
    n_layers = len(ws)
    kernel = functools.partial(make_kernel(variant, Tc, n_layers), idx3d=idx3d)
    idx_shape = (S, T, B, 1) if idx3d else (S, T, B)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + 2 + 2 * n_layers),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, Tc + 8, B, X), jnp.float32),
            pltpu.VMEM((Tc, B), jnp.float32),
        ],
        compiler_params=_compiler_params(),
    ), idx_shape, Tc


def main():
    params = load_evae_checkpoint("/root/reference/experiment/model_seed12.pt")
    ws, bs = _stack_weights(params.decoders)
    rng = np.random.default_rng(0)
    gamma = jnp.asarray(rng.normal(size=(T, B, 2)) * 1.5, jnp.float32)
    g_planes = [gamma[:, :, d] for d in range(2)]
    d1 = jnp.asarray(rng.integers(0, M, size=(S, T, B)), jnp.int32)
    d2 = jnp.asarray(rng.integers(0, M, size=(S, T, B)), jnp.int32)

    ref_val = None
    for variant in (sys.argv[1:] or ["v0", "v1", "v2", "v3"]):
        call, idx_shape, Tc = build(variant, ws, bs)
        dd1 = d1.reshape(idx_shape)
        dd2 = d2.reshape(idx_shape)

        @jax.jit
        def many(g0, g1):
            # per-iteration perturbation defeats loop-invariant code motion
            # (a constant body lets XLA hoist the kernel out of the scan)
            eps = jnp.arange(CALLS, dtype="float32") * 1e-12

            def body(acc, e):
                return acc + jnp.sum(call(g0 + e, g1, dd1, dd2, *ws, *bs)), None
            s, _ = jax.lax.scan(body, 0.0, eps)
            return s

        try:
            t0 = time.perf_counter()
            v = float(many(*g_planes))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(many(*g_planes))
            dt = (time.perf_counter() - t0) / CALLS
        except Exception as ex:
            print(f"[{variant}] FAILED: {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            continue
        if variant == "v0":
            ref_val = v
        ok = "" if ref_val is None or variant == "v1" else \
            f" match_v0={abs(v - ref_val) < abs(ref_val) * 1e-4}"
        print(f"[{variant}] Tc={Tc} {1000 * dt:.2f} ms/call "
              f"(compile {compile_s:.0f}s){ok}", flush=True)


if __name__ == "__main__":
    main()
