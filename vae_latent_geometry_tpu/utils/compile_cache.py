"""Persistent XLA compilation cache for CLI invocations.

The pipeline is driven as separate process invocations per stage (the
reference's model: one ``python -m src.<script>`` per stage, SURVEY §1), so
without a persistent cache every invocation re-pays 20-40 s of XLA
compilation for programs that are byte-identical across runs (the scan-jitted
optimizer phases, the fused kernels, the trainer blocks).  ``bench.py`` and
``experiment/regenerate.py`` have always enabled the cache; this wires the
same behavior into the user-facing CLI so a fresh ``optimize`` invocation
loads its executables from disk instead of recompiling.

Environment contract:
  VLG_COMPILE_CACHE=<dir>   override the cache directory
  VLG_NO_COMPILE_CACHE=1    disable entirely (e.g. for compile-time studies)

The default directory is ``~/.cache/vae_latent_geometry_tpu/jax`` — per-user,
shared across working directories.  JAX's persistent cache writes entries
atomically (temp file + rename), so concurrent multi-host processes sharing
the directory are safe; each process simply recompiles on a miss.
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the directory in use, or None if disabled via
    ``VLG_NO_COMPILE_CACHE``.  Must be called before the first compilation
    to benefit that compilation (calling later is harmless).
    """
    # the kill switch trips on ANY value except explicit falsy ones: users
    # who exported =on / =y / =2 must stay disabled, while =0 / =false
    # (which read as "do not disable") must NOT silently disable the cache
    if os.environ.get("VLG_NO_COMPILE_CACHE", "").lower() not in (
            "", "0", "false", "no"):
        return None
    if cache_dir is None:
        cache_dir = os.environ.get("VLG_COMPILE_CACHE") or os.path.join(
            os.path.expanduser("~"), ".cache", "vae_latent_geometry_tpu", "jax"
        )
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Lower the default 1 s min-compile-time threshold to 0.5 s: the
    # pipeline launches many small programs (final re-evaluation, encoder
    # passes) whose compile times add up across stages.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
