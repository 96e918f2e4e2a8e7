"""Persistent XLA compilation cache wiring.

Deep-scan pipeline compiles cost tens of seconds on a local TPU and
minutes over a remote dev tunnel; every CLI invocation, bench run, and
hardware-check tool re-pays them for identical graphs. JAX's persistent
compilation cache keys on (HLO, compile options, platform version), so an
on-disk cache turns those into sub-second loads. The reference has no
analog (CUDA kernels are AOT-compiled into the binary; its one runtime
compile is the cuFFT plan, /root/reference/src/analytic_fft.cu:23).

Opt out with MSK144_TPU_JAX_CACHE=0; point elsewhere with
MSK144_TPU_JAX_CACHE=/path or JAX's own JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Enable the on-disk compilation cache (idempotent). Returns the cache
    dir, or None when disabled. Call before the first jit compilation."""
    env = os.environ.get("MSK144_TPU_JAX_CACHE", "")
    if env == "0":
        return None

    import jax

    # explicit JAX-level configuration wins
    if jax.config.jax_compilation_cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"):
        return jax.config.jax_compilation_cache_dir

    path = env or os.path.join(
        os.path.expanduser("~"), ".cache", "msk144tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every graph: the pipeline's many small helper jits add up
        # on a high-latency link, and disk is cheap
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except (OSError, AttributeError):  # read-only FS / very old jax
        return None
    return path
