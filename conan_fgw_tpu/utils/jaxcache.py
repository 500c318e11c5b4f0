"""Persistent XLA compilation cache.

Compiling the jitted train/eval steps over a tunneled TPU costs minutes per
program; the two-stage N-run protocol re-traces identical programs in every
process (`make_step_fns` builds fresh jits per run). A persistent on-disk
cache turns every re-run into a cache hit. The reference has no analog (its
torch eager path never compiles); this is TPU-runtime infrastructure.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("conan_fgw_tpu")

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "conan_fgw_tpu", "jax_cache"
)


def enable_compilation_cache(directory: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Directory resolution: explicit arg > ``CONAN_FGW_TPU_JAX_CACHE`` env
    (empty string disables) > ``~/.cache/conan_fgw_tpu/jax_cache``.
    Returns the cache dir, or None when disabled/unavailable.
    """
    env = os.environ.get("CONAN_FGW_TPU_JAX_CACHE")
    if directory is None:
        if env == "":
            return None
        directory = env or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        # tunneled-TPU compiles are worth caching even when quick
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - older jax without the flags
        log.warning("compilation cache unavailable: %s", e)
        return None
    return directory
