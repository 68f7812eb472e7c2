"""Process-wide JAX runtime setup, applied once at package import.

Two concerns every entrypoint (server, CLI benchmarks, tests, SDK-side
embedding) shares:

1. Backend pinning. The deployment environment pins ``JAX_PLATFORMS`` at
   the plugin level and IGNORES env overrides, so ``VDB_FORCE_CPU=1`` is
   honored here via ``jax.config`` (the only override that works). The
   reference had no equivalent switch — it was single-backend
   (mlx.core.metal, main.py:75).

2. Persistent compilation cache. Device compiles for the large fused
   programs cost seconds to minutes (and go through a remote compile
   service on tunneled TPUs); serializing executables to disk makes
   restarts and repeat CLI runs hit warm programs. Controlled by
   ``VDB_COMPILE_CACHE`` (path, default ``~/.cache/tpu_vector_db/xla``;
   set to ``off`` to disable). Backends that cannot serialize executables
   simply skip the cache — enabling it is always safe.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_done = False


def setup_runtime() -> None:
    """Idempotent; called from tpu_vector_db/__init__."""
    global _done
    if _done:
        return
    _done = True
    import jax

    if os.environ.get("VDB_FORCE_CPU"):
        # env JAX_PLATFORMS is hijacked by the platform plugin; only the
        # config API actually switches backends
        jax.config.update("jax_platforms", "cpu")

    cache = os.environ.get("VDB_COMPILE_CACHE", "")
    if cache.lower() in ("off", "0", "false"):
        return
    path = Path(cache or "~/.cache/tpu_vector_db/xla").expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache everything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        logger.debug("compilation cache unavailable", exc_info=True)
