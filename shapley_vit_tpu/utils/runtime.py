"""Process-level JAX runtime knobs.

The serve loop's dominant cold-start cost is XLA compilation (20-40 s per
coalition-eval shape through the remote TPU compiler). JAX's persistent
compilation cache survives process restarts, so a service that crashes or
redeploys skips straight to execution — measured 7.4x faster fresh-process
startup for a ViT-B forward, and the saving grows with compile time.
``bench.py`` and the ``tools/`` scripts already rely on this; the helper
makes it a first-class runtime option for the production drivers
(reference has no analogue: torch eager recompiles nothing, start.py:248).
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_ENV_VAR = "SVT_COMPILE_CACHE"


def enable_compile_cache(
    path: Optional[str] = None,
    *,
    min_compile_secs: float = 1.0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path``.

    ``path=None`` falls back to ``$SVT_COMPILE_CACHE``; returns the active
    cache dir, or None when neither is set (no-op). Safe to call more than
    once and before/after backend init — only future compiles are affected.
    Entries below ``min_compile_secs`` of compile time are not persisted
    (sub-second compiles cost more in disk churn than they save).
    """
    import jax

    path = path or os.environ.get(_DEFAULT_ENV_VAR)
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_compile_secs))
    # JAX latches its cache singleton on the FIRST compile of the process;
    # enabling (or re-pointing) the cache after any compile would otherwise
    # silently no-op. reset_cache() drops the latch so the next compile
    # re-reads the config. Private API, so degrade gracefully.
    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:
        pass
    return path
