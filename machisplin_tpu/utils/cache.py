"""Persistent XLA compile cache for repeated runs.

Reference context: machisplin's R stack has no compile step, so its wall
time is pure compute; on TPU the first run of every program shape pays an
XLA compile (minutes through this container's remote-compile tunnel —
round-1 TIMING showed compiles were ~2/3 of the single-response mltps
wall).  Enabling JAX's persistent compilation cache makes every rerun of
the pipeline — and the second response variable inside one run, when
shapes repeat — skip those compiles entirely.

Called automatically by the pipeline entry points (`mltps`, bench.py,
``__graft_entry__``); safe to call repeatedly and from any backend.  The
cache directory resolves from, in order: the explicit argument,
``$MACHISPLIN_CACHE_DIR``, ``$JAX_COMPILATION_CACHE_DIR``, and finally
``~/.cache/machisplin_tpu/jax``.  Set ``MACHISPLIN_CACHE_DIR=""`` (empty)
to disable.
"""
from __future__ import annotations

import os

_ENABLED_DIR: str | None = None


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 0.0) -> str | None:
    # min_compile_secs=0: under the axon remote-compile tunnel even tiny
    # eager-op programs cost a full HTTP round trip per fresh process, and
    # a >0 threshold silently excludes exactly those from the cache
    """Point JAX's persistent compilation cache at a writable directory.

    Returns the directory in use, or None if disabled / unsupported.
    Idempotent: the first successful call wins; later calls are no-ops
    unless they name a different directory.
    """
    global _ENABLED_DIR
    if cache_dir is None:
        if "MACHISPLIN_CACHE_DIR" in os.environ:
            cache_dir = os.environ["MACHISPLIN_CACHE_DIR"]
            if not cache_dir:  # explicitly disabled
                return None
        else:
            cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
                os.path.expanduser("~"), ".cache", "machisplin_tpu", "jax"
            )
    cache_dir = os.path.abspath(cache_dir)
    if _ENABLED_DIR == cache_dir:
        return _ENABLED_DIR

    import jax

    # respect a cache the host application already configured (e.g. the
    # test suite's .jax_cache via conftest) instead of repointing it
    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if current:
        _ENABLED_DIR = current
        return _ENABLED_DIR

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        # default entry-size guard (1 MiB in some jax versions) rejects the
        # large batched-CV programs; lift it when the knob exists
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    except Exception:
        return None
    _ENABLED_DIR = cache_dir
    return _ENABLED_DIR
