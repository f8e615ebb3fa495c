"""Persistent XLA compilation cache (round 4; wired in round 5).

The axon tunnel compiles remotely and sort-heavy programs cost 13-31 s
each (ops/lzparse.py docstring); the driver's bench run repays every one
of them unless the persistent cache is warm. ``enable()`` points JAX's
compilation cache at ONE directory — the same one bench.py uses — so the
bench, the tools/ scripts, and any repeat invocation in this sandbox all
share compiled kernels across processes. bench.py and the hardware tools
call this at startup; a round's interactive runs prewarm the driver's
end-of-round run.

Env: SQZ_XLA_CACHE=0 disables; SQZ_XLA_CACHE=<dir> overrides the path;
JAX_COMPILATION_CACHE_DIR (set before jax initializes) also wins.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_sqz")


def cache_dir() -> str | None:
    """The directory enable() will use, or None when disabled."""
    env = os.environ.get("SQZ_XLA_CACHE", "")
    if env == "0":
        return None
    return (env or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _DEFAULT)


def enable(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache. Returns the
    cache dir, or None when disabled (SQZ_XLA_CACHE=0) or unavailable.

    Safe to call before OR after jax initializes: the env vars are set
    first (they win if jax has not started yet) and jax.config is updated
    to match (covers an already-initialized jax)."""
    target = path or cache_dir()
    if target is None:
        return None
    try:
        os.makedirs(target, exist_ok=True)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", target)
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                              "2")
        import jax
        if jax.config.jax_compilation_cache_dir != target:
            jax.config.update("jax_compilation_cache_dir", target)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
    except Exception:                                 # noqa: BLE001
        return None                # older jax / read-only fs: best-effort
    return target
