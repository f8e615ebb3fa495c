"""Persistent XLA compilation cache (round 4).

The axon tunnel compiles remotely and sort-heavy programs cost 13-31 s
each (ops/lzparse.py docstring); the driver's bench run repays every one
of them unless the persistent cache is warm. ``enable()`` points JAX's
compilation cache at a repo-local directory (gitignored) so a bench or
tool run in the same sandbox reuses this session's compiles.

Env: SQZ_XLA_CACHE=0 disables; SQZ_XLA_CACHE=<dir> overrides the path.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".xla_cache")


def enable(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache. Returns the
    cache dir, or None when disabled (SQZ_XLA_CACHE=0) or unavailable."""
    env = os.environ.get("SQZ_XLA_CACHE", "")
    if env == "0":
        return None
    import jax
    target = path or (env if env else _DEFAULT)
    try:
        os.makedirs(target, exist_ok=True)
        if jax.config.jax_compilation_cache_dir != target:
            jax.config.update("jax_compilation_cache_dir", target)
            # cache anything that took a meaningful compile; the default
            # (1 s) skips nothing we care about but this makes it explicit
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:                                 # noqa: BLE001
        return None                # older jax / read-only fs: best-effort
    return target
