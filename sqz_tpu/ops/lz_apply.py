"""Parallel application of LZ77 back-references to a decoded buffer.

Literal bytes are pre-placed at their final positions by the entropy-decode
scans; this pass applies the match list in order. Each match copies with the
periodic gather ``src = dst - dist + (i mod dist)`` — every source index lands
in the already-resolved prefix, so overlapped copies (dist < len, the
reference's byte-serial loops src/sqz.c:826-831 / squeeze.h:535-539) resolve
in one vectorized step per match.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_len",))
def apply_matches(out, matches, max_len: int):
    """out: [B, W] u8; matches: [B, M, 3] int32 (dst, size, dist), size==0
    marks an unused slot. Matches must be ordered by dst within each block."""
    B, W = out.shape
    bidx = jnp.arange(B)
    iidx = jnp.arange(max_len)

    def step(out, slot):
        dst, size, dist = slot[:, 0], slot[:, 1], slot[:, 2]
        live = size > 0
        dist_c = jnp.maximum(dist, 1)
        src = dst[:, None] - dist_c[:, None] + (iidx[None, :] % dist_c[:, None])
        src = jnp.clip(src, 0, W - 1)
        vals = out[bidx[:, None], src]
        pos = jnp.where((iidx[None, :] < size[:, None]) & live[:, None],
                        dst[:, None] + iidx[None, :], W)
        out = out.at[bidx[:, None], pos].set(vals, mode="drop")
        return out, None

    out, _ = jax.lax.scan(step, out, jnp.swapaxes(matches, 0, 1))
    return out
