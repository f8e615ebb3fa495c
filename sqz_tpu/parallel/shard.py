"""shard_map distribution of the block-parallel codec over a device mesh.

Blocks shard over the 1-D "blocks" mesh axis; every device runs the batched
sqz4 encode scan on its local blocks (identical lock-step program), and the
per-block compressed lengths are exchanged with a psum so every device knows
the container's length table. The variable-length payloads stay sharded —
the host assembling the sqzt container pulls them in block order (the
"ordered gather"; on a multi-host pod this is jax.experimental
multihost_utils / process-local addressable shards, over ICI not DCN for the
in-slice legs).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
import inspect

_VMA_KW = ("check_vma" if "check_vma" in inspect.signature(_shard_map).parameters
           else "check_rep")


def shard_map(*args, **kwargs):
    return _shard_map(*args, **kwargs)

from sqz_tpu.ops.sqz4_jax import encode_scan_impl, microops_from_tokens, OP_PAD


def sharded_encode_fn(mesh: Mesh, cap: int):
    """jitted shard_map program: ops sharded by block → (payloads, lens,
    total_bytes) with lens all-gathered and the total psum-reduced."""

    def local(m_ops, s_ops):
        payload, lens = encode_scan_impl(m_ops, s_ops, cap)
        total = jax.lax.psum(jnp.sum(lens.astype(jnp.int64)), "blocks")
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        return payload, all_lens, total

    # check_vma=False: the codec scans materialize per-step constants whose
    # varying-axis inference conflicts with loop-carry typing; the program is
    # purely block-local plus explicit collectives, so the check adds nothing.
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("blocks", None), P("blocks", None)),
        out_specs=(P("blocks", None), P(None), P()),
        **{_VMA_KW: False},
    ))


def encode_blocks_sharded(token_lists: Sequence[list], blk_bits: int,
                          mesh: Mesh) -> List[bytes]:
    """Ordered-gather sqz4 block compression over the mesh.

    Multi-host ready: payloads stay sharded; each process trims only its
    addressable shards against the device-all-gathered (replicated) length
    table, and process 0 assembles the ordered list (single-process: the
    exchange is the identity). Returns None on processes other than 0 of a
    multi-process run."""
    from sqz_tpu.parallel import multihost
    n = mesh.devices.size
    ops = [microops_from_tokens(t) for t in token_lists]
    B = len(ops)
    Bp = ((B + n - 1) // n) * n                      # pad to device multiple
    T = max(len(m) for m, _ in ops)
    m_ops = np.full((Bp, T), OP_PAD, dtype=np.int32)
    s_ops = np.zeros((Bp, T), dtype=np.int32)
    for b, (m, s) in enumerate(ops):
        m_ops[b, :len(m)] = m
        s_ops[b, :len(s)] = s
    cap = (1 << blk_bits) * 2 + 4096
    fn = sharded_encode_fn(mesh, cap)
    payload, lens, _ = fn(jnp.asarray(m_ops), jnp.asarray(s_ops))
    lens = np.asarray(lens)                          # replicated: host copy
    local = multihost.addressable_scan_payloads(payload, lens, B)
    return multihost.gather_payloads_to_host0(local, lens, B)


# ----------------------------------------------- pallas kernels over a mesh

def sharded_encode_pallas_fn(mesh: Mesh, cap_words: int, tc: int,
                             interpret: bool = False, wide: bool = False):
    """shard_map program running the self-contained Pallas encoder on each
    device's local block groups (group axis sharded; ICI all-gather of the
    per-block lengths for the container table). ``wide`` selects the
    base-2^14 exact divider required once model totals exceed 2^15
    (blk_bits >= 15) — same rule as encode_data_full."""
    from sqz_tpu.ops.sqz4_pallas import _encode_full_pallas

    def local(m_words, s_words):
        words, lens = _encode_full_pallas.__wrapped__(
            m_words, s_words, cap_words, tc, interpret, wide)
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        return words, all_lens

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("blocks", None, None), P("blocks", None, None)),
        out_specs=(P("blocks", None, None), P(None)),
        **{_VMA_KW: False},
    ))


def encode_data_sharded_pallas(data: bytes, blk_bits: int, window: int,
                               mesh: Mesh, lanes: int = 128,
                               tc: int = 256,
                               interpret: bool = False) -> List[bytes]:
    """Whole-buffer sqz4 encode with block groups sharded over the mesh:
    native plan+pack -> per-device Pallas coder -> ordered host gather."""
    from sqz_tpu import native
    from sqz_tpu.ops.sqz4_pallas import unpack_group_payloads
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    n = mesh.devices.size
    # pad the group count to a device multiple
    G = -(-NB // lanes)
    Gp = ((G + n - 1) // n) * n
    tp_cap = -(-(5 * bs // 2 + 16) // (4 * tc)) * 4 * tc
    mw, sw, mx = native.sqz4_plan_pack(data, window, blk_bits, True,
                                       lanes, tp_cap)
    rows = max(-(-int(mx) // tc) * tc, tc)
    if Gp > G:
        pad = np.full((Gp - G,) + mw.shape[1:], 0xFFFFFFFF, np.uint32)
        mw = np.concatenate([mw, pad])
        sw = np.concatenate([sw, np.zeros_like(pad)])
    cap_words = (-(-(bs + 2048 + 3) // 4) + 31) // 32 * 32
    fn = sharded_encode_pallas_fn(mesh, cap_words, tc, interpret,
                                  wide=blk_bits >= 15)
    words, lens = fn(jnp.asarray(np.ascontiguousarray(mw[:, :rows])),
                     jnp.asarray(np.ascontiguousarray(sw[:, :rows])))
    # multi-host ready ordered gather: payloads stay sharded, every process
    # trims its addressable shards against the replicated length table
    from sqz_tpu.parallel import multihost
    lens_flat = np.asarray(lens)[:, 0, :].reshape(-1)
    local = multihost.addressable_block_payloads(words, lens_flat, NB)
    return multihost.gather_payloads_to_host0(local, lens_flat, NB)
