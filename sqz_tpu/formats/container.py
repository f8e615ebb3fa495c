"""``sqzt`` block container (FORMAT.md §3) — framing only, engine-agnostic.

Splits data into fixed 2^blk_bits blocks, each independently coded with fresh
model state, so blocks encode/decode in parallel on any engine. Per-block
payloads carry no headers; this container records the format, window, block
size, original size and the per-block compressed lengths.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

from sqz_tpu.formats.constants import (
    SQZT_MAGIC, SQZT_HEADER_BYTES,
    SQZT_FORMAT_SQUEEZE, SQZT_FORMAT_SQZ4,
)


def split_blocks(data: bytes, blk_bits: int) -> List[bytes]:
    bs = 1 << blk_bits
    return [data[o:o + bs] for o in range(0, len(data), bs)] or [b""]


def pack(fmt: int, win_bits: int, blk_bits: int, original_size: int,
         block_payloads: List[bytes]) -> bytes:
    assert fmt in (SQZT_FORMAT_SQUEEZE, SQZT_FORMAT_SQZ4)
    head = struct.pack(
        "<8sBBB5xQQ", SQZT_MAGIC, fmt, win_bits, blk_bits,
        original_size, len(block_payloads))
    assert len(head) == SQZT_HEADER_BYTES
    table = b"".join(struct.pack("<Q", len(p)) for p in block_payloads)
    return head + table + b"".join(block_payloads)


def unpack(blob: bytes) -> Tuple[int, int, int, int, List[bytes]]:
    """Returns (fmt, win_bits, blk_bits, original_size, block_payloads)."""
    magic, fmt, win_bits, blk_bits, osize, nblocks = struct.unpack_from(
        "<8sBBB5xQQ", blob, 0)
    if magic != SQZT_MAGIC:
        raise ValueError("bad sqzt magic")
    off = SQZT_HEADER_BYTES
    sizes = struct.unpack_from(f"<{nblocks}Q", blob, off)
    off += 8 * nblocks
    payloads = []
    for s in sizes:
        payloads.append(blob[off:off + s])
        off += s
    if off != len(blob):
        raise ValueError(f"container size mismatch: {off} != {len(blob)}")
    return fmt, win_bits, blk_bits, osize, payloads
