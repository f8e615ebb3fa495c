"""TPU engine entry points used by sqz_tpu.api (sqzt container required).

Round-1 pipeline split: greedy match finding (tokenization) runs on the host
native runtime — it is embarrassingly block-parallel CPU work — while the
serial-by-construction entropy coding runs as the batched device scans in
sqz4_jax / squeeze_jax. Later rounds move tokenization on-device
(vectorized hash/compare kernels, SURVEY.md §7.2 L3).
"""

from __future__ import annotations

from typing import List, Sequence

from sqz_tpu.formats.constants import SQZ4_MIN_LEN, SQZ4_MAX_LEN
from sqz_tpu.formats.constants import SQUEEZE_LEN_MIN, SQUEEZE_LEN_MAX


def _tokenize(part: bytes, window: int, min_len: int, max_len: int,
              reject: bool, lz: bool) -> list:
    if not lz:
        return [("lit", b) for b in part]
    from sqz_tpu import native
    if native.available():
        toks = native.tokenize(part, window, min_len, max_len,
                               reject_short_far=reject)
        out = []
        for kind, a, b in toks:
            out.append(("lit", int(a)) if kind == 0 else ("match", int(a), int(b)))
        return out
    from sqz_tpu.oracle.match import greedy_tokens
    if reject:
        rej = lambda length, dist: length <= 3 and dist.bit_length() > 3
        return greedy_tokens(part, window, min_len, max_len, reject=rej)
    return greedy_tokens(part, window, min_len, max_len)


def compress_blocks(parts: Sequence[bytes], fmt, win_bits: int,
                    lz: bool) -> List[bytes]:
    from sqz_tpu.api import Format
    blk_bits = max((len(p) - 1).bit_length() for p in parts) if any(parts) else 10
    if fmt is Format.SQZ4:
        from sqz_tpu.ops import sqz4_jax
        tokens = [_tokenize(p, 1 << win_bits, SQZ4_MIN_LEN, SQZ4_MAX_LEN,
                            reject=True, lz=lz) for p in parts]
        return sqz4_jax.encode_blocks(tokens, blk_bits)
    else:
        from sqz_tpu.ops import squeeze_jax
        tokens = [_tokenize(p, 1 << win_bits, SQUEEZE_LEN_MIN, SQUEEZE_LEN_MAX,
                            reject=False, lz=True) for p in parts]
        return squeeze_jax.encode_blocks(tokens, blk_bits)


def decompress_blocks(payloads: Sequence[bytes], sizes: Sequence[int],
                      fmt) -> bytes:
    from sqz_tpu.api import Format
    blk_bits = max(max(s - 1 for s in sizes), 1).bit_length()
    if fmt is Format.SQZ4:
        from sqz_tpu.ops import sqz4_jax
        blocks = sqz4_jax.decode_blocks(payloads, list(sizes), blk_bits)
    else:
        from sqz_tpu.ops import squeeze_jax
        blocks = squeeze_jax.decode_blocks(payloads, list(sizes), blk_bits)
    return b"".join(blocks)
