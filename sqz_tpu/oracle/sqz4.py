"""``sqz4`` format codec — scalar oracle (FORMAT.md §2).

Pinned to reference src/sqz.c:590-839: adaptive binary range coder over
per-symbol frequency models; token grammar = literal/match/EOS with
per-bit-position distance models and an implicit distance MSB.

The decoder reconstructs the implicit MSB as ``1 << (nbits-1)`` — matching
the encoder (src/sqz.c:694-698) and fixing the reference decoder's latent
off-by-one (src/sqz.c:821, unreachable at reference HEAD; see FORMAT.md §2.4).
"""

from __future__ import annotations

from sqz_tpu.formats.constants import (
    SQZ4_MAGIC, SQZ4_MIN_LEN, SQZ4_MAX_LEN, SQZ4_EOS,
)
from sqz_tpu.oracle.match import greedy_tokens
from sqz_tpu.oracle.rangecoder import ProbModel, RangeDecoder, RangeEncoder


class _Models:
    """The 36 adaptive models of struct sqz (src/sqz.c:550-565)."""

    def __init__(self) -> None:
        self.literal = ProbModel(2)
        self.size = ProbModel(256)
        self.byte = ProbModel(256)
        self.bits = ProbModel(32)
        self.dist = [ProbModel(2) for _ in range(32)]


def _reject(length: int, dist: int) -> bool:
    # short matches with far distances cost more than literals (src/sqz.c:678-685)
    return length <= 3 and dist.bit_length() > 3


def sqz4_encode_payload(data: bytes, window: int, lz: bool = True) -> bytes:
    pm = _Models()
    enc = RangeEncoder()
    if lz:
        tokens = greedy_tokens(data, window, SQZ4_MIN_LEN, SQZ4_MAX_LEN,
                               reject=_reject)
    else:  # literal-only: reference HEAD behavior (src/sqz.c:591 map.n = 0)
        tokens = [("lit", b) for b in data]
    for tok in tokens:
        if tok[0] == "lit":
            enc.encode(pm.literal, 1)
            enc.encode(pm.byte, tok[1])
        else:
            _, length, dist = tok
            nbits = dist.bit_length()
            enc.encode(pm.literal, 0)
            enc.encode(pm.size, length)
            enc.encode(pm.bits, nbits)
            d = dist
            for b in range(nbits - 1):  # low bits LSB-first; MSB implicit
                enc.encode(pm.dist[b], d & 1)
                d >>= 1
    enc.encode(pm.literal, 0)   # EOS (src/sqz.c:741-742)
    enc.encode(pm.size, SQZ4_EOS)
    enc.flush()
    return enc.getvalue()


def sqz4_compress(data: bytes, window: int = 1 << 15, lz: bool = True,
                  container: bool = True) -> bytes:
    payload = sqz4_encode_payload(data, window, lz=lz)
    if not container:
        return payload
    # driver container: magic + LE size (reference test.c:41-46)
    return SQZ4_MAGIC + len(data).to_bytes(8, "little") + payload


def sqz4_decode_payload(payload: bytes, size: int) -> bytes:
    pm = _Models()
    dec = RangeDecoder(payload)
    out = bytearray()
    while True:
        flag = dec.decode(pm.literal)
        if dec.error:
            raise ValueError(f"range coder error {dec.error}")
        if flag:
            if len(out) >= size:
                raise ValueError("output overrun (ENOBUFS)")
            out.append(dec.decode(pm.byte))
        else:
            length = dec.decode(pm.size)
            if length == SQZ4_EOS:
                break
            if not (SQZ4_MIN_LEN <= length <= SQZ4_MAX_LEN):
                raise ValueError(f"bad match length {length} (ERANGE)")
            nbits = dec.decode(pm.bits)
            dist = 0
            for b in range(nbits - 1):
                dist |= dec.decode(pm.dist[b]) << b
            if nbits > 0:
                dist |= 1 << (nbits - 1)  # implicit MSB (see module docstring)
            if dist > len(out):
                raise ValueError(f"distance {dist} out of range (ERANGE)")
            if len(out) + length > size:
                raise ValueError("output overrun (ENOBUFS)")
            for _ in range(length):  # overlapped copy is byte-serial
                out.append(out[-dist])
    return bytes(out)


def sqz4_decompress(blob: bytes, size: int | None = None) -> bytes:
    if size is None:  # container framing
        if blob[:8] != SQZ4_MAGIC:
            raise ValueError("bad squeeze4 magic (EILSEQ)")
        size = int.from_bytes(blob[8:16], "little")
        blob = blob[16:]
    return sqz4_decode_payload(blob, size)
