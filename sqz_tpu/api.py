"""Public API: compress/decompress across formats, engines, and containers.

Engines:
  * ``oracle`` — scalar pure-Python (always available; slow; the ground truth)
  * ``native`` — C++ host runtime via ctypes (fast CPU path)
  * ``tpu``    — JAX block-parallel kernels (requires the sqzt container)

Single-block formats mirror the reference containers exactly; the ``sqzt``
container (blocks=True) is the parallel framing all engines share.
"""

from __future__ import annotations

import enum
from typing import Optional

from sqz_tpu.formats import container as sqzt
from sqz_tpu.formats.constants import (
    SQZT_FORMAT_SQUEEZE, SQZT_FORMAT_SQZ4,
)


class Format(str, enum.Enum):
    SQUEEZE = "squeeze"
    SQZ4 = "sqz4"


class Engine(str, enum.Enum):
    ORACLE = "oracle"
    NATIVE = "native"
    TPU = "tpu"


def _native():
    from sqz_tpu import native
    if not native.available():
        raise RuntimeError("native engine not built; run `make -C sqz_tpu/native`")
    return native


def compress(data: bytes, fmt: Format | str = Format.SQUEEZE,
             engine: Engine | str = Engine.NATIVE,
             win_bits: int = 15, lz: bool = True,
             blocks: bool = False, blk_bits: int = 16,
             checksum: bool = True) -> bytes:
    fmt, engine = Format(fmt), Engine(engine)
    if blocks:
        parts = sqzt.split_blocks(data, blk_bits)
        payloads = _compress_blocks(parts, fmt, engine, win_bits, lz)
        code = SQZT_FORMAT_SQUEEZE if fmt is Format.SQUEEZE else SQZT_FORMAT_SQZ4
        csum = sqzt.fnv1a64(data) if checksum else None
        return sqzt.pack(code, win_bits, blk_bits, len(data), payloads, csum)
    if engine is Engine.TPU:
        raise ValueError("tpu engine requires blocks=True (sqzt container)")
    if fmt is Format.SQUEEZE:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle import squeeze_compress
            return squeeze_compress(data, win_bits)
        return _native().squeeze_compress(data, win_bits)
    else:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle import sqz4_compress
            return sqz4_compress(data, window=1 << win_bits, lz=lz)
        return _native().sqz4_compress(data, window=1 << win_bits, lz=lz)


def _compress_blocks(parts, fmt, engine, win_bits, lz):
    if engine is Engine.TPU:
        from sqz_tpu.ops import engine as tpu_engine
        return tpu_engine.compress_blocks(parts, fmt, win_bits, lz)
    out = []
    for p in parts:
        if fmt is Format.SQUEEZE:
            if engine is Engine.ORACLE:
                from sqz_tpu.oracle.squeeze import squeeze_encode_payload
                from sqz_tpu.oracle.bitstream import BitWriter
                bw = BitWriter()
                squeeze_encode_payload(p, win_bits, bw)
                out.append(bw.getvalue())
            else:
                out.append(_native().squeeze_compress_payload(p, win_bits))
        else:
            if engine is Engine.ORACLE:
                from sqz_tpu.oracle.sqz4 import sqz4_encode_payload
                out.append(sqz4_encode_payload(p, 1 << win_bits, lz=lz))
            else:
                out.append(_native().sqz4_compress_payload(p, 1 << win_bits, lz=lz))
    return out


def decompress(blob: bytes, fmt: Optional[Format | str] = None,
               engine: Engine | str = Engine.NATIVE) -> bytes:
    engine = Engine(engine)
    if blob[:8] == sqzt.SQZT_MAGIC:
        code, win_bits, blk_bits, osize, payloads, csum = sqzt.unpack(blob)
        fmt = Format.SQUEEZE if code == SQZT_FORMAT_SQUEEZE else Format.SQZ4
        sizes = _block_sizes(osize, blk_bits, len(payloads))
        if engine is Engine.TPU:
            from sqz_tpu.ops import engine as tpu_engine
            data = tpu_engine.decompress_blocks(payloads, sizes, fmt)
        else:
            out = bytearray()
            for payload, size in zip(payloads, sizes):
                out += _decode_one(payload, size, fmt, engine)
            data = bytes(out)
        if csum is not None and sqzt.fnv1a64(data) != csum:
            raise ValueError("sqzt checksum mismatch (EILSEQ)")
        return data
    # single-block reference containers
    if fmt is None:
        fmt = Format.SQZ4 if blob[:8] == b"squeeze4" else Format.SQUEEZE
    fmt = Format(fmt)
    if fmt is Format.SQUEEZE:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle import squeeze_decompress
            return squeeze_decompress(blob)
        return _native().squeeze_decompress(blob)
    else:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle import sqz4_decompress
            return sqz4_decompress(blob)
        return _native().sqz4_decompress(blob)


def _block_sizes(osize: int, blk_bits: int, nblocks: int):
    bs = 1 << blk_bits
    sizes = []
    remaining = osize
    for _ in range(nblocks):
        sizes.append(min(bs, remaining))
        remaining -= sizes[-1]
    return sizes


def _decode_one(payload: bytes, size: int, fmt: Format, engine: Engine) -> bytes:
    if fmt is Format.SQUEEZE:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle.bitstream import BitReader
            from sqz_tpu.oracle.squeeze import squeeze_decode_payload
            return squeeze_decode_payload(BitReader(payload), size)
        return _native().squeeze_decompress_payload(payload, size)
    else:
        if engine is Engine.ORACLE:
            from sqz_tpu.oracle.sqz4 import sqz4_decode_payload
            return sqz4_decode_payload(payload, size)
        return _native().sqz4_decompress_payload(payload, size)
