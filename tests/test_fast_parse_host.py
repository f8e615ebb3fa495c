"""Host fast-parse payload encode (native bounded matcher, PERF.md
round 3 "anchored warm start" follow-on): spec-valid sqz4 streams from
the depth-limited hash-chain matcher, usable wherever the sqzt contract
(round-trip + ratio, FORMAT.md §3) applies — the cold block loop, the
v2 warm double-encode, and the v3 anchor planner.

Reference yardstick for stream validity: the decoder accepts any
spec-valid token sequence (src/sqz.c:793-839); only WHICH match the
encoder picks changes (match policy: squeeze.h:340-358 is normative
only for size parity, which sqzt does not promise)."""

from __future__ import annotations

import pytest

import sqz_tpu
from sqz_tpu import native
from sqz_tpu.formats import container
from sqz_tpu.utils import corpus

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")


def _tiled(name: str, size: int) -> bytes:
    raw = bytes(corpus.load(name))
    return (raw * (size // len(raw) + 1))[:size]


def test_fast_payload_roundtrip_and_ratio():
    data = _tiled("confucius.txt", 256 << 10)
    exact = native.sqz4_compress_payload(data, 1 << 15, lz=True)
    fast = native.sqz4_compress_payload(data, 1 << 15, lz=True,
                                        parse="fast")
    assert fast != exact          # different parse, same spec
    assert native.sqz4_decompress_payload(fast, len(data)) == data
    # bounded matcher stays within ~1 pp of the exact parse
    assert len(fast) <= len(exact) + len(data) // 100


def test_fast_seeded_dictionary_roundtrip():
    data = _tiled("x64.elf", 128 << 10)
    blk0, blk1 = data[:64 << 10], data[64 << 10:]
    _, seed = native.sqz4_compress_payload(blk0, 1 << 15, lz=True,
                                           return_state=True)
    dic = blk0[-(1 << 15):]
    w = native.sqz4_compress_payload(blk1, 1 << 15, lz=True, seed=seed,
                                     dictionary=dic, parse="fast")
    assert native.sqz4_decompress_payload(w, len(blk1), seed=seed,
                                          dictionary=dic) == blk1


def test_fast_depth_monotone_ratio():
    """Deeper chain walks find better matches: ratio must not get worse
    as depth grows (same data, same policy)."""
    data = _tiled("laozi.txt", 128 << 10)
    sizes = [len(native.sqz4_compress_payload(data, 1 << 15, lz=True,
                                              parse="fast", depth=d))
             for d in (4, 32, 256)]
    assert sizes[0] >= sizes[1] >= sizes[2]


def test_fast_warm_threaded_executor():
    data = _tiled("confucius.txt", 512 << 10)
    pe, me = native.blocks_compress(data, 1, 15, 16, warm=True)
    pf, mf = native.blocks_compress(data, 1, 15, 16, warm=True,
                                    parse="fast")
    assert native.blocks_decompress(pf, len(data), 1, 16, fresh_mask=mf,
                                    win_bits=15) == data
    assert sum(map(len, pf)) <= sum(map(len, pe)) + len(data) // 100


def test_fast_anchored_compress_api():
    raw = bytes(corpus.load("confucius.txt"))
    data = (raw * 20)[:1 << 20]
    b_e = sqz_tpu.compress(data, fmt="sqz4", engine="native", blocks=True,
                           blk_bits=16, warm="anchors")
    b_f = sqz_tpu.compress(data, fmt="sqz4", engine="native", blocks=True,
                           blk_bits=16, warm="anchors", parse="fast")
    assert sqz_tpu.decompress(b_f, engine="native") == data
    assert len(b_f) <= len(b_e) + len(data) // 100
    # the anchor structure survives the fast parse
    *_, fresh, anch = container.unpack(b_f)
    assert fresh is not None
    # tpu-engine 'auto' resolves to the same native fast containers
    b_t = sqz_tpu.compress(data, fmt="sqz4", engine="tpu", blocks=True,
                           blk_bits=16, warm="anchors")
    assert b_t == b_f


def test_fast_squeeze_payload_roundtrip():
    data = _tiled("confucius.txt", 256 << 10)
    exact = native.squeeze_compress_payload(data, 15)
    fast = native.squeeze_compress_payload(data, 15, parse="fast")
    assert fast != exact
    assert native.squeeze_decompress_payload(fast, len(data)) == data
    assert len(fast) <= len(exact) + len(data) // 100


def test_fast_squeeze_seeded_and_container():
    data = _tiled("laozi.txt", 256 << 10)
    blk0 = data[:64 << 10]
    _, seed = native.squeeze_compress_payload(blk0, 15, return_state=True)
    dic = blk0[-(1 << 15):]
    w = native.squeeze_compress_payload(data[64 << 10:], 15, seed=seed,
                                        dictionary=dic, parse="fast")
    assert native.squeeze_decompress_payload(
        w, len(data) - (64 << 10), seed=seed, dictionary=dic) == \
        data[64 << 10:]
    blob = sqz_tpu.compress(data, fmt="squeeze", engine="native",
                            blocks=True, blk_bits=14, warm=True,
                            parse="fast")
    assert sqz_tpu.decompress(blob, engine="native") == data


def test_fast_squeeze_exact_stream_unchanged():
    """Raw .sqz streams promise size parity with the reference — the
    default must remain the exact §1.5 policy."""
    data = _tiled("laozi.txt", 32 << 10)
    a = native.squeeze_compress_payload(data, 12)
    b = native.squeeze_compress_payload(data, 12, parse="exact")
    assert a == b


def test_parse_exact_unchanged_by_new_path():
    """The exact path must be byte-stable: parse='exact' (and the
    default) still emits the reference-semantics stream."""
    data = _tiled("laozi.txt", 64 << 10)
    a = native.sqz4_compress_payload(data, 1 << 15, lz=True)
    b = native.sqz4_compress_payload(data, 1 << 15, lz=True, parse="exact")
    assert a == b
