"""sqzt v3 anchored warm start (FORMAT.md §3.2, formats/anchors.py).

No reference counterpart — the reference has no container at all; this
extends our sqzt warm start (FORMAT.md §3.1) with per-warm-block anchor
choice, the only long-range-match mechanism available under the format's
2^15 window cap."""

from __future__ import annotations

import pytest

import sqz_tpu
from sqz_tpu import native
from sqz_tpu.formats import container
from sqz_tpu.formats.anchors import plan_anchored
from sqz_tpu.utils import corpus


def _periodic(size: int) -> bytes:
    raw = bytes(corpus.load("confucius.txt"))
    return (raw * (size // len(raw) + 1))[:size]


@pytest.fixture(scope="module")
def v3_blob():
    data = _periodic(2 << 20)
    blob = sqz_tpu.compress(data, fmt="sqz4", engine="native", blocks=True,
                            blk_bits=16, warm="anchors")
    return data, blob


def test_anchors_improve_periodic_ratio(v3_blob):
    """On long-period data (period 67 KB > the 32 KiB window) anchored
    warm start must find phase-aligned anchors and beat v2 clearly."""
    data, blob = v3_blob
    v2 = sqz_tpu.compress(data, fmt="sqz4", engine="native", blocks=True,
                          blk_bits=16, warm=True)
    assert len(blob) < 0.95 * len(v2)
    *_, fresh, anch = container.unpack(blob)
    assert anch is not None and sum(anch) > 0
    # canonical: anchor bits only on warm blocks
    assert all(not (a and f) for a, f in zip(anch, fresh))


def test_v3_decodes_on_all_engines(v3_blob):
    data, blob = v3_blob
    assert sqz_tpu.decompress(blob, engine="native") == data
    assert sqz_tpu.decompress(blob, engine="tpu") == data


def test_v3_oracle_decode_small():
    """Oracle decode of a v3 container (small blocks keep the pure-Python
    path affordable)."""
    raw = bytes(corpus.load("laozi.txt"))
    data = (raw[:3000] * 40)[:80 << 10]
    blob = sqz_tpu.compress(data, fmt="sqz4", engine="native", blocks=True,
                            blk_bits=12, win_bits=10, warm="anchors")
    assert sqz_tpu.decompress(blob, engine="oracle") == data


def test_cross_engine_identical_containers():
    """Planner decisions depend only on payload sizes, and per-block
    payloads are engine-bit-identical — so oracle and native emit the
    same v3 container."""
    raw = bytes(corpus.load("laozi.txt"))
    data = (raw[:3000] * 30)[:48 << 10]
    blobs = {}
    for eng in ("native", "oracle"):
        blobs[eng] = sqz_tpu.compress(data, fmt="sqz4", engine=eng,
                                      blocks=True, blk_bits=12,
                                      win_bits=10, warm="anchors")
    assert blobs["native"] == blobs["oracle"]


def test_v3_random_access(v3_blob):
    data, blob = v3_blob
    for start, ln in ((0, 100), (1500000, 5000), ((2 << 20) - 77, 77),
                      (65536 * 5 - 10, 65536 + 20)):
        assert sqz_tpu.decompress_range(blob, start, ln) == \
            data[start:start + ln]


def test_v3_squeeze_roundtrip():
    data = _periodic(1 << 20)
    blob = sqz_tpu.compress(data, fmt="squeeze", engine="native",
                            blocks=True, blk_bits=16, warm="anchors")
    assert sqz_tpu.decompress(blob, engine="native") == data
    assert sqz_tpu.decompress(blob, engine="tpu") == data


def test_forged_anchor_bitmaps_rejected(v3_blob):
    _, blob = v3_blob
    fmt, wb, bb, osize, payloads, csum, fresh, anch = container.unpack(blob)
    # pack() asserts canonicality, so forge at the byte level: set bit 0
    # of the anchor bitmap in the raw container (anchor bit on the always-
    # fresh block 0)
    from sqz_tpu.formats.constants import SQZT_HEADER_BYTES
    off = SQZT_HEADER_BYTES + 8 * len(payloads) \
        + (8 if csum is not None else 0) + (len(payloads) + 7) // 8
    raw = bytearray(blob)
    raw[off] |= 1
    with pytest.raises(ValueError):
        container.unpack(bytes(raw))


def test_anchor_flag_without_warm_rejected(v3_blob):
    _, blob = v3_blob
    raw = bytearray(blob)
    flags_off = 11
    assert raw[flags_off] & container.FLAG_WARM
    raw[flags_off] &= ~container.FLAG_WARM & 0xFF
    with pytest.raises(ValueError):
        container.unpack(bytes(raw))


def test_resolve_anchors():
    fresh = [True, False, False, True, False, True, False]
    anch = [False, False, True, False, True, False, False]
    got = container.resolve_anchors(fresh, anch)
    assert got == [None, 0, 0, None, 3, None, 0]
    # v2: no anchor mask -> all block 0
    assert container.resolve_anchors(fresh, None) == \
        [None, 0, 0, None, 0, None, 0]


def test_all_zero_anchor_mask_packs_as_v2():
    payloads = [b"x" * 10, b"y" * 10]
    blob = container.pack(1, 15, 16, (1 << 16) + 20, payloads, warm=True,
                          fresh_mask=[True, False],
                          anchor_mask=[False, False])
    *_, fresh, anch = container.unpack(blob)
    assert fresh is not None and anch is None


def test_planner_never_worse_than_cold():
    """The planner's fresh option bounds every block: total payload bytes
    <= all-cold total."""
    raw = bytes(corpus.load("x64.elf"))
    data = (raw * 4)[:256 << 10]
    parts = container.split_blocks(data, 14)

    def encode_one(p, seed, dic, want_state):
        return native.sqz4_compress_payload(p, 1 << 15, lz=True, seed=seed,
                                            return_state=want_state,
                                            dictionary=dic)
    payloads, fresh, anch = plan_anchored(
        parts, encode_one, lambda b: b[-(1 << 15):], beam=2)
    cold_total = sum(len(native.sqz4_compress_payload(p, 1 << 15, lz=True))
                     for p in parts)
    assert sum(map(len, payloads)) <= cold_total
    assert fresh[0] and not anch[0] and len(payloads) == len(parts)
