"""Match-finder differential tests — the reference's methodology
(reference bst.c:254-308: tree matcher vs brute-force `lz77_find` ground
truth on synthetic strings, assert on divergence). Here the native
hash-chain MatchFinder and the oracle greedy tokenizer are both checked
against a direct brute-force window scan with the reference's semantics:
longest match wins, nearest (smallest distance) wins ties
(reference src/sqz.c:135-179 scans the chain newest-first)."""

import numpy as np
import pytest

from sqz_tpu.formats.constants import sqz4_reject_short_far
from sqz_tpu.oracle.match import greedy_tokens


def brute_force_tokens(data: bytes, window: int, min_len: int, max_len: int,
                       reject_short_far: bool):
    """Ground-truth greedy tokenization by O(n·window) scan."""
    n = len(data)
    toks = []
    i = 0
    while i < n:
        cap = min(max_len, n - i)
        best_len, best_dist = 0, 0
        lo = max(0, i - window + 1)
        for j in range(i - 1, lo - 1, -1):  # nearest first
            k = 0
            while k < cap and data[j + k] == data[i + k]:
                k += 1
            if k > best_len:
                best_len, best_dist = k, i - j
                if k == cap:
                    break
        # the single-source policy rule (formats/constants.py) IS the ground
        # truth here — the native tokenizer below is asserted against it
        if reject_short_far and sqz4_reject_short_far(best_len, best_dist):
            best_len = 0
        if best_len >= min_len:
            toks.append(("match", best_len, best_dist))
            i += best_len
        else:
            toks.append(("lit", data[i]))
            i += 1
    return toks


CASES = [
    b"\0" * 300,                                   # RLE / overlapped
    b"abcd" * 100,                                 # short period
    b"to be or not to be, that is the question " * 8,
    bytes(np.random.default_rng(0).integers(0, 4, 400, np.uint8)),
    bytes(np.random.default_rng(1).integers(0, 256, 300, np.uint8)),
    b"a" * 10 + b"b" + b"a" * 260,                 # match cap boundary
]


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("window,min_len,max_len,reject",
                         [(1 << 10, 2, 254, True),    # sqz4 policy
                          (1 << 8, 3, 257, False)])   # squeeze policy
def test_oracle_matches_brute_force(case, window, min_len, max_len, reject):
    data = CASES[case]
    if reject:
        got = greedy_tokens(data, window, min_len, max_len,
                            reject=sqz4_reject_short_far)
    else:
        got = greedy_tokens(data, window, min_len, max_len)
    want = brute_force_tokens(data, window, min_len, max_len, reject)
    assert got == want


@pytest.mark.parametrize("case", range(len(CASES)))
@pytest.mark.parametrize("window,min_len,max_len,reject",
                         [(1 << 10, 2, 254, True),
                          (1 << 8, 3, 257, False)])
def test_native_matches_brute_force(case, window, min_len, max_len, reject):
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    data = CASES[case]
    raw = native.tokenize(data, window, min_len, max_len,
                          reject_short_far=reject)
    got = [("lit", int(a)) if k == 0 else ("match", int(a), int(b))
           for k, a, b in raw]
    want = brute_force_tokens(data, window, min_len, max_len, reject)
    assert got == want


def test_container_checksum_detects_payload_swap():
    """A corrupt block that still decodes to the right LENGTH is caught by
    the container checksum (the reference computes this FNV but never
    verifies it — inc/rt/fileio.h:120-129)."""
    import sqz_tpu
    from sqz_tpu.formats import container
    data = b"the quick brown fox jumps over the lazy dog " * 40
    blob = sqz_tpu.compress(data, fmt="sqz4", engine="native",
                            blocks=True, blk_bits=10)
    fmt, wb, bb, osize, payloads, csum, _warm, _anch = container.unpack(blob)
    assert csum == container.fnv1a64(data)
    # re-encode a modified first block of the same length: every block still
    # decodes, only the checksum notices
    other = bytearray(data[:1 << 10])
    other[0] ^= 1
    swapped = sqz_tpu.compress(bytes(other), fmt="sqz4", engine="native",
                               blocks=True, blk_bits=10)
    _, _, _, _, payloads2, _, _, _ = container.unpack(swapped)
    forged = container.pack(fmt, wb, bb, osize,
                            [payloads2[0]] + payloads[1:], csum)
    with pytest.raises(ValueError, match="checksum"):
        sqz_tpu.decompress(forged, engine="native")
    # python-fallback fnv agrees with the native one
    h = container.FNV_INIT
    for b in data[:100]:
        h = ((h ^ b) * container.FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    from sqz_tpu import native as nat
    if nat.available():
        assert h == nat.fnv1a64(data[:100])


def test_reject_rule_boundaries():
    """Pin the single-source short-far rule (src/sqz.c:678-685) at its
    boundary values so any drift in formats/constants.py is caught even
    without a parse."""
    from sqz_tpu.formats.constants import (
        SQZ4_REJECT_MAX_LEN, SQZ4_REJECT_MAX_BITS)
    assert (SQZ4_REJECT_MAX_LEN, SQZ4_REJECT_MAX_BITS) == (3, 3)
    assert not sqz4_reject_short_far(3, 7)       # dist fits 3 bits: keep
    assert sqz4_reject_short_far(3, 8)           # dist needs 4 bits: reject
    assert sqz4_reject_short_far(2, 8)
    assert not sqz4_reject_short_far(4, 8)       # long enough: keep
    assert not sqz4_reject_short_far(4, 1 << 14)
