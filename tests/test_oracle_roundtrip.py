"""Round-trip tests for the scalar oracle codecs (both formats).

Mirrors the reference test strategy (SURVEY.md §4): synthetic edge cases,
corpus samples, memcmp with first-diff reporting.
"""

import pytest

from sqz_tpu.oracle import (
    squeeze_compress, squeeze_decompress,
    sqz4_compress, sqz4_decompress,
)
from sqz_tpu.utils import corpus


def first_diff(a: bytes, b: bytes) -> int:
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i
    return -1 if len(a) == len(b) else min(len(a), len(b))


SMALL_CASES = [
    b"",
    b"a",
    b"ab",
    b"aaa",
    corpus.hello(),
    corpus.zeros(512),
    corpus.rle4(512),
    corpus.random_bytes(512),
    corpus.texty(2048),
    corpus.zeros(4096),
    corpus.rle4(4096),
]


@pytest.mark.parametrize("data", SMALL_CASES, ids=range(len(SMALL_CASES)))
def test_squeeze_roundtrip_small(data):
    blob = squeeze_compress(data, win_bits=10)
    back = squeeze_decompress(blob)
    assert back == data, f"first diff at {first_diff(data, back)}"


@pytest.mark.parametrize("data", SMALL_CASES, ids=range(len(SMALL_CASES)))
def test_sqz4_roundtrip_small(data):
    blob = sqz4_compress(data, window=1 << 10)
    back = sqz4_decompress(blob)
    assert back == data, f"first diff at {first_diff(data, back)}"


def test_sqz4_literal_only_roundtrip():
    data = corpus.texty(4096)
    blob = sqz4_compress(data, lz=False)
    back = sqz4_decompress(blob)
    assert back == data


def test_squeeze_compresses_text():
    data = corpus.texty(8192)
    blob = squeeze_compress(data, win_bits=10)
    assert len(blob) < len(data) // 2


def test_squeeze_rle_extreme():
    # overlapped backrefs compress runs to almost nothing
    data = corpus.zeros(4096)
    blob = squeeze_compress(data, win_bits=10)
    assert len(blob) < 100


def test_sqz4_overlapped_backref():
    data = b"abcabcabcabcabcabcabcabcabc"
    blob = sqz4_compress(data, window=1 << 10)
    assert sqz4_decompress(blob) == data


def test_squeeze_window_limits_distance():
    # data with a repeat farther than the window must still round-trip
    data = corpus.texty(600, seed=1) + b"\x00" * 1200 + corpus.texty(600, seed=1)
    blob = squeeze_compress(data, win_bits=10)
    assert squeeze_decompress(blob) == data


def test_corpus_laozi_oracle():
    files = corpus.available_corpus()
    laozi = [f for f in files if f.name == "laozi.txt"]
    if not laozi:
        pytest.skip("laozi.txt not in corpus mount")
    data = laozi[0].read_bytes()[:8192]
    blob = squeeze_compress(data, win_bits=10)
    assert squeeze_decompress(blob) == data
    blob4 = sqz4_compress(data, window=1 << 10)
    assert sqz4_decompress(blob4) == data
