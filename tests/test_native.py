"""Native C++ engine: byte identity vs the Python oracle, round-trips,
threaded block executor, and cross-engine decode."""

import pytest

from sqz_tpu import native
from sqz_tpu.oracle import (
    squeeze_compress, squeeze_decompress,
    sqz4_compress, sqz4_decompress,
)
from sqz_tpu.oracle.squeeze import squeeze_encode_payload
from sqz_tpu.oracle.bitstream import BitWriter
from sqz_tpu.oracle.sqz4 import sqz4_encode_payload
from sqz_tpu.utils import corpus

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}")

CASES = [
    b"",
    b"x",
    corpus.hello(),
    corpus.zeros(4096),
    corpus.rle4(4096),
    corpus.texty(8192),
    corpus.random_bytes(4096, seed=11),
    corpus.texty(300, seed=1) + corpus.zeros(2048) + corpus.texty(300, seed=1),
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("win_bits", [10, 15])
def test_squeeze_native_matches_oracle(data, win_bits):
    ours = native.squeeze_compress(data, win_bits)
    oracle = squeeze_compress(data, win_bits)
    assert ours == oracle
    assert native.squeeze_decompress(oracle) == data
    assert squeeze_decompress(ours) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
@pytest.mark.parametrize("lz", [False, True])
def test_sqz4_native_matches_oracle(data, lz):
    ours = native.sqz4_compress(data, window=1 << 10, lz=lz)
    oracle = sqz4_compress(data, window=1 << 10, lz=lz)
    assert ours == oracle
    assert native.sqz4_decompress(oracle) == data
    assert sqz4_decompress(ours) == data


@pytest.mark.parametrize("fmt", [0, 1])
def test_blocks_parallel_matches_serial(fmt):
    data = corpus.texty(50000, seed=5)
    payloads = native.blocks_compress(data, fmt=fmt, win_bits=10, blk_bits=12)
    assert len(payloads) == (len(data) + 4095) // 4096
    # each block must equal the independently-coded oracle payload
    for b, payload in enumerate(payloads[:4]):
        part = data[b * 4096:(b + 1) * 4096]
        if fmt == 0:
            bw = BitWriter()
            squeeze_encode_payload(part, 10, bw)
            assert payload == bw.getvalue()
        else:
            assert payload == sqz4_encode_payload(part, 1 << 10, lz=True)
    back = native.blocks_decompress(payloads, len(data), fmt=fmt, blk_bits=12)
    assert back == data


def test_native_corpus_full_roundtrip():
    files = corpus.available_corpus()
    if not files:
        pytest.skip("corpus unavailable")
    for f in files:
        data = f.read_bytes()
        blob = native.squeeze_compress(data, 15)
        assert native.squeeze_decompress(blob) == data, f.name
        blob4 = native.sqz4_compress(data, window=1 << 15, lz=True)
        assert native.sqz4_decompress(blob4) == data, f.name


def test_native_corpus_compression_ratio():
    # attic reference on bible.txt @ win 15 achieved 32.7%; text corpus files
    # here should land in the same ballpark (confucius/laozi are smaller so
    # adaptive trees have less warm-up; allow slack)
    files = {f.name: f for f in corpus.available_corpus()}
    if "confucius.txt" not in files:
        pytest.skip("confucius.txt unavailable")
    data = files["confucius.txt"].read_bytes()
    blob = native.squeeze_compress(data, 15)
    ratio = len(blob) / len(data)
    assert ratio < 0.55, f"squeeze ratio {ratio:.3f} unexpectedly poor"
