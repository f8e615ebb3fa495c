"""Random-access decode (api.decompress_range): the sqzt length table gives
per-block entry points; warm containers additionally decode block 0 once to
re-derive the shared seed/dictionary (FORMAT.md §3/§3.1)."""

import pytest

import sqz_tpu
from sqz_tpu import native
from sqz_tpu.utils.corpus import load

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")

DATA = load("laozi.txt")


def _blob(fmt="sqz4", warm=False):
    return sqz_tpu.compress(DATA, fmt=fmt, engine="native", win_bits=12,
                            blocks=True, blk_bits=12, warm=warm)


@pytest.mark.parametrize("fmt", ["sqz4", "squeeze"])
@pytest.mark.parametrize("warm", [False, True])
def test_ranges(fmt, warm):
    blob = _blob(fmt, warm)
    bs = 1 << 12
    cases = [
        (0, 100),                    # head
        (bs - 50, 100),              # block boundary straddle
        (bs, bs),                    # exactly one interior block
        (len(DATA) - 77, 77),        # tail
        (bs + 123, 2 * bs + 17),     # multi-block straddle
        (0, len(DATA)),              # full range
        (len(DATA), 0),              # empty at end
    ]
    for start, length in cases:
        got = sqz_tpu.decompress_range(blob, start, length)
        assert got == DATA[start:start + length], (start, length)


def test_range_oracle_engine():
    blob = _blob(warm=True)
    got = sqz_tpu.decompress_range(blob, 5000, 300, engine="oracle")
    assert got == DATA[5000:5300]


def test_range_validation():
    blob = _blob()
    with pytest.raises(ValueError):
        sqz_tpu.decompress_range(blob, -1, 10)
    with pytest.raises(ValueError):
        sqz_tpu.decompress_range(blob, 0, len(DATA) + 1)
    with pytest.raises(ValueError):
        sqz_tpu.decompress_range(b"not a container" * 4, 0, 1)
