"""Pipelined decode (ops/pipeline.decode_data_pipelined): chunked
dispatch + packer-thread overlap must be output-identical to
decode_groups — chunking only batches dispatches; blocks are independent
(SURVEY §2.6). Interpret mode; the decode kernel needs lanes % 128 == 0,
so multi-chunk coverage uses 130 tiny 32-byte blocks (2 chunks at
lanes=128) to stay inside the interpret cost envelope."""

from __future__ import annotations

import pytest

from sqz_tpu import native
from sqz_tpu.ops import pipeline
from sqz_tpu.ops import sqz4_pallas as sp
from sqz_tpu.utils.corpus import load

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")

NB, BS = 130, 32                               # 2 chunks at lanes=128


@pytest.fixture(params=["serial", "thread"])
def dec_pipe_mode(request, monkeypatch):
    """Both decode_data_pipelined modes: the default decode_groups
    delegation (measured faster on this host, PERF.md round 4) and the
    threaded packer (SQZ_DEC_PIPE=thread, for many-core hosts)."""
    monkeypatch.setenv("SQZ_DEC_PIPE", request.param)
    return request.param


def test_pipelined_decode_matches_decode_groups(dec_pipe_mode):
    data = bytes(load("laozi.txt"))[:NB * BS]
    payloads = native.blocks_compress(data, 1, 10, 5)
    sizes = [BS] * NB
    ref = sp.decode_groups(payloads, sizes, blk_bits=5, interpret=True)
    got = pipeline.decode_data_pipelined(payloads, sizes, blk_bits=5,
                                         interpret=True, lanes=128,
                                         slots=1)
    assert got == ref
    assert b"".join(got) == data


def test_pipelined_decode_seeded_chunks(dec_pipe_mode):
    """Warm batches (one seed/dictionary for every block in the call) go
    through the same chunked path."""
    raw = bytes(load("confucius.txt"))[:(NB + 1) * BS]
    blk0 = raw[:BS]
    _, seed = native.sqz4_compress_payload(blk0, 1 << 10, lz=True,
                                           return_state=True)
    dic = blk0
    blocks = [raw[i:i + BS] for i in range(BS, len(raw), BS)]
    payloads = [native.sqz4_compress_payload(b, 1 << 10, lz=True,
                                             seed=seed, dictionary=dic)
                for b in blocks]
    sizes = [len(b) for b in blocks]
    got = pipeline.decode_data_pipelined(payloads, sizes, blk_bits=5,
                                         seed=seed, dictionary=dic,
                                         interpret=True, lanes=128,
                                         slots=1)
    assert b"".join(got) == b"".join(blocks)


def test_pipelined_decode_corrupt_block_raises(dec_pipe_mode):
    data = bytes(load("laozi.txt"))[:NB * BS]
    payloads = native.blocks_compress(data, 1, 10, 5)
    bad = list(payloads)
    mid = bytearray(bad[129])                  # a second-chunk block
    mid[len(mid) // 2] ^= 0x10
    bad[129] = bytes(mid)
    with pytest.raises(ValueError):
        pipeline.decode_data_pipelined(bad, [BS] * NB, blk_bits=5,
                                       interpret=True, lanes=128, slots=1)


def test_pipelined_decode_all_payloads_oversized(dec_pipe_mode):
    """Every payload past the kernel's stream buffer (the pathological
    warm-expansion rule): the pipelined path must return the host-decoded
    blocks instead of dispatching an empty chunk. Oversize is forced by
    padding valid payloads with trailing junk — the decoder stops at EOS,
    so the host decode still yields the original bytes."""
    data = bytes(load("laozi.txt"))[:4 * BS]
    blocks = [data[i:i + BS] for i in range(0, len(data), BS)]
    plan = sp.plan_decode_dispatch(len(blocks), 5, 128, 1, interpret=True)
    over_pl = [native.sqz4_compress_payload(b, 1 << 10, lz=True)
               .ljust(4 * plan["Pw"] + 8, b"\0") for b in blocks]
    assert all(len(p) > 4 * plan["Pw"] for p in over_pl)
    got = pipeline.decode_data_pipelined(over_pl, [BS] * len(blocks),
                                         blk_bits=5, interpret=True,
                                         lanes=128, slots=1)
    assert got == blocks
