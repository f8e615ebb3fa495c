"""Pallas sqz4 kernels, interpret mode (CPU): bit-exactness vs the oracle.

The same kernels run compiled on real TPU hardware; tools/check_pallas_enc.py
is the on-device differential harness (also exercised by bench.py). Here the
kernels run under the Pallas interpreter on tiny inputs so the logic — u64
pair arithmetic, the base-2^14 divider, staged byte emission — is covered by
the default CPU test suite.
"""

import numpy as np
import pytest

from sqz_tpu.oracle.sqz4 import sqz4_encode_payload
from sqz_tpu.ops import sqz4_jax
from sqz_tpu.ops import sqz4_pallas as sp


def _stats_for(data: bytes, lz: bool):
    toks = [("lit", b) for b in data]
    ms, ss = sqz4_jax.microops_from_tokens(toks)
    start, size, total = np.zeros((3, len(ms)), np.uint32)
    # pure-python model stats (no native dependency in unit tests)
    from sqz_tpu.oracle.rangecoder import ProbModel
    from sqz_tpu.formats.constants import PM_SYMS
    pms = [ProbModel(int(n)) for n in PM_SYMS]
    for i, (m, s) in enumerate(zip(ms, ss)):
        if m == sqz4_jax.OP_FLUSH:
            start[i], size[i], total[i] = 0, 0, 1
        else:
            pm = pms[m]
            start[i] = pm.start(int(s))
            size[i] = pm.freq[int(s)]
            total[i] = pm.total()
            pm.update(int(s))
    return start, size, total


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 97), (2, 200)])
def test_pallas_encoder_matches_oracle(seed, n):
    rng = np.random.default_rng(seed)
    # low-entropy bytes so renorm/underflow paths all fire
    data = bytes(rng.integers(0, 4, size=n, dtype=np.uint8))
    start, size, total = _stats_for(data, lz=False)
    payloads = sp.encode_groups(start[None], size[None], total[None],
                                cap=2 * n + 64, tc=64, interpret=True)
    want = sqz4_encode_payload(data, 1 << 15, lz=False)
    assert payloads[0] == want


def test_u64_helpers_roundtrip():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 64, size=128, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=128, dtype=np.uint64)
    ah, al = (a >> 32).astype(np.uint32), a.astype(np.uint32)
    bh, bl = (b >> 32).astype(np.uint32), b.astype(np.uint32)
    to_np = lambda pair: (np.asarray(pair[0], np.uint64) << 32) | np.asarray(
        pair[1], np.uint64)
    assert (to_np(sp.add64(*map(jnp.asarray, (ah, al, bh, bl)))) ==
            a + b).all()
    assert (to_np(sp.sub64(*map(jnp.asarray, (ah, al, bh, bl)))) ==
            a - b).all()
    s = rng.integers(0, 64, size=128, dtype=np.uint32)
    assert (to_np(sp.shl64(jnp.asarray(ah), jnp.asarray(al),
                           jnp.asarray(s))) == a << s).all()
    assert (to_np(sp.shr64(jnp.asarray(ah), jnp.asarray(al),
                           jnp.asarray(s))) == a >> s).all()
    assert (np.asarray(sp.clz64(jnp.asarray(ah), jnp.asarray(al))) ==
            np.array([64 - int(x).bit_length() for x in a])).all()
    d = rng.integers(1, 1 << 15, size=128, dtype=np.uint32)
    qh, ql, rem = sp.div64_small(jnp.asarray(ah), jnp.asarray(al),
                                 jnp.asarray(d))
    assert (to_np((qh, ql)) == a // d).all()
    assert (np.asarray(rem, np.uint64) == a % d).all()
    dw = rng.integers(1, 1 << 17, size=128, dtype=np.uint32)
    qh, ql, rem = sp.div64_small(jnp.asarray(ah), jnp.asarray(al),
                                 jnp.asarray(dw), wide=True)
    assert (to_np((qh, ql)) == a // dw).all()
    assert (np.asarray(rem, np.uint64) == a % dw).all()
    small = rng.integers(0, 1 << 17, size=128, dtype=np.uint32)
    mh, mlo = sp.mul_small64(jnp.asarray(small), jnp.asarray(bh),
                             jnp.asarray(bl))
    assert (to_np((mh, mlo)) ==
            (small.astype(np.uint64) * b)).all()  # mod 2^64 via numpy wrap


def test_pallas_full_encoder_and_decoder_roundtrip():
    """Self-contained encoder + decoder kernels, interpret mode, vs oracle."""
    from sqz_tpu.oracle.match import greedy_tokens
    rng = np.random.default_rng(7)
    datas = [
        bytes(rng.integers(0, 4, 60, np.uint8)),
        b"abcabcabcabcXYZ" * 4,                   # overlapped matches
        b"\0" * 150,                              # RLE
        bytes(rng.integers(0, 256, 90, np.uint8)),  # high entropy
    ]
    payloads, wants = [], []
    toksets = []
    for i, d in enumerate(datas):
        lz = i != 0
        if lz:
            rej = lambda l, dist: l <= 3 and dist.bit_length() > 3
            toks = greedy_tokens(d, 1 << 10, 2, 254, reject=rej)
        else:
            toks = [("lit", b) for b in d]
        toksets.append(toks)
        wants.append(sqz4_encode_payload(d, 1 << 10, lz=lz))
    ops = [sqz4_jax.microops_from_tokens(t) for t in toksets]
    T = max(len(m) for m, _ in ops)
    NB = len(ops)
    m_ops = np.full((NB, T), sqz4_jax.OP_PAD, np.int32)
    s_ops = np.zeros((NB, T), np.int32)
    for b, (m, sy) in enumerate(ops):
        m_ops[b, :len(m)] = m
        s_ops[b, :len(sy)] = sy
    payloads = sp.encode_groups_full(m_ops, s_ops, cap=512, tc=64,
                                     interpret=True)
    assert payloads == wants
    outs = sp.decode_groups(payloads, [len(d) for d in datas], blk_bits=8,
                            interpret=True)
    assert outs == list(datas)


def test_pallas_fused_encoder_matches_native(monkeypatch):
    """The paired-stream fused encoder (two ops per iteration, 256-table
    work in slot 2 only) must emit byte-identical payloads."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    monkeypatch.setenv("SQZ_ENC_FUSED", "1")
    from sqz_tpu.utils.corpus import load
    data = load("laozi.txt")[:1024]
    ref = native.blocks_compress(data, 1, 10, 9)    # 2 blocks of 512
    got = sp.encode_data_full(data, 9, 1 << 10, True, cap=512 + 2048,
                              lanes=128, interpret=True, parse="exact")
    assert got == ref


def test_fast_parse_streams_decode_everywhere():
    """parse='fast' (bounded matcher, VERDICT r2 #1) emits different
    tokens but spec-valid sqz4 streams: the native decoder and the device
    decoder must both reproduce the data, and the size must stay close to
    the exact parse (the sqzt contract is round-trip + ratio)."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from sqz_tpu.utils.corpus import load
    data = load("confucius.txt")[:2048]
    fast = sp.encode_data_full(data, 9, 1 << 10, True, cap=512 + 2048,
                               lanes=128, interpret=True, parse="fast")
    exact = sp.encode_data_full(data, 9, 1 << 10, True, cap=512 + 2048,
                                lanes=128, interpret=True, parse="exact")
    sizes = [512, 512, 512, 512]
    # native decode of the fast streams (cross-engine validity)
    got = b"".join(native.sqz4_decompress_payload(p, s)
                   for p, s in zip(fast, sizes))
    assert got == data
    # device decode too
    outs = sp.decode_groups(fast, sizes, blk_bits=9, interpret=True)
    assert b"".join(outs) == data
    # bounded search may lose a little ratio, never more than ~1.5 pp here
    assert sum(map(len, fast)) <= sum(map(len, exact)) + len(data) * 15 // 1000


@pytest.mark.parametrize("fusedv", ["0", "1"])
def test_pallas_decoder_fused_modes(monkeypatch, fusedv):
    """Both decode formulations — per-micro-op and the fused pair step
    (two coder ops per iteration, one 256-row pass) — must agree."""
    monkeypatch.setenv("SQZ_DEC_FUSED", fusedv)
    data = (b"a rose is a rose is a rose\x00\x01" * 12)[:256]
    payloads = [sqz4_encode_payload(data, 1 << 10, lz=True),
                sqz4_encode_payload(data[::-1], 1 << 10, lz=True)]
    outs = sp.decode_groups(payloads, [256, 256], blk_bits=8,
                            interpret=True)
    assert outs == [data, data[::-1]]


def test_pallas_decoder_wide_tables_roundtrip():
    """The wide-divider path also selects the csum*512+row table layout;
    exercise it on small blocks (the wide divider is exact for any total
    < 2^17, so tiny inputs are valid through it)."""
    from sqz_tpu.oracle.match import greedy_tokens
    rng = np.random.default_rng(9)
    datas = [
        b"tea for two and two for tea " * 8,
        bytes(rng.integers(0, 256, 120, np.uint8)),
    ]
    payloads = [sqz4_encode_payload(d, 1 << 10, lz=True) for d in datas]
    sizes = [len(d) for d in datas]
    import jax.numpy as jnp
    from sqz_tpu import native
    if native.available():
        buf = native.sqz4_pack_payloads(payloads, 128, 96)
    else:
        buf = np.zeros((1, 96, 128), np.uint32)
        for b, p in enumerate(payloads):
            w = np.frombuffer(p.ljust(-(-len(p) // 4) * 4, b"\0"), ">u4")
            buf[0, :len(w), b] = w
    meta = np.zeros((1, 8, 128), np.int32)
    for b, p in enumerate(payloads):
        meta[0, 0, b] = len(p)
        meta[0, 1, b] = sizes[b]
    lit, tok, mrec, counts = sp._decode_pallas(
        jnp.asarray(buf), jnp.asarray(meta), t_max=4096, lw=96, tw=32,
        mw=64, interpret=True, wide=True, slots=1)
    lit, tok, mrec, counts = map(np.asarray, (lit, tok, mrec, counts))
    for b, d in enumerate(datas):
        assert counts[0, 4, b] == 0, f"block {b} error {counts[0, 4, b]}"
        got = assemble_tokens_wide_helper(
            tok[0, :, b], lit[0, :, b], mrec[0, :, b],
            int(counts[0, 2, b]), len(d))
        assert got == d, f"block {b} mismatch"


def assemble_tokens_wide_helper(tokw, litw, mrecw, ntok, size):
    lits = litw.astype(">u4").tobytes()
    return sp.assemble_tokens_numpy(tokw, lits, mrecw, ntok, size)


def test_pallas_decoder_rejects_corrupt():
    data = b"refrain refrain refrain!" * 4
    payload = sqz4_encode_payload(data, 1 << 10, lz=True)
    bad = bytearray(payload)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        sp.decode_groups([bytes(bad)], [len(data)], blk_bits=8,
                         interpret=True)


def test_squeeze_bitpack_matches_native():
    """Device bitstream assembly from recorded adaptive-Huffman writes is
    byte-identical to the native squeeze encoder (interpret mode)."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    data = (b"she sells sea shells by the sea shore " * 20
            + bytes(rng.integers(0, 256, 700, np.uint8)))
    bs = 1 << 10
    want = [native.squeeze_compress_payload(data[o:o + bs], 10)
            for o in range(0, len(data), bs)]
    got = sp.squeeze_encode_data(data, 10, 10, cap=bs + 4096, tc=64,
                                 interpret=True, parse="exact")
    assert got == want
    # the fast-parse plan (sqzt default for this path) must equal the
    # native fast payload coder byte-for-byte — same bounded matcher
    want_f = [native.squeeze_compress_payload(data[o:o + bs], 10,
                                              parse="fast")
              for o in range(0, len(data), bs)]
    got_f = sp.squeeze_encode_data(data, 10, 10, cap=bs + 4096, tc=64,
                                   interpret=True, parse="fast")
    assert got_f == want_f
    for p, o in zip(got_f, range(0, len(data), bs)):
        part = data[o:o + bs]
        assert native.squeeze_decompress_payload(p, len(part)) == part


def test_pipelined_encode_matches_serial():
    """The pipelined engine (planner thread + per-group async dispatch,
    ops/pipeline.py) must emit the same payloads as the serial path for
    the same parse mode — grouping only batches dispatches."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from sqz_tpu.ops.pipeline import encode_data_pipelined
    from sqz_tpu.utils.corpus import load
    data = load("laozi.txt")[:2560]          # 10 blocks of 256
    serial = sp.encode_data_full(data, 8, 1 << 10, True, cap=256 + 2048,
                                 lanes=128, interpret=True, parse="exact")
    piped = encode_data_pipelined(data, 8, 1 << 10, True, cap=256 + 2048,
                                  lanes=128, interpret=True, parse="exact")
    assert piped == serial
    # multi-group grouping logic (planner/dispatch bookkeeping) without a
    # device: group arithmetic must tile blocks in order
    # (the on-hardware multi-group run is tools/check_pallas_enc.py --pipe)


def test_token_kernel_matches_op_stream():
    """The token-input encoder (in-kernel token->pair expansion, 96-row
    stream windows) must emit byte-identical payloads to the op-stream
    kernel for the same fast parse, across literal runs, matches, RLE,
    and incompressible content."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from sqz_tpu.utils.corpus import load, random_bytes
    rng = np.random.default_rng(11)
    data = (load("laozi.txt")[:1024] + b"\0" * 512
            + random_bytes(512, seed=4) + b"ab" * 256)
    want = sp.encode_data_full(data, 9, 1 << 10, True, cap=512 + 2048,
                               lanes=128, interpret=True, parse="fast")
    got = sp.encode_data_tok(data, 9, 1 << 10, True, cap=512 + 2048,
                             lanes=128, interpret=True)
    assert got == want
    # literal-only mode (lz=False -> pure literal-run tokens)
    want = sp.encode_data_full(data[:512], 9, 1 << 10, False,
                               cap=512 + 2048, lanes=128, interpret=True,
                               parse="fast")
    got = sp.encode_data_tok(data[:512], 9, 1 << 10, False, cap=512 + 2048,
                             lanes=128, interpret=True)
    assert got == want


def test_pipelined_token_transport_matches():
    """The pipelined engine's token transport must match the serial token
    path block for block."""
    from sqz_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    from sqz_tpu.ops.pipeline import encode_data_pipelined
    from sqz_tpu.utils.corpus import load
    data = load("confucius.txt")[:2048]
    serial = sp.encode_data_tok(data, 9, 1 << 10, True, cap=512 + 2048,
                                lanes=128, interpret=True)
    piped = encode_data_pipelined(data, 9, 1 << 10, True, cap=512 + 2048,
                                  lanes=128, interpret=True, parse="fast",
                                  transport="tok")
    assert piped == serial


def test_fetch_payloads_compact_matches_trimmed():
    """The ragged DMA compaction (serial-grid Pallas kernel, 1024-word
    aligned slots, overlap-overwritten pad tails) must return the same
    payload bytes as the trimmed-rectangle download + unpack, including
    partial groups and zero-length lanes."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    B, R = 16, 512
    blen = rng.integers(100, R * 4, B).astype(np.int32)
    blen[3] = 0                              # zero-length payload lane
    blen[7] = R * 4                          # full column
    lens = np.zeros((1, 8, B), np.int32)
    lens[0, 0] = blen
    words = jnp.asarray(
        rng.integers(0, 1 << 30, (1, R, B), dtype=np.uint32))
    exp = sp.unpack_group_payloads(sp.fetch_words_trimmed(words, lens),
                                   lens, B)
    got = sp.fetch_payloads_compact(words, lens, B, interpret=True)
    assert got == exp
    # partial group: inactive tail lanes (garbage lens) must not corrupt
    lens[0, 0, 10:] = 999999
    got = sp.fetch_payloads_compact(words, lens, 10, interpret=True)
    assert got == exp[:10]
