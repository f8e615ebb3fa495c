"""Device-resident sqz4 literal-only encode/decode — zero host planning.

The reference HEAD encoder emits literals only (src/sqz.c:591 zeroes the
match map at function entry), so its exact stream semantics need no match
finder. That makes the literal-only mode fully TPU-resident: the token
stream (one run token per <=255 literals + EOS, the layout of
native sqz4_tok_plan's lz=0 branch) and the packed literal stream are
computed from the raw bytes by fused XLA ops, and the token-input Mosaic
kernel (sqz4_pallas._encode_tok_kernel) does the coding. No per-byte host
work, no host->device op traffic — the input is already in HBM (the
checkpoint-shard / activation-buffer use case) and only compressed bytes
ever need to cross the link.

Decode mirrors it: the encode output word layout IS the decode kernel's
payload input layout, and for literal-only streams the decoder's dense
literal stream IS the output, so a round trip never leaves the chip.

Streams are bit-identical to the host/oracle coders' lz=False payloads
(asserted in tests/test_resident.py against sqz4_compress_payload).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import numpy as jnp

from sqz_tpu.ops import sqz4_pallas as sp

I32 = jnp.int32
U32 = jnp.uint32

EOS_TOKEN = np.uint32(0x1FF)         # 0xFF | (1 << 8): match flag + len 255


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _token_dim(bs: int) -> int:
    # run tokens + EOS + one fetch-past-the-end slot, window-aligned
    return max(96, _round_up(-(-bs // 255) + 2, 32))


def _lit_word_dim(bs: int) -> int:
    return max(96, _round_up(-(-bs // 4), 32))


def _tokens_from_lengths(lengths, Tt: int):
    """[B] i32 block lengths -> [1, Tt, B] u32 literal-run token streams
    (run tokens of 255 then the remainder, EOS, zero-terminated) — the
    exact lz=0 layout of native sqz4_tok_plan."""
    B = lengths.shape[0]
    t = jax.lax.broadcasted_iota(I32, (Tt, B), 0)
    L = lengths[None, :].astype(I32)
    runs = (L + 254) // 255
    rem = jnp.clip(L - t * 255, 0, 255)
    tok = jnp.where(t < runs, rem.astype(U32), jnp.asarray(0, U32))
    return jnp.where(t == runs, jnp.asarray(EOS_TOKEN, U32), tok)[None]


def _pack_literal_words(blocks, Lw: int):
    """[B, bs] u8 blocks -> [1, Lw, B] u32 (4 big-endian bytes per word,
    zero-padded to Lw rows) — the token kernel's literal stream layout."""
    B, bs = blocks.shape
    x = blocks.astype(U32).reshape(B, bs // 4, 4)
    w = (x[..., 0] << 24) | (x[..., 1] << 16) | (x[..., 2] << 8) | x[..., 3]
    w = w.transpose(1, 0)
    if Lw > w.shape[0]:
        w = jnp.pad(w, ((0, Lw - w.shape[0]), (0, 0)))
    return w[None]


@partial(jax.jit,
         static_argnames=("Tt", "Lw", "t_max", "cap_words", "interpret",
                          "wide"))
def encode_literal_group(blocks, lengths, Tt: int, Lw: int, t_max: int,
                         cap_words: int, interpret: bool, wide: bool):
    """One lane group, fully on-device: raw [B, bs] u8 blocks (+ per-lane
    valid lengths) -> (payload words [1, cap_words, B] u32, lens
    [1, 8, B] i32). B must be a multiple of 128."""
    toks = _tokens_from_lengths(lengths, Tt)
    lits = _pack_literal_words(blocks, Lw)
    return sp._encode_tok_pallas(toks, lits, t_max, cap_words, interpret,
                                 wide)


def _words_to_bytes(w):
    """[..., W] u32/i32 words -> [..., W*4] bytes (big-endian within each
    word — the kernel stream layout). Single definition for every
    unpack in this module."""
    w = w.astype(I32)
    by = jnp.stack([(w >> 24) & 0xFF, (w >> 16) & 0xFF,
                    (w >> 8) & 0xFF, w & 0xFF], axis=-1)
    return by.reshape(by.shape[:-2] + (by.shape[-2] * 4,))


def _unpack_literal_bytes(lit_words, sizes, bs: int):
    """[1, LW, B] u32 decoder literal stream -> [B, bs] u8 output blocks
    (bytes past each lane's size zeroed). Literal-only streams have no
    match records, so the literal stream is the decoded data."""
    _, LW, B = lit_words.shape
    by = _words_to_bytes(lit_words[0].transpose(1, 0))     # [B, LW*4]
    by = by[:, :bs].astype(jnp.uint8)
    pos = jax.lax.broadcasted_iota(I32, (B, bs), 1)
    return jnp.where(pos < sizes[:, None], by, jnp.asarray(0, jnp.uint8))


@partial(jax.jit,
         static_argnames=("Pw", "t_max", "lw", "tw", "mw", "bs",
                          "interpret", "wide"))
def decode_literal_group(words, lens, sizes, Pw: int, t_max: int, lw: int,
                         tw: int, mw: int, bs: int, interpret: bool,
                         wide: bool):
    """Mirror of encode_literal_group, fully on-device: encoder output
    (words, lens) + expected sizes -> ([B, bs] u8 blocks, counts
    [1, 8, B] i32). counts rows: 0 produced bytes, 4 error code, 6
    overflow flag — callers wanting validation download this 16 KiB row
    block, not the data."""
    B = words.shape[2]
    buf = words[:, :Pw, :]
    z = jnp.zeros((B,), I32)
    meta = jnp.stack([lens[0, 0, :].astype(I32),
                      sizes.astype(I32), z, z, z, z, z, z])[None]
    lit, _tok, _mrec, counts = sp._decode_pallas(
        buf, meta, t_max, lw, tw, mw, interpret, wide, 1, None,
        fused=True)
    return _unpack_literal_bytes(lit, sizes, bs), counts


def encode_literal_blocks(data: bytes, blk_bits: int,
                          lanes: int = sp.ENC_LANES, cap: int = None,
                          interpret: bool = False):
    """Host-facing convenience wrapper: bytes -> per-block payloads via
    the device-resident path (the only host work is the one raw upload
    and the trimmed payload download)."""
    return encode_resident_blocks(data, blk_bits, "lit", lanes, cap,
                                  interpret)


CELL = 128
# candidate periods for the device cell parse: dist-d matches with d a
# power of two <= CELL (nbits = bit_length(d); smaller d preferred —
# fewer distance-bit pairs and a warmer pm_dist model)
RLE_DISTS = (1, 2, 4, 8, 16, 32, 64, 128)


def _match_token(dist: int) -> np.uint32:
    nbits = int(dist).bit_length()
    return np.uint32(CELL | (1 << 8) | (nbits << 9) | (dist << 16))


def _rle_tokens_from_blocks(blocks, lengths, Tt: int):
    """Cell-granular periodic parse, entirely on-device: a 128-byte cell
    that continues a period-d repeat (bytes[i] == bytes[i-d] for the
    whole cell, d in RLE_DISTS — the overlapped-copy semantics of
    src/sqz.c:826-831) becomes one len-128/dist-d match token (8 kernel
    pairs instead of 128; d=1 is plain RLE, d=4 the reference's classic
    4-byte-pattern synthetic case); an all-zero cell with no periodic
    predecessor copies the nearest previous all-zero cell instead
    (dist = k*CELL, k <= 255 — the isolated-zero-cell case sparse
    checkpoints hit); other full cells are 128-literal run tokens, the
    partial tail is a literal run, EOS closes. Returns ([1, Tt, B] u32
    tokens, [B] i32 fused-pair counts)."""
    B, bs = blocks.shape
    C = bs // CELL
    c = jnp.arange(C, dtype=I32)[None, :]
    cells = blocks.reshape(B, C, CELL)
    cell_tok = jnp.full((B, C), CELL, U32)              # literal default
    matched = jnp.zeros((B, C), bool)
    # cell [s, s+128) continues period d iff bytes[i] == bytes[i-d]
    # across it; split cell-aligned (no gathers — TPU gathers are
    # element-serial): (a) intra-cell periodicity, (b) the first d bytes
    # stitch to the previous cell's last d bytes
    for d in reversed(RLE_DISTS):                       # small d wins
        if d < CELL:
            intra = jnp.all(cells[:, :, d:] == cells[:, :, :-d], axis=2)
            stitch = jnp.all(
                cells[:, 1:, :d] == cells[:, :-1, CELL - d:], axis=2)
        else:                                           # d == CELL
            intra = jnp.ones((B, C), bool)
            stitch = jnp.all(cells[:, 1:, :] == cells[:, :-1, :], axis=2)
        ok = intra & jnp.concatenate(
            [jnp.zeros((B, 1), bool), stitch], axis=1)  # cell 0 never
        cell_tok = jnp.where(ok, jnp.asarray(_match_token(d), U32),
                             cell_tok)
        matched = matched | ok
    L = lengths[:, None].astype(I32)
    full = (c > 0) & ((c + 1) * CELL <= L)              # full cells only
    # far zero-cell copies: an all-zero cell whose predecessor does not
    # end in zeros (so no small-d periodic match exists) still copies any
    # previous all-zero full cell verbatim — dist = k*CELL to the nearest
    # one (k <= 255 keeps dist < 2^15). The resident decoder assumes such
    # copies are zero and VERIFIES the source cell after assembly
    # (decode_rle_group), so foreign streams can never decode wrongly.
    fullsrc = ((c + 1) * CELL <= L)                     # incl. cell 0
    iszero = fullsrc & jnp.all(cells == 0, axis=2)
    zidx = jnp.where(iszero, c, -1)
    prevz = jax.lax.associative_scan(jnp.maximum, zidx, axis=1)
    prevz = jnp.concatenate(
        [jnp.full((B, 1), -1, I32), prevz[:, :-1]], axis=1)   # exclusive
    k = c - prevz
    farok = iszero & ~matched & (c > 0) & (prevz >= 0) & (k <= 255)
    fdist = k * CELL
    fnb = jnp.zeros_like(fdist)
    for i in range(16):                                 # bit_length(fdist)
        fnb = fnb + (fdist >= (1 << i)).astype(I32)
    ftok = (jnp.asarray(CELL | (1 << 8), U32)
            | (fnb.astype(U32) << 9) | (fdist.astype(U32) << 16))
    cell_tok = jnp.where(farok, ftok, cell_tok)
    matched = matched | farok
    # generic far cell dedup (nonzero contents): a full cell identical to
    # an earlier LITERAL full cell within 255 cells copies it with the
    # same cell-aligned-dist token. The resident decoder fills such cells
    # from its pass-2 literal preplacement at the SOURCE cell and
    # verifies out[c] == out[src] after assembly, so sources must decode
    # as literal cells: restricting sources to the EARLIEST non-matched
    # occurrence of each content guarantees it — a source that were
    # itself a far copy would need an earlier identical eligible cell,
    # contradicting earliest. Candidates come from a keyed u32
    # fingerprint; emission is gated on an exact byte compare (one-hot
    # MXU gather), so a fingerprint collision only costs a missed match.
    eligible = fullsrc & ~matched
    kw = ((np.arange(CELL, dtype=np.uint64) * 0x9E3779B1 + 1)
          & 0xFFFFFFFF).astype(np.uint32)
    fp = jnp.sum(cells.astype(U32) * jnp.asarray(kw)[None, None, :],
                 axis=2)                                    # [B, C] u32
    cf = cells.astype(jnp.float32)
    c_s = jnp.arange(C, dtype=I32)
    BIGC = C + 1
    CH = min(64, C)
    src_chunks, ver_chunks = [], []
    for c0 in range(0, C, CH):
        n = min(CH, C - c0)
        out_i = c_s[c0:c0 + n]
        ok = ((fp[:, c0:c0 + n, None] == fp[:, None, :])
              & eligible[:, None, :]
              & (c_s[None, None, :] < out_i[None, :, None]))
        cand = jnp.where(ok, c_s[None, None, :], BIGC)
        src_c = jnp.min(cand, axis=2)                       # [B, n]
        sel = (src_c[:, :, None] == c_s[None, None, :]).astype(jnp.float32)
        got = jnp.einsum("bks,bsw->bkw", sel, cf,
                         preferred_element_type=jnp.float32)
        ver_chunks.append(jnp.all(got == cf[:, c0:c0 + n, :], axis=2))
        src_chunks.append(src_c)
    dsrc = jnp.concatenate(src_chunks, axis=1)              # [B, C]
    dver = jnp.concatenate(ver_chunks, axis=1)
    kd = c - dsrc
    dupok = full & ~matched & dver & (kd >= 1) & (kd <= 255)
    ddist = jnp.where(dupok, kd * CELL, 0)
    dnb = jnp.zeros_like(ddist)
    for i in range(16):
        dnb = dnb + (ddist >= (1 << i)).astype(I32)
    dtok = (jnp.asarray(CELL | (1 << 8), U32)
            | (dnb.astype(U32) << 9) | (ddist.astype(U32) << 16))
    cell_tok = jnp.where(dupok, dtok, cell_tok)
    matched = matched | dupok
    isrun = matched & full
    cell_tok = jnp.where(isrun, cell_tok, jnp.asarray(CELL, U32))
    nfull = lengths.astype(I32) // CELL
    rem = lengths.astype(I32) - nfull * CELL
    eslot = nfull + (rem > 0)
    t = jax.lax.broadcasted_iota(I32, (Tt, B), 0)
    ct = jnp.concatenate(
        [cell_tok.transpose(1, 0),
         jnp.zeros((Tt - C, B), U32)], axis=0)          # slot t = cell t
    tok = jnp.where(t < nfull[None, :], ct, jnp.asarray(0, U32))
    tok = jnp.where((t == nfull[None, :]) & (rem[None, :] > 0),
                    rem[None, :].astype(U32), tok)
    tok = jnp.where(t == eslot[None, :], jnp.asarray(EOS_TOKEN, U32), tok)
    # pair count per cell: literal = 128; match = max(drain, coding)
    # where drain = 128/32 = 4 pairs and coding = 2 + extra dist-bit
    # pairs for nbits > 2 (5 pairs at d = 64/128)
    nb_c = (cell_tok >> 9).astype(I32) & 0x1F
    coding = 2 + jnp.where(nb_c > 2, (nb_c - 1) // 2, 0)
    cell_pairs = jnp.where(isrun, jnp.maximum(4, coding),
                           jnp.asarray(CELL, I32))
    pairs = jnp.sum(jnp.where(c < nfull[:, None], cell_pairs, 0),
                    axis=1) + rem + 5
    return tok[None], pairs


@partial(jax.jit, static_argnames=("Tt",))
def rle_plan_device(blocks, lengths, Tt: int):
    """Device parse pass: (tokens, literal words, per-lane pair counts).
    The only host involvement in the RLE path is reading max(pairs) (one
    i32) to pick the kernel's static step bound."""
    toks, pairs = _rle_tokens_from_blocks(blocks, lengths, Tt)
    lits = _pack_literal_words(blocks, max(96, blocks.shape[1] // 4))
    return toks, lits, pairs


def rle_group_args(blk_bits: int, cap: int = None,
                   interpret: bool = False) -> dict:
    """Static kwargs for the RLE-mode encode group (token dim covers one
    slot per cell + tail + EOS)."""
    bs = 1 << blk_bits
    if cap is None:
        cap = bs + 2048
    return dict(Tt=max(96, _round_up(bs // CELL + 2, 32)),
                cap_words=_round_up(-(-(cap + 3) // 4), 32),
                interpret=interpret, wide=blk_bits >= 15)


def encode_rle_group(blocks, lengths, Tt: int, cap_words: int,
                     interpret: bool, wide: bool, t_max: int = None):
    """One lane group through the RLE-resident path: device parse +
    lit_skip token kernel over the RAW literal stream (no compaction
    anywhere). Returns (words, lens) device arrays. Decode of these
    streams goes through the standard decode path (they are ordinary
    sqz4 payloads); only encode is chip-resident."""
    toks, lits, pairs = rle_plan_device(blocks, lengths, Tt)
    if t_max is None:
        bq = 32 if interpret else 1024
        t_max = max(bq, _round_up(int(np.asarray(jnp.max(pairs))), bq))
    return sp._encode_tok_pallas(toks, lits, t_max, cap_words, interpret,
                                 wide, lit_skip=True)


def _prep_blocks(data, blk_bits: int, lanes: int):
    """bytes OR a 1-D u8 array (host or device-resident) -> ([rows, bs]
    device u8 blocks, [rows] np.int32 valid lengths, NB, total bytes).
    Device arrays are padded/reshaped on-device — no download."""
    bs = 1 << blk_bits
    if isinstance(data, (bytes, bytearray, memoryview)):
        n = len(data)
        NB = max(1, -(-n // bs))
        rows = max(lanes, _round_up(NB, lanes))
        arr = np.zeros((rows, bs), np.uint8)
        arr.reshape(-1)[:n] = np.frombuffer(data, np.uint8)
        blocks = jnp.asarray(arr)
    else:
        flat = jnp.asarray(data, dtype=jnp.uint8).reshape(-1)
        n = int(flat.shape[0])
        NB = max(1, -(-n // bs))
        rows = max(lanes, _round_up(NB, lanes))
        blocks = jnp.pad(flat, (0, rows * bs - n)).reshape(rows, bs)
    lengths = np.zeros((rows,), np.int32)
    lengths[:NB] = np.clip(n - np.arange(NB, dtype=np.int64) * bs, 0, bs)
    return blocks, lengths, NB, n


def encode_resident_blocks(data, blk_bits: int, mode: str = "rle",
                           lanes: int = sp.ENC_LANES, cap: int = None,
                           interpret: bool = False):
    """Resident-path encode of bytes or a (device) u8 array to per-block
    sqz4 payloads. ``mode``: 'lit' = literal-only (reference HEAD
    semantics, fully plan-free); 'rle' = the device periodic cell parse
    on top of it; 'lz' = the bounded general-content device matcher
    (ops/lzparse.py — sort-based exact-gram candidates + chained
    extension). The only downloads are the payload bytes (and one i32
    step bound in 'rle'/'lz' modes)."""
    if blk_bits > 16:
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    if mode not in ("lit", "rle", "lz"):
        raise ValueError(f"unknown resident mode {mode!r}")
    if mode == "rle" and (1 << blk_bits) < CELL:
        mode = "lit"    # blocks smaller than a cell: no matches possible
    from sqz_tpu.ops import lzparse
    if mode == "lz" and (1 << blk_bits) < lzparse.SEG:
        mode = "lit"    # blocks smaller than one parse segment
    if mode == "lz":
        # cap lane groups at the kernel's full vector width (512, like
        # ENC_LANES): measured on the v5e at blk_bits=16 (tools/check_lz
        # round 5, 512x64KiB compiles and runs; a group that ever
        # exceeded the VMEM budget fails loudly at compile, never
        # silently). The sort stages inside lz_plan_device slice to
        # SQZ_LZ_SORT_ROWS (64) rows regardless — batch sizes far from
        # 64 rows make the XLA TPU sort's remote compile pathological.
        lanes = min(lanes, 512)
    blocks, lengths, NB, _n = _prep_blocks(data, blk_bits, lanes)
    if mode == "rle":
        gargs = rle_group_args(blk_bits, cap, interpret)
    elif mode == "lz":
        gargs = lzparse.lz_group_args(blk_bits, cap, interpret)
    else:
        gargs = encode_group_args(blk_bits, cap, interpret)
    payloads: list = []
    for g0 in range(0, blocks.shape[0], lanes):
        grp = blocks[g0:g0 + lanes]
        glen = lengths[g0:g0 + lanes]
        if mode == "rle":
            words, lens = encode_rle_group(grp, jnp.asarray(glen), **gargs)
        elif mode == "lz":
            words, lens = lzparse.encode_lz_group(grp, jnp.asarray(glen),
                                                  **gargs)
        else:
            words, lens = encode_literal_group(grp, jnp.asarray(glen),
                                               **gargs)
        lens_np = np.asarray(lens)
        nb_g = min(lanes, NB - g0)
        if int(lens_np[:, 0, :nb_g].max(initial=0)) > \
                gargs["cap_words"] * 4:
            raise ValueError("compressed block exceeded the output capacity")
        payloads += sp.unpack_group_payloads(
            sp.fetch_words_trimmed(words, lens_np), lens_np, nb_g)
    return payloads


def encode_rle_blocks(data: bytes, blk_bits: int, lanes: int = sp.ENC_LANES,
                      cap: int = None, interpret: bool = False):
    """Host-facing wrapper for the RLE-resident path: bytes -> per-block
    sqz4 payloads (bit-exact with a host coder given the same cell
    parse — asserted against the scan engine in tests)."""
    return encode_resident_blocks(data, blk_bits, "rle", lanes, cap,
                                  interpret)


# ------------------------------------- resident RLE decode (restore path)

def _row_u32_at(words, idx):
    """words [R, B], idx [B] i32 -> per-lane words[idx[b], b] as i32
    (one-hot compare-reduce; TPU gathers are element-serial)."""
    R, B = words.shape
    rows = jax.lax.broadcasted_iota(I32, (R, B), 0)
    return jnp.sum(jnp.where(rows == idx[None, :], words.astype(I32),
                             jnp.asarray(0, I32)), axis=0)


def _classify_cells(tokw, mrecw, sizes, C: int):
    """Pass 1: walk cells through the decoder's token-bit stream. A cell
    is a match-cell iff its first token is a match; a match must be a
    len-128 cell match at a power-of-2 dist <= 128 (periodic fill) or a
    cell-aligned dist (far zero-cell copy — content verified after
    assembly) or the stream is not cell-parsed (bad -> host fallback).
    Returns (ismatch [C,B], dist [C,B], bad [B], tcur [B]).

    tokw: [TW, B] u32 token-bit words (LSB-first, one bit per decoded
    token); mrecw: [MW, B] match records (len<<16|dist) in match order.
    """
    B = tokw.shape[1]

    def step(carry, c):
        tcur, mcur, bad = carry
        remaining = jnp.maximum(sizes.astype(I32) - c * CELL, 0)
        active = remaining > 0
        word = _row_u32_at(tokw, tcur >> 5)
        bit = (word >> (tcur & 31)) & 1
        ismatch = active & (bit == 1)
        rec = _row_u32_at(mrecw, mcur)
        dist = rec & 0xFFFF
        mlen = (rec >> 16) & 0xFFFF
        okd = (dist > 0) & (dist <= CELL) & ((dist & (dist - 1)) == 0)
        okfar = ((dist > CELL) & (dist % CELL == 0)
                 & (dist <= c * CELL))
        bad = bad | (ismatch & ((mlen != CELL) | ~(okd | okfar)
                                | (remaining < CELL)))
        tcur = tcur + jnp.where(ismatch, jnp.asarray(1, I32),
                                jnp.where(active,
                                          jnp.minimum(remaining, CELL),
                                          jnp.asarray(0, I32)))
        mcur = mcur + ismatch.astype(I32)
        return (tcur, mcur, bad), (ismatch, jnp.where(ismatch, dist, 0))

    z = jnp.zeros((B,), I32)
    (tcur, _, bad), (ism, dist) = jax.lax.scan(
        step, (z, z, jnp.zeros((B,), bool)), jnp.arange(C, dtype=I32))
    return ism, dist, bad, tcur


def _gather_cells(src, values, mask=None, CH: int = 64):
    """Chunked one-hot gather along the cell axis (TPU gathers are
    element-serial, so the per-(cell, lane) row read becomes an MXU
    einsum — exact for byte/flag values in f32). Returns
    values[src[c, b], :, b] for each (c, b) as [C, W, B] f32; ``mask``
    (optional [C, B] bool) zeroes unselected output cells. The select
    tensor is built CH output cells at a time to bound its size."""
    C = src.shape[0]
    s_i = jnp.arange(C, dtype=I32)
    chunks = []
    for c0 in range(0, C, CH):
        sel = (src[c0:c0 + CH][:, None, :] == s_i[None, :, None])
        if mask is not None:
            sel = sel & mask[c0:c0 + CH][:, None, :]
        chunks.append(jnp.einsum("ksb,swb->kwb", sel.astype(jnp.float32),
                                 values,
                                 preferred_element_type=jnp.float32))
    return jnp.concatenate(chunks, axis=0)


def _preplace_literal_cells(litw, islit, C: int):
    """Pass 2: place the decoder's dense literal stream at its output
    cells. Literal cells appear in stream order, so output cell c reads
    source literal cell cumsum_excl(islit)[c] — a _gather_cells one-hot
    einsum. Returns [C, B, CELL] u8 (match cells garbage)."""
    LW, B = litw.shape
    by = _words_to_bytes(litw[:C * 32].reshape(C, 32, B)
                         .transpose(0, 2, 1))                # [C, B, 128]
    lit_cells = by.transpose(0, 2, 1).astype(jnp.float32)    # [C, CELL, B]
    isl = islit.astype(I32)
    src = jnp.cumsum(isl, axis=0) - isl                       # [C, B]
    pre = _gather_cells(src, lit_cells, mask=islit)           # [C, CELL, B]
    return pre.transpose(0, 2, 1).astype(jnp.uint8)           # [C, B, CELL]


def _fill_cells(pre, ismatch, dist, farfill):
    """Pass 3: resolve periodic fills cell-by-cell (a match cell's bytes
    derive from the previous OUTPUT cell's tail — an inherent chain, but
    only C steps of [B, CELL] work). dist is a power of two <= CELL, so
    each candidate fill is a static tile + select; far cell-aligned
    dists (> CELL) take ``farfill`` — the pass-2 literal preplacement at
    the source cell (zeros when the source is not a literal cell, which
    covers the zero-rule copies) — then decode_rle_group VERIFIES
    out[c] == out[src] after assembly (mismatch -> host fallback)."""
    B = pre.shape[1]

    def step(prev, xs):
        pre_c, ism, d, far_c = xs
        fill = pre_c
        for dc in RLE_DISTS:
            tiled = jnp.tile(prev[:, CELL - dc:], (1, CELL // dc))
            fill = jnp.where((d == dc)[:, None], tiled, fill)
        fill = jnp.where((d > CELL)[:, None], far_c, fill)
        out = jnp.where(ism[:, None], fill, pre_c)
        return out, out

    zero = jnp.zeros((B, CELL), pre.dtype)
    _, out = jax.lax.scan(step, zero, (pre, ismatch, dist, farfill))
    return out                                                # [C, B, CELL]


@partial(jax.jit,
         static_argnames=("Pw", "t_max", "lw", "tw", "mw", "bs",
                          "interpret", "wide"))
def decode_rle_group(buf, plens, sizes, Pw: int, t_max: int, lw: int,
                     tw: int, mw: int, bs: int, interpret: bool,
                     wide: bool):
    """Chip-resident decode of CELL-parsed sqz4 payloads: the standard
    decode kernel, then the three-pass device assembly. Returns
    ([B, bs] u8 blocks, counts [1,8,B], bad [B] — lanes whose stream is
    not cell-parsed (host fallback) or errored)."""
    B = buf.shape[2]
    z = jnp.zeros((B,), I32)
    meta = jnp.stack([plens.astype(I32), sizes.astype(I32),
                      z, z, z, z, z, z])[None]
    lit, tok, mrec, counts = sp._decode_pallas(
        buf[:, :Pw, :], meta, t_max, lw, tw, mw, interpret, wide, 1,
        None, fused=True)
    C = bs // CELL
    ism, dist, bad, tcur = _classify_cells(tok[0], mrec[0], sizes, C)
    # completeness: the cell model predicts exactly ntok tokens; a stream
    # with matches NOT at cell starts consumes fewer (each covers >1
    # byte), so equality here proves every cell was classified exactly
    bad = bad | (tcur != counts[0, 2])
    c_i = jnp.arange(C, dtype=I32)
    active = (c_i[:, None] * CELL) < sizes[None, :].astype(I32)
    islit = active & ~ism
    pre = _preplace_literal_cells(lit[0], islit, C)
    isfar = ism & (dist > CELL)
    src = jnp.clip(c_i[:, None] - dist // CELL, 0, C - 1)     # [C, B]
    # far cell-aligned copies fill from the preplacement at the SOURCE
    # cell — its final bytes when the source is literal (the encoder's
    # dedup rule guarantees that), zeros otherwise (the zero-rule case:
    # pre[] of any non-literal cell is zeros by the preplace mask)
    pre_f = pre.transpose(0, 2, 1).astype(jnp.float32)        # [C, CELL, B]
    farfill = _gather_cells(src, pre_f, mask=isfar)
    farfill = farfill.transpose(0, 2, 1).astype(jnp.uint8)    # [C, B, CELL]
    out = _fill_cells(pre, ism, dist, farfill)                # [C, B, CELL]
    # far fills ASSUMED the source assembles to exactly those bytes (true
    # for this repo's encoder); verify out[c] == out[src] exactly — by
    # induction over cell index, a passing verify implies spec-correct
    # bytes (the copy's mandated content IS the assembled source cell)
    # even for foreign streams; any mismatch decodes on the host
    out_f = out.transpose(0, 2, 1).astype(jnp.float32)        # [C, CELL, B]
    got = _gather_cells(src, out_f, mask=isfar)
    mism = jnp.any(got != out_f, axis=1)                      # [C, B]
    bad = bad | jnp.any(isfar & mism, axis=0)
    blocks = out.transpose(1, 0, 2).reshape(B, bs)
    pos = jax.lax.broadcasted_iota(I32, (B, bs), 1)
    blocks = jnp.where(pos < sizes[:, None].astype(I32), blocks,
                       jnp.asarray(0, jnp.uint8))
    bad = bad | (counts[0, 4] != 0) | (counts[0, 6] != 0)
    return blocks, counts, bad


def unpack_cold_container(blob: bytes):
    """Shared restore-path scaffolding (also used by
    parallel.shard.decompress_resident_sharded): unpack + validate a
    cold sqz4 sqzt container -> (blk_bits, osize, payloads, sizes)."""
    from sqz_tpu.formats import container as sqzt
    from sqz_tpu.formats.constants import SQZT_FORMAT_SQZ4
    code, _win_bits, blk_bits, osize, payloads, _csum, fresh, _anch = \
        sqzt.unpack(blob)
    if code != SQZT_FORMAT_SQZ4 or fresh is not None:
        raise ValueError("resident decode supports cold sqz4 containers")
    bs = 1 << blk_bits
    sizes = [min(bs, osize - b * bs) for b in range(len(payloads))]
    return blk_bits, osize, payloads, sizes


def pack_payload_group(grp, gsz, Pw: int, lanes: int):
    """Shared restore-path scaffolding: payload bytes -> ([1, Pw, lanes]
    u32 big-endian words, plens, szs, oversized mask). Payloads past the
    decoder buffer get a zero lane (the device flags it; the host
    fallback decodes the real bytes)."""
    n = len(grp)
    buf = np.zeros((1, Pw, lanes), np.uint32)
    plens = np.zeros((lanes,), np.int32)
    szs = np.zeros((lanes,), np.int32)
    over = np.zeros((lanes,), bool)
    for i, p in enumerate(grp):
        if len(p) > 4 * Pw:
            over[i] = True
            continue
        wv = np.frombuffer(p.ljust(-(-len(p) // 4) * 4, b"\0"),
                           dtype=">u4")
        buf[0, :len(wv), i] = wv
        plens[i] = len(p)
    szs[:n] = gsz
    return buf, plens, szs, over


def host_decode_blocks(payloads, sizes, idx, blocks_np):
    """Shared host fallback: decode blocks ``idx`` with the native (or
    oracle) codec into the writable [n, bs] array."""
    from sqz_tpu import native
    for i in idx:
        if native.available():
            out = native.sqz4_decompress_payload(payloads[i], sizes[i])
        else:
            from sqz_tpu.oracle.sqz4 import sqz4_decode_payload
            out = sqz4_decode_payload(payloads[i], sizes[i])
        blocks_np[i, :sizes[i]] = np.frombuffer(out, np.uint8)


def decompress_resident(blob: bytes, lanes: int = 512,
                        interpret: bool = False, assembly: str = "auto"):
    """Restore path: an sqzt sqz4 container -> a device-resident 1-D u8
    array. Payload bytes upload once; assembly runs on-device.

    ``assembly`` picks the on-device assembly:
      * "cell"    — the three-pass cell assembly (fastest; streams that
                    are not cell-parsed fall back to the host decoder);
      * "general" — the exact sort/scan/pointer-doubling assembly
                    (ops/lz_restore.py) that restores ANY spec-valid
                    stream — incl. compress_resident(mode="lz")
                    containers — with zero host byte assembly;
      * "auto"    — cell first, then the general assembly for lanes the
                    cell model rejects, host only for kernel-flagged
                    errors (i.e. genuinely corrupt blocks)."""
    if assembly not in ("auto", "cell", "general"):
        raise ValueError(f"unknown assembly {assembly!r}")
    blk_bits, osize, payloads, sizes = unpack_cold_container(blob)
    bs = 1 << blk_bits
    NB = len(payloads)
    if blk_bits < 7:
        # blocks smaller than a cell: the cell model is empty — decode on
        # the host (tiny blocks are host-cheap) and upload once
        out = np.zeros((NB, bs), np.uint8)
        host_decode_blocks(payloads, sizes, range(NB), out)
        return jnp.asarray(out.reshape(-1)[:osize])
    from sqz_tpu.ops import lz_restore
    plan = sp.plan_decode_dispatch(lanes, blk_bits, lanes=lanes, slots=1,
                                   interpret=interpret)
    dargs = dict(Pw=plan["Pw"], t_max=plan["t_max"], lw=plan["lw"],
                 tw=plan["tw"], mw=plan["mw"], bs=bs, interpret=interpret,
                 wide=blk_bits >= 15)
    outs = []
    for g0 in range(0, NB, lanes):
        grp = payloads[g0:g0 + lanes]
        gsz = sizes[g0:g0 + lanes]
        n = len(grp)
        buf, plens, szs, over = pack_payload_group(grp, gsz, dargs["Pw"],
                                                   lanes)
        bufd, plensd, szsd = (jnp.asarray(buf), jnp.asarray(plens),
                              jnp.asarray(szs))
        decode = (lz_restore.decode_lz_group if assembly == "general"
                  else decode_rle_group)
        blocks, _counts, bad = decode(bufd, plensd, szsd, **dargs)
        bad_np = np.asarray(bad)[:n] | over[:n]
        if bad_np.any() and assembly == "auto":
            # not cell-parsed: the general assembly restores it on device
            # (one more kernel pass over the group; rare by construction)
            gblocks, _gc, gbad = lz_restore.decode_lz_group(
                bufd, plensd, szsd, **dargs)
            sel = jnp.asarray(bad_np & ~np.asarray(gbad)[:n])
            blocks = jnp.where(sel[:, None], gblocks[:n], blocks[:n])
            bad_np = bad_np & np.asarray(gbad)[:n]
        if bad_np.any():
            # kernel-flagged (or oversized) blocks: genuinely corrupt —
            # the host decoder raises the precise errno, or decodes the
            # rare oversized-payload block
            fixed = np.array(blocks[:n])        # writable host copy
            host_decode_blocks(grp, gsz, np.nonzero(bad_np)[0], fixed)
            blocks = jnp.asarray(fixed)
        # only the final block can be short, so flatten-and-trim is exact
        outs.append(blocks[:n].reshape(-1))
    return jnp.concatenate(outs)[:osize]


def encode_group_args(blk_bits: int, cap: int = None,
                      interpret: bool = False) -> dict:
    """Static kwargs for encode_literal_group at this block size."""
    bs = 1 << blk_bits
    if cap is None:
        cap = bs + 2048
    return dict(Tt=_token_dim(bs), Lw=_lit_word_dim(bs),
                t_max=_round_up(bs + 5, 32 if interpret else 1024),
                cap_words=_round_up(-(-(cap + 3) // 4), 32),
                interpret=interpret, wide=blk_bits >= 15)


def decode_group_args(B: int, blk_bits: int, cap_words: int,
                      interpret: bool = False) -> dict:
    """Static kwargs for decode_literal_group matching an encode group."""
    bs = 1 << blk_bits
    plan = sp.plan_decode_dispatch(B, blk_bits, lanes=B, slots=1,
                                   interpret=interpret)
    return dict(Pw=min(cap_words, plan["Pw"]), t_max=plan["t_max"],
                lw=plan["lw"], tw=plan["tw"], mw=plan["mw"], bs=bs,
                interpret=interpret, wide=blk_bits >= 15)


def roundtrip_literal_device(blocks, lengths, blk_bits: int,
                             cap: int = None, interpret: bool = False):
    """Chip-resident round trip: [B, bs] u8 blocks -> encode -> decode,
    returning (payload_lens [B] i32, out_blocks [B, bs] u8, counts) as
    DEVICE arrays. Used by bench.py's device-resident row and the tests;
    nothing crosses the link between the two kernels."""
    B, bs = blocks.shape
    assert bs == 1 << blk_bits
    eargs = encode_group_args(blk_bits, cap, interpret)
    words, lens = encode_literal_group(blocks, lengths, **eargs)
    dargs = decode_group_args(B, blk_bits, eargs["cap_words"], interpret)
    out, counts = decode_literal_group(words, lens, lengths, **dargs)
    return lens[0, 0, :], out, counts
