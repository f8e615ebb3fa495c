"""Block-parallel ``squeeze`` codec on the device (FORMAT.md §1).

Encoder: tokens are pre-expanded on the host into micro-ops over the two
adaptive Huffman trees — SYM (emit a seen symbol's path, bump its frequency),
NYT (emit the escape path, bump NYT, write the raw symbol index) and INS
(insert the first-occurrence leaf) — plus RAW extra-bit writes. Seen-ness is
deterministic from the symbol history, so the host can plan the exact op
sequence; a single ``lax.scan`` then advances all B block trees in lock-step
(sqz_tpu.ops.huffman_jax) and assembles the bitstream with vectorized
scatter-adds of up to 64 bit positions per write (the parallel equivalent of
bitstream.h:28-63's shift register).

Decoder: a ``lax.while_loop`` with one symbol per block per step — walk the
tree (nested while over depth), NYT escapes read 9/5 raw bits and insert,
DEFLATE base/extra tables map codes to lengths/distances (squeeze.h:29-79) —
placing literals directly and deferring back-references to the shared
periodic-gather apply pass (ops.lz_apply).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqz_tpu.formats.constants import (
    LEN_BASE, LEN_XB, POS_BASE, POS_XB, build_len_index, build_pos_index,
    SQUEEZE_SYM_MIN, SQUEEZE_LIT_NYT, SQUEEZE_POS_NYT,
    SQUEEZE_LIT_TERMINALS, SQUEEZE_POS_TERMINALS, SQUEEZE_LEN_MAX,
)
from sqz_tpu.ops import huffman_jax as hj

_LEN_INDEX = build_len_index()
_POS_INDEX = build_pos_index()

# encoder micro-op kinds
OP_PAD, OP_SYM, OP_NYT, OP_INS, OP_RAW = 0, 1, 2, 3, 4
TREE_LIT, TREE_POS = 0, 1
WRITE_W = 64  # max bits per bitstream write


# --------------------------------------------------------------- host plan

def plan_ops(tokens, seed=None) -> np.ndarray:
    """Expand tokens into (kind, tree, sym, raw_v, raw_n) micro-ops.

    Tracks first occurrences so the device never needs data-dependent
    seen-ness checks (it is deterministic from the history). ``seed``
    (TreeSeed): warm blocks start with block 0's symbols already seen
    (a symbol is in the tree iff its pix != -1, FORMAT.md §3.1)."""
    seen_lit = np.zeros(SQUEEZE_LIT_TERMINALS, dtype=bool)
    seen_pos = np.zeros(SQUEEZE_POS_TERMINALS, dtype=bool)
    if seed is not None:
        m_lit = 2 * SQUEEZE_LIT_TERMINALS - 1
        m_pos = 2 * SQUEEZE_POS_TERMINALS - 1
        pix_lit = seed.lit[3 + 3 * m_lit:3 + 4 * m_lit]
        pix_pos = seed.pos[3 + 3 * m_pos:3 + 4 * m_pos]
        seen_lit[:] = np.asarray(
            pix_lit[:SQUEEZE_LIT_TERMINALS]) != -1
        seen_pos[:] = np.asarray(
            pix_pos[:SQUEEZE_POS_TERMINALS]) != -1
    ops: list = []

    def emit_lit(sym: int):
        if seen_lit[sym]:
            ops.append((OP_SYM, TREE_LIT, sym, 0, 0))
        else:
            seen_lit[sym] = True
            ops.append((OP_NYT, TREE_LIT, SQUEEZE_LIT_NYT, sym, 9))
            ops.append((OP_INS, TREE_LIT, sym, 0, 0))

    def emit_pos(code: int):
        if seen_pos[code]:
            ops.append((OP_SYM, TREE_POS, code, 0, 0))
        else:
            seen_pos[code] = True
            ops.append((OP_NYT, TREE_POS, SQUEEZE_POS_NYT, code, 5))
            ops.append((OP_INS, TREE_POS, code, 0, 0))

    for tok in tokens:
        if tok[0] == "lit":
            emit_lit(tok[1])
        else:
            _, length, dist = tok
            li = int(_LEN_INDEX[length])
            emit_lit(SQUEEZE_SYM_MIN + li)
            if LEN_XB[li]:
                ops.append((OP_RAW, 0, 0, length - int(LEN_BASE[li]),
                            int(LEN_XB[li])))
            pi = int(_POS_INDEX[dist])
            emit_pos(pi)
            if POS_XB[pi]:
                ops.append((OP_RAW, 0, 0, dist - int(POS_BASE[pi]),
                            int(POS_XB[pi])))
    return np.asarray(ops, dtype=np.int32).reshape(-1, 5)


# ------------------------------------------------------------ bit plumbing

def _write_bits(buf, bitpos, value, nbits, active, bidx):
    """Append ``nbits`` of ``value`` LSB-first at each block's bit cursor.

    Stream bit p lands at byte p>>3, bit 7-(p&7) — the big-endian-word layout
    of FORMAT.md §1.1. One scatter-add covers all bit positions; duplicates
    within a byte accumulate, and each stream bit is touched exactly once."""
    cap = buf.shape[1]
    j = jnp.arange(WRITE_W)
    p = bitpos[:, None] + j[None, :]
    bit = ((value[:, None] >> j[None, :].astype(jnp.uint64)) & np.uint64(1))
    mask = (j[None, :] < nbits[:, None]) & active[:, None]
    byteidx = jnp.where(mask, p >> 3, cap)
    val = (bit << (np.uint64(7) - (p & 7).astype(jnp.uint64))).astype(jnp.uint8)
    buf = buf.at[bidx[:, None], byteidx].add(jnp.where(mask, val, 0),
                                             mode="drop")
    bitpos = bitpos + jnp.where(active, nbits, 0)
    return buf, bitpos


def _read_bit(payload, plens, bp, active, bidx):
    byteidx = jnp.clip(bp >> 3, 0, payload.shape[1] - 1)
    byte = payload[bidx, byteidx]
    bit = (byte >> (7 - (bp & 7).astype(jnp.uint8))) & 1
    bit = jnp.where(active & (bp < plens * 8), bit.astype(jnp.int32), 0)
    return bit, bp + active.astype(bp.dtype)


def _read_bits(payload, plens, bp, n, max_n, active, bidx):
    """LSB-first multi-bit read, bounded by static max_n."""
    v = jnp.zeros_like(bp)

    def body(j, st):
        v, bp = st
        live = active & (j < n)
        bit, bp = _read_bit(payload, plens, bp, live, bidx)
        v = v | (bit << j)
        return v, bp

    v, bp = jax.lax.fori_loop(0, max_n, body, (v, bp))
    return v, bp


# ----------------------------------------------------------------- encoder

def _tree_arrays_from_seeds(terminals: int, flats) -> "hj.Tree":
    """Batched hj.Tree from per-block flat oracle snapshots (None = fresh
    NYT-seeded) — sqzt v2 warm start (FORMAT.md §3.1)."""
    from sqz_tpu.oracle.huffman import AdaptiveHuffman
    m = 2 * terminals - 1
    # fresh-with-NYT state via the oracle (identical by the state tests)
    fresh = AdaptiveHuffman(terminals)
    fresh.insert(SQUEEZE_LIT_NYT if terminals == 512 else SQUEEZE_POS_NYT)
    fresh_flat = fresh.snapshot()
    B = len(flats)
    freq = np.zeros((B, m), np.uint32)
    pix = np.zeros((B, m), np.int32)
    lix = np.zeros((B, m), np.int32)
    rix = np.zeros((B, m), np.int32)
    nxt = np.zeros((B,), np.int32)
    for b, flat in enumerate(flats):
        f = fresh_flat if flat is None else flat
        nxt[b] = f[0]
        a = np.asarray(f[3:], np.int64)
        freq[b] = a[0:m].astype(np.uint32)
        pix[b] = a[3 * m:4 * m].astype(np.int32)
        lix[b] = a[4 * m:5 * m].astype(np.int32)
        rix[b] = a[5 * m:6 * m].astype(np.int32)
    return hj.Tree(freq=jnp.asarray(freq), pix=jnp.asarray(pix),
                   lix=jnp.asarray(lix), rix=jnp.asarray(rix),
                   nxt=jnp.asarray(nxt))


@partial(jax.jit, static_argnames=("cap",))
def _encode_scan(ops, cap: int, trees0=None):
    """ops: [B, T, 5] int32. Returns (buf [B, cap] u8, bit lengths [B]).
    ``trees0``: warm-start (lit, pos) hj.Tree pair."""
    B, T, _ = ops.shape
    bidx = jnp.arange(B)
    if trees0 is not None:
        lit, pos = trees0
    else:
        lit = hj.new_tree(B, SQUEEZE_LIT_TERMINALS)
        pos = hj.new_tree(B, SQUEEZE_POS_TERMINALS)
        allb = jnp.ones((B,), bool)
        # both sides seed the NYT leaves before the first token
        # (squeeze.h:333-334)
        lit = hj.insert(lit, jnp.full((B,), SQUEEZE_LIT_NYT, jnp.int32), allb)
        pos = hj.insert(pos, jnp.full((B,), SQUEEZE_POS_NYT, jnp.int32), allb)

    def step(carry, op):
        lit, pos, buf, bitpos = carry
        kind, tree_id, sym, raw_v, raw_n = (op[:, 0], op[:, 1], op[:, 2],
                                            op[:, 3], op[:, 4])
        emits = (kind == OP_SYM) | (kind == OP_NYT)
        on_lit = tree_id == TREE_LIT
        # emit the symbol's current path (before any update)
        lpath, lbits = hj.path_of(lit, sym, emits & on_lit)
        ppath, pbits = hj.path_of(pos, sym, emits & ~on_lit)
        path = jnp.where(on_lit, lpath, ppath)
        nbits = jnp.where(on_lit, lbits, pbits)
        buf, bitpos = _write_bits(buf, bitpos, path, nbits, emits, bidx)
        # strictly-after-emission tree update (squeeze.h:239-246)
        lit = hj.inc_frequency(lit, sym, emits & on_lit)
        pos = hj.inc_frequency(pos, sym, emits & ~on_lit)
        # NYT escape: raw symbol index (9/5 bits) follows the escape path
        is_nyt = kind == OP_NYT
        is_raw = kind == OP_RAW
        buf, bitpos = _write_bits(
            buf, bitpos, raw_v.astype(jnp.uint64), raw_n, is_nyt | is_raw, bidx)
        # first-occurrence insert
        is_ins = kind == OP_INS
        lit = hj.insert(lit, sym, is_ins & on_lit)
        pos = hj.insert(pos, sym, is_ins & ~on_lit)
        return (lit, pos, buf, bitpos), None

    buf0 = jnp.zeros((B, cap), jnp.uint8)
    bitpos0 = jnp.zeros((B,), jnp.int32)
    (lit, pos, buf, bitpos), _ = jax.lax.scan(
        step, (lit, pos, buf0, bitpos0), jnp.swapaxes(ops, 0, 1))
    return buf, bitpos


def encode_blocks(token_lists: Sequence[list], blk_bits: int,
                  warm_from_first: bool = False) -> List[bytes]:
    """``warm_from_first`` (sqzt v2, FORMAT.md §3.1): blocks 1+ start from
    block 0's final tree state (derived by replaying its tokens)."""
    B = len(token_lists)
    trees0 = None
    seed = None
    if warm_from_first and B > 1:
        from sqz_tpu.oracle.squeeze import tree_seed_from_tokens
        seed = tree_seed_from_tokens(token_lists[0])
        flats_lit = [None] + [seed.lit] * (B - 1)
        flats_pos = [None] + [seed.pos] * (B - 1)
        trees0 = (_tree_arrays_from_seeds(SQUEEZE_LIT_TERMINALS, flats_lit),
                  _tree_arrays_from_seeds(SQUEEZE_POS_TERMINALS, flats_pos))
    plans = [plan_ops(toks, seed=seed if b else None)
             for b, toks in enumerate(token_lists)]
    T = max((p.shape[0] for p in plans), default=1) or 1
    ops = np.zeros((B, T, 5), dtype=np.int32)
    for b, p in enumerate(plans):
        ops[b, :p.shape[0]] = p
    cap = (1 << blk_bits) * 2 + 4096
    buf, bitpos = _encode_scan(jnp.asarray(ops), cap, trees0)
    buf = np.asarray(buf)
    bitpos = np.asarray(bitpos)
    if int(bitpos.max(initial=0)) > cap * 8:
        # bits past cap were scatter-dropped: the payload is truncated
        # (adaptive-Huffman worst case on adversarial data) — fail loudly
        raise ValueError("compressed block exceeded the output capacity "
                         "(ENOBUFS)")
    out = []
    for b in range(B):
        # flush pads with zero bits to a 64-bit word boundary (FORMAT.md §1.1)
        nbytes = ((int(bitpos[b]) + 63) // 64) * 8
        out.append(buf[b, :nbytes].tobytes())
    return out


# ----------------------------------------------------------------- decoder

ST_LIT, ST_POS, ST_DONE, ST_ERR = 0, 1, 2, 3


@partial(jax.jit, static_argnames=("out_cap", "t_max", "m_max"))
def _decode_scan(payloads, plens, sizes, out_cap: int, t_max: int,
                 m_max: int, trees0=None, dict_arr=None):
    """``trees0``/``dict_arr``: warm start — seeded trees and a shared
    dictionary the output buffer is prefixed with (FORMAT.md §3.1)."""
    B, P = payloads.shape
    bidx = jnp.arange(B)
    dlen = 0 if dict_arr is None else dict_arr.shape[0]
    if trees0 is not None:
        lit, pos = trees0
    else:
        allb = jnp.ones((B,), bool)
        lit = hj.new_tree(B, SQUEEZE_LIT_TERMINALS)
        pos = hj.new_tree(B, SQUEEZE_POS_TERMINALS)
        lit = hj.insert(lit, jnp.full((B,), SQUEEZE_LIT_NYT, jnp.int32), allb)
        pos = hj.insert(pos, jnp.full((B,), SQUEEZE_POS_NYT, jnp.int32), allb)

    len_base = jnp.asarray(LEN_BASE)
    len_xb = jnp.asarray(LEN_XB)
    pos_base = jnp.asarray(POS_BASE)
    pos_xb = jnp.asarray(POS_XB)

    def walk(tree, bp, active):
        """Root-to-leaf walk reading one bit per level (squeeze.h:429-442)."""
        node0 = jnp.full((B,), tree.m - 1, jnp.int32)

        def cond(st):
            return jnp.any(st[2])

        def body(st):
            node, bp, live = st
            bit, bp = _read_bit(payloads, plens, bp, live, bidx)
            nxt = jnp.where(bit == 1,
                            hj._gat(tree.rix, node), hj._gat(tree.lix, node))
            node = jnp.where(live, nxt, node)
            leaf = (hj._gat(tree.lix, node) < 0) & (hj._gat(tree.rix, node) < 0)
            live = live & ~leaf
            return node, bp, live

        node, bp, _ = jax.lax.while_loop(cond, body, (node0, bp, active))
        return node, bp

    def cond(st):
        t, state = st[0], st[3]
        return (t < t_max) & jnp.any((state == ST_LIT) | (state == ST_POS))

    def step(st):
        (t, lit, pos, state, bp, out, optr, matches, mptr, psize) = st

        # ---- literal / length symbol
        in_lit = state == ST_LIT
        sym, bp = walk(lit, bp, in_lit)
        lit = hj.inc_frequency(lit, sym, in_lit)
        is_nyt = in_lit & (sym == SQUEEZE_LIT_NYT)
        raw, bp = _read_bits(payloads, plens, bp, jnp.where(is_nyt, 9, 0), 9,
                             is_nyt, bidx)
        # escape of an already-present symbol is malformed (native/oracle
        # reject identically); inserting a linked node corrupts the tree
        nyt_dup = is_nyt & (hj._gat(lit.pix, raw) != -1)
        lit = hj.insert(lit, jnp.where(is_nyt, raw, 0), is_nyt & ~nyt_dup)
        sym = jnp.where(is_nyt, raw, sym)

        # sym < 0: the walk fell off a missing child (corrupt path);
        # sym == 256: unused lit-tree index between literals and length
        # codes — the oracle/native reject both
        bad_sym = in_lit & ((sym < 0) | (sym == 0x100)
                            | (sym > SQUEEZE_LIT_NYT))
        is_byte = in_lit & ~bad_sym & (sym >= 0) & (sym <= 0xFF)
        out = out.at[bidx, jnp.where(is_byte, optr, out.shape[1] - 1)].set(
            jnp.where(is_byte, sym, 0).astype(jnp.uint8), mode="drop")
        optr = optr + is_byte.astype(optr.dtype)

        is_len = in_lit & (sym > 0xFF) & ~bad_sym & (sym != SQUEEZE_LIT_NYT)
        li = jnp.clip(sym - SQUEEZE_SYM_MIN, 0, 28)
        xb = jnp.where(is_len, len_xb[li], 0)
        extra, bp = _read_bits(payloads, plens, bp, xb, 5, is_len, bidx)
        psize = jnp.where(is_len, len_base[li] + extra, psize)

        # ---- distance symbol
        in_pos = state == ST_POS
        pcode, bp = walk(pos, bp, in_pos)
        pos = hj.inc_frequency(pos, pcode, in_pos)
        p_nyt = in_pos & (pcode == SQUEEZE_POS_NYT)
        praw, bp = _read_bits(payloads, plens, bp, jnp.where(p_nyt, 5, 0), 5,
                              p_nyt, bidx)
        pnyt_dup = p_nyt & (hj._gat(pos.pix, praw) != -1)
        pos = hj.insert(pos, jnp.where(p_nyt, praw, 0), p_nyt & ~pnyt_dup)
        pcode = jnp.where(p_nyt, praw, pcode)
        bad_pos = in_pos & ((pcode < 0) | (pcode > SQUEEZE_POS_NYT))
        pc = jnp.clip(pcode, 0, 29)
        pxb = jnp.where(in_pos & ~bad_pos, pos_xb[pc], 0)
        pextra, bp = _read_bits(payloads, plens, bp, pxb, 13,
                                in_pos & ~bad_pos, bidx)
        dist = pos_base[pc] + pextra

        emit = in_pos & ~bad_pos
        bad_dist = emit & ((dist <= 0) | (dist > optr))
        emit_ok = emit & ~bad_dist
        mslot = jnp.where(emit_ok, mptr, m_max)
        matches = matches.at[bidx, mslot, 0].set(optr, mode="drop")
        matches = matches.at[bidx, mslot, 1].set(psize, mode="drop")
        matches = matches.at[bidx, mslot, 2].set(dist, mode="drop")
        mptr = mptr + emit_ok.astype(mptr.dtype)
        optr = optr + jnp.where(emit_ok, psize, 0)

        overrun = (optr > sizes + dlen) | (bp > P * 8 + 64)
        err = (bad_sym | bad_pos | bad_dist | overrun
               | nyt_dup | pnyt_dup)

        nstate = state
        nstate = jnp.where(is_len, ST_POS, nstate)
        nstate = jnp.where(is_byte, ST_LIT, nstate)
        nstate = jnp.where(emit_ok, ST_LIT, nstate)
        # ST_ERR is sticky: the completion transition must not resurrect
        # an errored block on a later step (err recomputes false once the
        # block is inactive)
        nstate = jnp.where((optr >= sizes + dlen) & (state != ST_ERR),
                           ST_DONE, nstate)
        nstate = jnp.where(err, ST_ERR, nstate)

        i32 = jnp.int32
        return (t + 1, lit, pos, nstate.astype(i32), bp.astype(i32), out,
                optr.astype(i32), matches, mptr.astype(i32), psize.astype(i32))

    out0 = jnp.zeros((B, dlen + out_cap + SQUEEZE_LEN_MAX + 1), jnp.uint8)
    if dlen:
        out0 = out0.at[:, :dlen].set(
            jnp.broadcast_to(dict_arr[None, :], (B, dlen)))
    st0 = (
        jnp.zeros((), jnp.int32), lit, pos,
        jnp.where(sizes > 0, ST_LIT, ST_DONE).astype(jnp.int32),
        jnp.zeros((B,), jnp.int32),
        out0,
        jnp.full((B,), dlen, jnp.int32),
        jnp.zeros((B, m_max + 1, 3), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    st = jax.lax.while_loop(cond, step, st0)
    state, out, optr, matches, mptr = st[3], st[5], st[6], st[7], st[8]
    return out, optr - dlen, matches, mptr, state == ST_ERR


def decode_blocks(payloads: Sequence[bytes], sizes: Sequence[int],
                  blk_bits: int, seed=None,
                  dictionary: bytes = b"") -> List[bytes]:
    """``seed``/``dictionary``: warm start shared by ALL blocks here (the
    warm container's block 0 is decoded separately first)."""
    from sqz_tpu.ops.lz_apply import apply_matches
    B = len(payloads)
    P = max(max((len(p) for p in payloads), default=1), 8)
    P = 1 << (P - 1).bit_length()   # bucket the padded width: one compile
    #                                 per size class, not per stream length
    buf = np.zeros((B, P), dtype=np.uint8)
    for b, p in enumerate(payloads):
        buf[b, :len(p)] = np.frombuffer(p, dtype=np.uint8)
    plens = np.asarray([len(p) for p in payloads], dtype=np.int32)
    out_cap = 1 << blk_bits
    t_max = 2 * out_cap + 64
    m_max = out_cap // 3 + 1
    trees0 = None
    if seed is not None:
        trees0 = (_tree_arrays_from_seeds(SQUEEZE_LIT_TERMINALS,
                                          [seed.lit] * B),
                  _tree_arrays_from_seeds(SQUEEZE_POS_TERMINALS,
                                          [seed.pos] * B))
    dict_arr = (jnp.asarray(np.frombuffer(dictionary, dtype=np.uint8))
                if dictionary else None)
    dlen = len(dictionary)
    out, optr, matches, mptr, err = _decode_scan(
        jnp.asarray(buf), jnp.asarray(plens),
        jnp.asarray(np.asarray(sizes, dtype=np.int32)),
        out_cap, t_max, m_max, trees0, dict_arr)
    if bool(jnp.any(err)):
        raise ValueError(
            f"corrupt squeeze block(s): {np.nonzero(np.asarray(err))[0]}")
    m_used = int(np.asarray(mptr).max())
    m_pad = 1 << max(m_used - 1, 1).bit_length() if m_used else 0
    if m_pad:
        # max DECODABLE length is 258 (len code 27 base 227 + 31 extra, or
        # code 28 base 258): the encoder caps at 257 but the oracle/native
        # decoders copy whatever the stream says — one short would leave a
        # silent zero byte
        out = apply_matches(out, matches[:, :min(m_pad, m_max)],
                            SQUEEZE_LEN_MAX + 1)
    out = np.asarray(out)
    optr = np.asarray(optr)
    for b, s in enumerate(sizes):
        if optr[b] != s:
            raise ValueError(f"block {b}: produced {optr[b]} of {s} bytes")
    return [out[b, dlen:dlen + sizes[b]].tobytes() for b in range(B)]
