"""Chip-resident restore for GENERAL sqz4 streams (VERDICT r4 #4).

The decode kernel defers LZ application: it emits a dense literal stream,
one match/literal bit per decoded token, and ordered match records
(len << 16 | dist). The cell restore (ops/resident.decode_rle_group)
assembles only cell-parsed streams; this module assembles ANY spec-valid
stream on device — including the general-content device-LZ parse
(ops/lzparse.py) and foreign encoders' streams — with zero host byte
assembly:

  1. **Match destinations by compaction sort.** The m-th set token bit
     is match m: one stable sort over the token axis (the [64, n]
     batch shape the TPU sort compiles well at, PERF.md round 4) yields
     each match's token index; with records already match-ordered,
     dst[m] = (token_index[m] - m) + exclusive_cumsum(len)[m] — no
     scatter needed.
  2. **Literal placement by monotone reindex.** covered[p] (inside a
     match span) comes from two boundary scatters (+1 at dst, -1 at
     dst+len; 2*M elements, not bs) and a cumsum; every uncovered
     position p reads literal stream index p - covered_before(p) — one
     aligned take_along_axis.
  3. **Match application by pointer doubling.** Every covered position
     maps to its periodic source src(p) = dst - dist + ((p - dst) mod
     dist) — the overlapped-copy semantics of the reference's
     byte-serial loop (/root/reference/src/sqz.c:826-831) collapsed to
     one hop that always lands strictly before the match. Composing the
     map with itself (src = src[src], a lax.while_loop) doubles the
     resolved chain depth per round, so chains of ANY depth (RLE runs
     chained across segments, match-of-match text) finish in
     ceil(log2(depth)) rounds; the loop stops as soon as every chain
     lands on a literal. out[p] = placed_literals[src*(p)].

Unlike the cell restore there is NO assume-then-verify: every step is
exact for arbitrary spec-valid streams. Lanes fall back to the host only
for kernel-flagged errors/overflows or streams that fail the structural
validation (dist == 0, dist > dst, output-size mismatch) — i.e. corrupt
containers, which the host decoder then rejects with the precise errno.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import numpy as jnp

from sqz_tpu.ops import sqz4_pallas as sp

I32 = jnp.int32
U32 = jnp.uint32

_SLICE = 64          # lanes per assembly program: the TPU sort's
                     # compile-friendly batch (PERF.md round 4)


def _cumsum_excl(x, axis):
    inc = jnp.cumsum(x, axis=axis)
    return inc - x


@partial(jax.jit, static_argnames=("T", "MW", "bs"))
def _assemble_stage(litw, tokw, mrecw, counts, sizes, T: int, MW: int,
                    bs: int):
    """One lane slice of the general assembly: decoder record streams ->
    ([B, bs] u8 blocks, [B] bad flags). litw/tokw/mrecw are the kernel's
    [LW|TW|MW, B] column layouts; counts [8, B]; sizes [B] i32."""
    B = tokw.shape[1]
    rows = jnp.arange(B, dtype=I32)[:, None]
    sizes = sizes.astype(I32)
    ntok = counts[2].astype(I32)
    nmatch = counts[3].astype(I32)

    # ---- token bits, LSB-first: bits[b, t] = (tokw[t>>5, b] >> (t&31)) & 1
    w = tokw.transpose(1, 0).astype(I32)[:, :-(-T // 32)]      # [B, T/32]
    sh = jnp.arange(32, dtype=I32)[None, None, :]
    bits = ((w[:, :, None] >> sh) & 1).reshape(B, -1)[:, :T]
    t_i = jnp.arange(T, dtype=I32)[None, :]
    tvalid = t_i < ntok[:, None]
    bits = jnp.where(tvalid, bits, 0)

    # ---- match token indices by compaction sort (stable: equal keys keep
    # token order; at most one token per ordinal, so keys are unique)
    mo = jnp.cumsum(bits, axis=1)                              # [B, T]
    mkey = jnp.where(bits == 1, mo - 1, T + 1)
    _, mpos_all = jax.lax.sort(
        (mkey, jnp.broadcast_to(t_i, (B, T))), dimension=1, num_keys=1,
        is_stable=True)
    mpos = mpos_all[:, :MW]                                    # [B, MW]

    # ---- match records, already match-ordered
    m_i = jnp.arange(MW, dtype=I32)[None, :]
    mvalid = m_i < nmatch[:, None]
    rec = mrecw.transpose(1, 0).astype(I32)[:, :MW]
    mlen = jnp.where(mvalid, (rec >> 16) & 0xFFFF, 0)
    mdist = jnp.where(mvalid, rec & 0xFFFF, 0)
    dst = jnp.where(mvalid, (mpos - m_i) + _cumsum_excl(mlen, 1), 0)

    # ---- structural validation (corrupt containers -> host fallback,
    # where the reference-equivalent decoder raises the precise errno)
    bad = jnp.sum(bits, axis=1) != nmatch
    bad = bad | (((ntok - nmatch) + jnp.sum(mlen, axis=1)) != sizes)
    bad = bad | jnp.any(mvalid & ((mdist == 0) | (mdist > dst)
                                  | (dst + mlen > sizes[:, None])), axis=1)
    bad = bad | (counts[0].astype(I32) != sizes)
    bad = bad | (counts[4] != 0) | (counts[6] != 0)

    # ---- covered[p] from boundary deltas (2*M scatter elements, unique
    # destinations: spans are disjoint; invalid matches park at col bs)
    dpark = jnp.where(mvalid, dst, bs)
    epark = jnp.where(mvalid, jnp.minimum(dst + mlen, bs), bs)
    delta = jnp.zeros((B, bs + 1), I32)
    delta = delta.at[rows, dpark].add(mvalid.astype(I32))
    delta = delta.at[rows, epark].add(-mvalid.astype(I32))
    cov = jnp.cumsum(delta[:, :bs], axis=1) > 0                # [B, bs]

    # ---- literal placement: uncovered p reads literal index
    # p - covered_before(p); covered p reads garbage (overwritten below)
    p_i = jnp.arange(bs, dtype=I32)[None, :]
    cb = _cumsum_excl(cov.astype(I32), 1)
    lw = litw.shape[0]
    lwords = litw.transpose(1, 0).astype(I32)                  # [B, lw]
    lby = jnp.stack([(lwords >> 24) & 0xFF, (lwords >> 16) & 0xFF,
                     (lwords >> 8) & 0xFF, lwords & 0xFF],
                    axis=-1).reshape(B, lw * 4)
    litidx = jnp.clip(p_i - cb, 0, lw * 4 - 1)
    out0 = jnp.take_along_axis(lby, litidx, axis=1)            # [B, bs] i32

    # ---- per-position periodic source map: the covering match of p is
    # the last match with dst <= p (spans disjoint) — scatter (dst, dist)
    # at column dst, carry forward with a last-non-empty associative scan
    da = jnp.full((B, bs + 1), -1, I32).at[rows, dpark].set(
        jnp.where(mvalid, dst, -1))[:, :bs]
    dd = jnp.zeros((B, bs + 1), I32).at[rows, dpark].set(
        jnp.where(mvalid, mdist, 0))[:, :bs]

    def _carry(x, y):
        xa, xd = x
        ya, yd = y
        pick = ya >= 0
        return jnp.where(pick, ya, xa), jnp.where(pick, yd, xd)

    dstv, distv = jax.lax.associative_scan(_carry, (da, dd), axis=1)
    distv = jnp.maximum(distv, 1)
    # run collapse (round 5, hardware-profiled): out[p] == out[p - d] at
    # EVERY position of a dist-d match, so a maximal covered stretch
    # with constant dist telescopes straight past all of its chained
    # matches: src = run_start - d + ((p - run_start) mod d). This is
    # what turns 64 KiB RLE regions (need ~log2(256) doubling rounds as
    # per-match hops) into depth-1 chains — the doubling loop below only
    # pays for transitions BETWEEN runs of different dists.
    prev_cov = jnp.pad(cov[:, :-1], ((0, 0), (1, 0)))
    prev_d = jnp.pad(distv[:, :-1], ((0, 0), (1, 0)))
    newrun = cov & (~prev_cov | (prev_d != distv))
    rs = jax.lax.associative_scan(
        jnp.maximum, jnp.where(newrun, p_i, -1), axis=1)
    src = jnp.where(cov, rs - distv + ((p_i - rs) % distv), p_i)
    src = jnp.clip(src, 0, bs - 1)

    # ---- pointer doubling until every chain lands on a literal
    covi = cov.astype(I32)

    def w_cond(carry):
        s, it = carry
        live = jnp.any(jnp.take_along_axis(covi, s, axis=1) == 1)
        return live & (it < 20)

    def w_body(carry):
        s, it = carry
        return jnp.take_along_axis(s, s, axis=1), it + 1

    src, _ = jax.lax.while_loop(w_cond, w_body,
                                (src, jnp.asarray(0, I32)))
    # a chain that still ends on a covered position can only come from a
    # corrupt record set (validated-bad above) self-looping at the clip
    # boundary — flag it anyway so the cap can never silently mis-decode
    bad = bad | jnp.any(
        jnp.take_along_axis(covi, src, axis=1) == 1, axis=1)
    out = jnp.take_along_axis(out0, src, axis=1)
    out = jnp.where(p_i < sizes[:, None], out, 0).astype(jnp.uint8)
    return out, bad


def decode_lz_group(buf, plens, sizes, Pw: int, t_max: int, lw: int,
                    tw: int, mw: int, bs: int, interpret: bool,
                    wide: bool, trim_tokens: bool = None):
    """Chip-resident decode of ARBITRARY sqz4 payloads: the standard
    decode kernel, then the exact sort/scan/pointer-doubling assembly in
    _SLICE-lane stages (each stage holds ONE [64, n] sort — the
    compile-friendly TPU sort batch). Same signature/contract as
    resident.decode_rle_group: ([B, bs] u8 blocks, counts [1,8,B],
    bad [B]).

    ``trim_tokens`` (default: on outside jit, forced off under a trace)
    buckets the token axis to the observed max via one tiny counts read:
    worst-case tw covers ~bs literal tokens but LZ-parsed streams carry
    ~bs/4, so the compaction sort — the assembly's cost driver — shrinks
    ~4x; pow2 buckets bound the compiled variants."""
    B = buf.shape[2]
    z = jnp.zeros((B,), I32)
    meta = jnp.stack([plens.astype(I32), sizes.astype(I32),
                      z, z, z, z, z, z])[None]
    lit, tok, mrec, counts = sp._decode_pallas(
        buf[:, :Pw, :], meta, t_max, lw, tw, mw, interpret, wide, 1,
        None, fused=True)
    if trim_tokens is None:
        trim_tokens = not isinstance(counts, jax.core.Tracer)
    T = tw * 32
    if trim_tokens:
        max_ntok = int(np.asarray(jnp.max(counts[0, 2, :])))
        T = min(T, max(1024, 1 << (max_ntok + 1).bit_length()))
    blocks_s, bad_s = [], []
    for g0 in range(0, B, _SLICE):
        g1 = min(g0 + _SLICE, B)
        blk, bad = _assemble_stage(
            lit[0, :, g0:g1], tok[0, :, g0:g1], mrec[0, :, g0:g1],
            counts[0, :, g0:g1], sizes[g0:g1], T=T, MW=min(mw, T),
            bs=bs)
        blocks_s.append(blk)
        bad_s.append(bad)
    blocks = jnp.concatenate(blocks_s, axis=0) if len(blocks_s) > 1 \
        else blocks_s[0]
    bad = jnp.concatenate(bad_s, axis=0) if len(bad_s) > 1 else bad_s[0]
    return blocks, counts, bad
