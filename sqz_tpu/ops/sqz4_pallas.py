"""sqz4 range coder as Pallas TPU kernels (FORMAT.md §2).

The XLA scan formulation pays the per-iteration cost of a device while_loop
(each step is a sequence of kernel launches, ~100µs); here the whole
per-block-serial coder loop is ONE Mosaic kernel, so a step costs only its
actual VPU work. Blocks ride the 128 vreg lanes: every u64 coder register is
a pair of ``[1, 128]`` u32 vectors, and one kernel step advances 128
independent block coders.

Key sub-algorithms (bit-exact to the scalar oracle / reference
src/sqz.c:474-548):

* u64 arithmetic on u32 pairs (add/sub/shift/compare/clz; ``mul_small64``
  for start·rng_div — exact mod 2^64).
* ``rng // total``: base-2^14 long division — 5 quotient digits, each an
  exact f32 reciprocal multiply + ±1 correction. The partial remainder stays
  < total, so every dividend chunk ``rem·2^14 + digit`` is < 2^31 while
  total < 2^17 (ops per block bound this; the host wrapper asserts it).
* encoder renormalization collapsed to one clz64: the emitted bytes are the
  leading equal bytes of ``low`` and ``low+range`` (ring-homomorphism
  argument, see sqz4_jax._stats_scan). Bytes append into a 3-word staging
  register, spill into a 64-row VMEM word ring, and retire to the output
  array in 32-word chunks via one-hot selects whenever a lane's ring half
  fills — so the hot step does only O(1) vector work per emitted byte.

The encoder consumes host-precomputed per-op model statistics
(native.sqz4_model_stats): on the encode side the symbol stream determines
every adaptive model value in advance, so the device carries only the coder
registers (~350 vector ops per step for 128 blocks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128          # blocks per kernel group = vreg lane count
ENC_TC = 1024        # encoder T-chunk (grid-streamed from HBM)
U32 = jnp.uint32
I32 = jnp.int32
F32 = jnp.float32
MASK32 = np.uint32(0xFFFFFFFF)


# ------------------------------------------------------------- u64 helpers
# A u64 is a pair (hi, lo) of identically-shaped u32 arrays.

def _u(x):
    return jnp.asarray(x, U32)


def u2i(x):
    return jax.lax.bitcast_convert_type(x, I32)


def i2u(x):
    return jax.lax.bitcast_convert_type(x, U32)


def umin(a, b):
    """Unsigned minimum (Mosaic cannot legalize vector arith.minui)."""
    return jnp.where(a < b, a, b)


def b2u(x):
    """bool -> u32 0/1 (Mosaic cannot convert bool to uint32 directly)."""
    return jnp.where(x, _u(1), _u(0))


def add64(ah, al, bh, bl):
    lo = al + bl
    return ah + bh + b2u(lo < al), lo


def sub64(ah, al, bh, bl):
    return ah - bh - b2u(al < bl), al - bl


def shl64(hi, lo, s):
    """(hi, lo) << s for per-lane s in [0, 63]."""
    s = _u(s)
    big = s >= 32
    s1 = s & 31
    hi_small = (hi << s1) | ((lo >> 1) >> (31 - s1))
    lo_small = lo << s1
    hi_big = lo << s1
    z = jnp.zeros_like(lo)
    return jnp.where(big, hi_big, hi_small), jnp.where(big, z, lo_small)


def shr64(hi, lo, s):
    s = _u(s)
    big = s >= 32
    s1 = s & 31
    lo_small = (lo >> s1) | ((hi << 1) << (31 - s1))
    hi_small = hi >> s1
    lo_big = hi >> s1
    z = jnp.zeros_like(hi)
    return jnp.where(big, z, hi_small), jnp.where(big, lo_big, lo_small)


def lt64(ah, al, bh, bl):
    return (ah < bh) | ((ah == bh) & (al < bl))


def clz64(hi, lo):
    """Leading zero count, 0..64, as u32."""
    ch = jax.lax.clz(hi)
    cl = jax.lax.clz(lo)
    return jnp.where(hi == 0, cl + _u(32), ch)


def mulhi32(a, b):
    """High 32 bits of a*b (u32), via 16-bit split."""
    a0, a1 = a & 0xFFFF, a >> 16
    b0, b1 = b & 0xFFFF, b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    mid = (m00 >> 16) + (m01 & 0xFFFF) + (m10 & 0xFFFF)
    return m11 + (m01 >> 16) + (m10 >> 16) + (mid >> 16)


def mul_small64(a, bh, bl):
    """(a * (bh, bl)) mod 2^64 for u32 a."""
    lo = a * bl
    carry = mulhi32(a, bl)
    hi = a * bh + carry
    return hi, lo


def div64_small(nh, nl, d):
    """Exact (nh, nl) // d for u32 d in [1, 2^17); returns (qh, ql, rem)."""
    dig = [u2i(nh >> 24),
           u2i((nh >> 10) & 0x3FFF),
           u2i(((nh << 4) | (nl >> 28)) & 0x3FFF),
           u2i((nl >> 14) & 0x3FFF),
           u2i(nl & 0x3FFF)]
    di = u2i(d)
    inv = 1.0 / di.astype(F32)
    rem = jnp.zeros_like(di)
    qh = jnp.zeros_like(d)
    ql = jnp.zeros_like(d)
    for k in range(5):
        cur = (rem << 14) | dig[k]
        q = (cur.astype(F32) * inv).astype(I32)
        r = cur - q * di
        q = jnp.where(r < 0, q - 1, q)
        r = jnp.where(r < 0, r + di, r)
        q = jnp.where(r >= di, q + 1, q)
        r = jnp.where(r >= di, r - di, r)
        qh = (qh << 14) | (ql >> 18)
        ql = (ql << 14) | i2u(q)
        rem = r
    return qh, ql, i2u(rem)


# ----------------------------------------------------------------- encoder

def _encode_kernel(start_ref, size_ref, total_ref, out_ref, lens_ref,
                   regs_ref, stage_ref):
    """Grid (G, NT): for each block group g, stream T-chunks tc = 0..NT-1.

    regs rows: 0 low_hi, 1 low_lo, 2 rng_hi, 3 rng_lo, 4 ocnt, 5 wpos,
               6 s2base, 7..9 obuf words. stage: 64-row output word ring.
    """
    tc = pl.program_id(1)
    nt = pl.num_programs(1)
    TC, B = start_ref.shape[1], start_ref.shape[2]
    CW = out_ref.shape[1]
    iota64 = jax.lax.broadcasted_iota(I32, (64, B), 0)

    @pl.when(tc == 0)
    def _():
        regs_ref[...] = jnp.zeros((10, B), U32)
        regs_ref[2:4, :] = jnp.full((2, B), MASK32, U32)
        out_ref[0] = jnp.zeros((CW, B), U32)

    def flush_rounds(wpos, force):
        """Retire full 32-word ring halves into `out` for lanes whose
        pending span reaches the threshold (any pending word when force)."""
        s2base = u2i(regs_ref[6:7, :])
        gap = u2i(wpos) - s2base
        doit = gap >= jnp.int32(1 if force else 32)
        half = (s2base >> 5) & 1
        chunk = jnp.where(doit, s2base >> 5, jnp.int32(-1))
        rows = jnp.where(half == 0, stage_ref[0:32], stage_ref[32:64])
        for c in range(CW // 32):
            out_ref[0, 32 * c:32 * c + 32] = jnp.where(
                chunk == jnp.int32(c), rows,
                out_ref[0, 32 * c:32 * c + 32])
        regs_ref[6:7, :] = i2u(jnp.where(doit, s2base + 32, s2base))

    def step(i, carry):
        lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry
        st = start_ref[0, pl.ds(i, 1), :]
        sz = size_ref[0, pl.ds(i, 1), :]
        tt = total_ref[0, pl.ds(i, 1), :]
        active = (tt != 0) & (sz != 0)
        flush = (tt != 0) & (sz == 0)
        z = jnp.zeros_like(lh)

        # range //= total; low += start*range; range *= size
        d = jnp.where(active, tt, _u(1))
        qh, ql, _ = div64_small(rh, rl, d)
        ph, plo = mul_small64(st, qh, ql)
        nlh, nll = add64(lh, ll, ph, plo)
        nrh, nrl = mul_small64(sz, qh, ql)
        lh = jnp.where(active, nlh, lh)
        ll = jnp.where(active, nll, ll)
        rh = jnp.where(active, nrh, rh)
        rl = jnp.where(active, nrl, rl)

        # renorm: cnt = leading equal bytes of low and low+range
        pre_h, pre_l = lh, ll
        sh_, sl_ = add64(lh, ll, rh, rl)
        cnt = jnp.where(active, clz64(pre_h ^ sh_, pre_l ^ sl_) >> 3, _u(0))
        shift = umin(cnt << 3, _u(63))
        full = cnt >= 8
        t1h, t1l = shl64(lh, ll, shift)
        lh = jnp.where(full, z, t1h)
        ll = jnp.where(full, z, t1l)
        t2h, t2l = shl64(rh, rl, shift)
        rh = jnp.where(full, z, t2h)
        rl = jnp.where(full, z, t2l)

        # underflow escape: range < total + 1 -> two emissions, re-inflate
        uf = active & (rh == 0) & (rl < tt + 1)
        u1h, u1l = shl64(pre_h, pre_l, umin(shift + _u(16), _u(63)))
        big = cnt >= 6
        lh = jnp.where(uf, jnp.where(big, z, u1h), lh)
        ll = jnp.where(uf, jnp.where(big, z, u1l), ll)
        rh = jnp.where(uf, ~lh, rh)
        rl = jnp.where(uf, ~ll, rl)
        cnt = cnt + jnp.where(uf, _u(2), _u(0))

        # flush micro-op: exactly one emission of the current top byte
        cnt = jnp.where(flush, _u(1), cnt)
        fh, fl = shl64(pre_h, pre_l, _u(8))
        lh = jnp.where(flush, fh, lh)
        ll = jnp.where(flush, fl, ll)

        # ---- append top `cnt` bytes of pre_low (bytes past 7 are zero)
        kb = umin(cnt, _u(8))
        drop = umin(_u(64) - (kb << 3), _u(63))
        m1h, m1l = shr64(pre_h, pre_l, drop)
        w0, w1 = shl64(m1h, m1l, drop)
        w0 = jnp.where(kb == 0, z, w0)
        w1 = jnp.where(kb == 0, z, w1)
        sr = ocnt << 3                      # byte offset 0..3 within word
        ob0 = ob0 | (w0 >> sr)
        ob1 = ob1 | (w1 >> sr) | ((w0 << (31 - sr)) << 1)
        ob2 = ob2 | ((w1 << (31 - sr)) << 1)
        ocnt = ocnt + cnt

        # spill full words into the stage ring
        nfull = u2i(ocnt >> 2)              # 0..3
        row = u2i(wpos)
        for j, ob in enumerate((ob0, ob1, ob2)):
            mask = ((iota64 == ((row + jnp.int32(j)) & 63))
                    & (jnp.int32(j) < nfull))
            stage_ref[...] = jnp.where(mask, ob, stage_ref[...])
        wpos = wpos + i2u(nfull)
        ocnt = ocnt & 3
        s1, s2, s3 = nfull >= 1, nfull >= 2, nfull >= 3
        nb0 = jnp.where(s3, z, jnp.where(s2, ob2, jnp.where(s1, ob1, ob0)))
        nb1 = jnp.where(s2, z, jnp.where(s1, ob2, ob1))
        nb2 = jnp.where(s1, z, ob2)
        ob0, ob1, ob2 = nb0, nb1, nb2

        # retire ring halves before any lane can overrun the ring
        maxgap = jnp.max(u2i(wpos) - u2i(regs_ref[6:7, :]))

        @pl.when(maxgap >= jnp.int32(44))
        def _():
            flush_rounds(wpos, force=False)

        return lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2

    carry0 = tuple(regs_ref[i:i + 1, :] for i in (0, 1, 2, 3, 4, 5, 7, 8, 9))
    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(TC), step, carry0)
    lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry
    for i, v in zip((0, 1, 2, 3, 4, 5, 7, 8, 9),
                    (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2)):
        regs_ref[i:i + 1, :] = v

    @pl.when(tc == nt - 1)
    def _():
        # drain: spill the partial word (zero-padded), retire all halves
        lens_ref[...] = u2i((wpos << 2) + ocnt)
        mask = (iota64 == (u2i(wpos) & 63)) & (ocnt > 0)
        stage_ref[...] = jnp.where(mask, ob0, stage_ref[...])
        wfin = wpos + b2u(ocnt > 0)
        for _ in range(3):
            flush_rounds(wfin, force=True)


@partial(jax.jit, static_argnames=("cap_words", "tc", "interpret"))
def _encode_pallas(start, size, total, cap_words: int, tc: int = ENC_TC,
                   interpret: bool = False):
    """start/size/total: [G, T, B] u32 (T multiple of ENC_TC, B == LANES).

    Returns (words [G, cap_words, B] u32, lens [G, B] i32); stream byte j of
    block (g, b) is byte j%4 (big-endian) of words[g, j//4, b].
    """
    G, T, B = start.shape
    assert B == LANES and T % tc == 0 and cap_words % 32 == 0
    z = np.int32(0)
    spec_in = pl.BlockSpec((1, tc, B), lambda g, t: (g, t, z),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _encode_kernel,
        grid=(G, T // tc),
        in_specs=[spec_in, spec_in, spec_in],
        out_specs=(
            pl.BlockSpec((1, cap_words, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda g, t: (g, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, cap_words, B), U32),
            jax.ShapeDtypeStruct((G, B), I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((10, B), U32),   # coder registers + cursors + obuf
            pltpu.VMEM((64, B), U32),   # output word ring
        ],
        interpret=interpret,
    )(start, size, total)


def pack_group_stats(arrs, nb: int, t: int, tc: int = ENC_TC):
    """[NB, T] u32 stats -> [G, T_pad, LANES] device layout (zero padded)."""
    G = -(-nb // LANES)
    Tp = -(-t // tc) * tc
    out = []
    for a in arrs:
        buf = np.zeros((G * LANES, Tp), dtype=np.uint32)
        buf[:nb, :t] = a
        out.append(np.ascontiguousarray(
            buf.reshape(G, LANES, Tp).transpose(0, 2, 1)))
    return out


def encode_groups(start: np.ndarray, size: np.ndarray, total: np.ndarray,
                  cap: int, tc: int = ENC_TC, interpret: bool = False):
    """Host wrapper: per-op stats [NB, T] u32 each -> NB payload byte strings.

    Streams are byte-identical to sqz4_jax.encode_scan_stats_impl (and so to
    the native/oracle/reference encoders).
    """
    NB, T = start.shape
    assert int(total.max(initial=0)) < (1 << 17), "totals exceed divider range"
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    st, sz, tt = pack_group_stats((start, size, total), NB, T, tc)
    words, lens = _encode_pallas(jnp.asarray(st), jnp.asarray(sz),
                                 jnp.asarray(tt), cap_words, tc, interpret)
    return unpack_group_payloads(np.asarray(words), np.asarray(lens), NB)


def unpack_group_payloads(words: np.ndarray, lens: np.ndarray, nb: int):
    payloads = []
    for b in range(nb):
        g, lane = divmod(b, LANES)
        n = int(lens[g, lane])
        payloads.append(
            words[g, :(n + 3) // 4, lane].astype(">u4").tobytes()[:n])
    return payloads
