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

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 256          # decoder blocks per kernel group (the per-step scalar
                     # chain is latency-bound: two vreg lane-groups cost ~24%
                     # more per step than one and double the work per step;
                     # the decoder's VMEM budget caps it at 256)
ENC_LANES = 512      # encoder groups are smaller in VMEM -> 4 lane-groups
ENC_TC = 512         # encoder T-chunk (grid-streamed from HBM; swept at
#                      blk16 fused: 512 -> 268.8 MB/s, 1024 -> 264.2,
#                      2048 -> 260.0)
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


def div64_small(nh, nl, d, wide: bool = False):
    """Exact (nh, nl) // d; returns (qh, ql, rem).

    Long division with f32-reciprocal digit estimates and a +-1 correction:
    each round's dividend chunk ``rem * 2^b + digit`` must stay < 2^31 and
    the estimate's absolute error << 1 (f32 relative error 2^-23 against a
    2^b-bounded quotient digit). Default: base-2^16, 4 rounds, exact for
    d < 2^15 — model totals fit (<= 257 + ops/block, <= 2.5 ops/byte) for
    blocks up to 2^14 bytes. ``wide``: base-2^14, 5 rounds, exact for
    d < 2^17 — covers 2^16-byte blocks at ~25% more chain latency.
    """
    di = u2i(d)
    inv = 1.0 / di.astype(F32)
    rem = jnp.zeros_like(di)
    qh = jnp.zeros_like(d)
    ql = jnp.zeros_like(d)
    if wide:
        b = 14
        dig = [u2i(nh >> 24),
               u2i((nh >> 10) & 0x3FFF),
               u2i(((nh << 4) | (nl >> 28)) & 0x3FFF),
               u2i((nl >> 14) & 0x3FFF),
               u2i(nl & 0x3FFF)]
    else:
        b = 16
        dig = [u2i(nh >> 16), u2i(nh & 0xFFFF),
               u2i(nl >> 16), u2i(nl & 0xFFFF)]
    for k, dg in enumerate(dig):
        cur = (rem << b) | dg
        q = (cur.astype(F32) * inv).astype(I32)
        r = cur - q * di
        q = jnp.where(r < 0, q - 1, q)
        r = jnp.where(r < 0, r + di, r)
        q = jnp.where(r >= di, q + 1, q)
        r = jnp.where(r >= di, r - di, r)
        if k:
            qh = (qh << b) | (ql >> (32 - b))
            ql = (ql << b) | i2u(q)
        else:
            ql = i2u(q)
        rem = r
    return qh, ql, i2u(rem)



def _enc_coder_step(active, flush, st, sz, tt, lh, ll, rh, rl,
                    wide=False):
    """One range-coder encode micro-op on u32-pair registers (values only).

    st/sz/tt are u32 model stats; returns updated registers plus the
    pre-renorm low and the emission byte count for this op.
    """
    z = jnp.zeros_like(lh)
    d = jnp.where(active, tt, _u(1))
    qh, ql, _ = div64_small(rh, rl, d, wide)
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
    return lh, ll, rh, rl, pre_h, pre_l, cnt


def _enc_append(stage_ref, iota64, cnt, pre_h, pre_l, ocnt, wpos,
                ob0, ob1, ob2):
    """Append the top `cnt` bytes of pre_low (bytes past 7 are zero) into
    the 3-word staging register; spill full words into the stage ring."""
    z = jnp.zeros_like(ob0)
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
    return ocnt, wpos, nb0, nb1, nb2



def f32_from_u64(hi, lo):
    """Approximate f32 value of a u64 pair (relative error ~2^-23)."""
    top = u2i(hi >> 1).astype(F32) * jnp.float32(2.0 ** 33)
    mid = u2i(((hi & 1) << 30) | (lo >> 2)).astype(F32) * jnp.float32(4.0)
    return top + mid


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
        lh, ll, rh, rl, pre_h, pre_l, cnt = _enc_coder_step(
            active, flush, st, sz, tt, lh, ll, rh, rl)
        ocnt, wpos, ob0, ob1, ob2 = _enc_append(
            stage_ref, iota64, cnt, pre_h, pre_l, ocnt, wpos, ob0, ob1, ob2)

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
        lens_ref[0, 0:1, :] = u2i((wpos << 2) + ocnt)
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
    assert B % 128 == 0 and T % tc == 0 and cap_words % 32 == 0
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
            pl.BlockSpec((1, 8, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, cap_words, B), U32),
            jax.ShapeDtypeStruct((G, 8, B), I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((10, B), U32),   # coder registers + cursors + obuf
            pltpu.VMEM((64, B), U32),   # output word ring
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
    assert int(total.max(initial=0)) < (1 << 15), "totals exceed divider range"
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    st, sz, tt = pack_group_stats((start, size, total), NB, T, tc)
    words, lens = _encode_pallas(jnp.asarray(st), jnp.asarray(sz),
                                 jnp.asarray(tt), cap_words, tc, interpret)
    lens = np.asarray(lens)
    if int(lens[:, 0].max(initial=0)) > cap_words * 4:
        raise ValueError("compressed block exceeded the output capacity")
    return unpack_group_payloads(fetch_words_trimmed(words, lens), lens, NB)


def unpack_group_payloads(words: np.ndarray, lens: np.ndarray, nb: int):
    lanes = words.shape[2]
    payloads = []
    for b in range(nb):
        g, lane = divmod(b, lanes)
        n = int(lens[g, 0, lane])
        payloads.append(
            words[g, :(n + 3) // 4, lane].astype(">u4").tobytes()[:n])
    return payloads


def fetch_words_trimmed(words, lens_np: np.ndarray):
    """Download a kernel output buffer trimmed to the used rows: payload
    buffers are sized for the worst legal expansion (cap_words), but the
    device->host transfer only needs ceil(max_len/4) rows — on the sandbox
    tunnel that download otherwise dominates end-to-end encode (PERF.md
    round 3). Rows bucket to 512 so the transfer shape stays cache-friendly
    for jit re-use."""
    used = (int(lens_np[:, 0].max(initial=0)) + 3) // 4
    R = min(words.shape[1], max(512, -(-used // 512) * 512))
    return np.asarray(words[:, :R])


# ------------------------------------------------ ragged payload compaction
#
# fetch_words_trimmed trims the [rows, lanes] rectangle to the LONGEST
# lane, so one incompressible block (e.g. a BMP tile) forces the whole
# group's download back to ~1 B per input byte. On the ~33 MB/s half-duplex
# sandbox tunnel the download is the binding e2e constraint (PERF.md round
# 3), so this path packs the ragged per-lane payloads tightly ON DEVICE and
# downloads only ~ratio x input bytes: one serial-grid Pallas kernel DMAs
# lane b's full padded column to its 1024-word-aligned running offset, and
# lane b+1's copy overwrites lane b's pad tail (grid steps are sequential,
# each DMA waits before the next starts, so the overlapping writes are
# ordered). An XLA gather formulation was measured 0.65 s/group — the
# element-wise gather serializes; the DMA form moves the same 34 MiB at
# HBM/VMEM bandwidth.

_DMA_ALIGN = 1024   # Mosaic 1-D u32 tiling: offsets/lengths in 1024-word units


def _compact_dma_kernel(csum_ref, flat_ref, out_ref, vmem, sem_in, sem_out,
                       *, R: int):
    # HBM -> VMEM -> HBM bounce (a direct HBM->HBM copy hung the chip on
    # first execution — not a supported Mosaic DMA pair). Each grid step
    # fully drains both copies before the next starts, so the overlapping
    # destination writes (lane b's pad tail under lane b+1's data) are
    # ordered.
    b = pl.program_id(0)
    dst = pl.multiple_of(csum_ref[b], _DMA_ALIGN)
    ld = pltpu.make_async_copy(flat_ref.at[pl.ds(b * R, R)], vmem, sem_in)
    ld.start()
    ld.wait()
    st = pltpu.make_async_copy(vmem, out_ref.at[pl.ds(dst, R)], sem_out)
    st.start()
    st.wait()


@partial(jax.jit, static_argnums=(2, 3))
def _compact_words_dma(csum, words, N: int, interpret: bool = False):
    """words [1, R, B] u32 -> [N] u32: lane b's column at offset csum[b].
    csum entries and N must be multiples of _DMA_ALIGN."""
    _, R, B = words.shape
    R_t = -(-R // _DMA_ALIGN) * _DMA_ALIGN
    padded = jnp.pad(words, ((0, 0), (0, R_t - R), (0, 0)))
    flat = padded[0].transpose(1, 0).reshape(-1)   # [B*R_t], lane-major
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((R_t,), U32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(partial(_compact_dma_kernel, R=R_t),
                          grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((N,), U32),
                          interpret=interpret)(csum, flat)


_COMPACT_BUCKET = 1 << 19   # output size granularity (words): 2 MiB steps


def fetch_payloads_compact(words, lens_np: np.ndarray, nb: int,
                           interpret: bool = False):
    """Compact the first ``nb`` lanes' payloads on device, download the
    tight buffer, and return the per-lane payload byte strings (same
    contract as fetch_words_trimmed + unpack_group_payloads for G == 1)."""
    G, R, B = words.shape
    assert G == 1 and nb <= B
    blen = lens_np[0, 0, :nb].astype(np.int64)
    wc = (blen + 3) // 4
    # Mosaic 1-D DMA offsets align to 1024 words -> 4 KiB dest slots
    wc_al = -(-np.maximum(wc, 1) // _DMA_ALIGN) * _DMA_ALIGN
    starts = np.zeros(nb, np.int64)
    starts[1:] = np.cumsum(wc_al)[:-1]
    total_al = int(wc_al.sum())
    # inactive lanes (>= nb) park their copies in the tail pad; N leaves a
    # full column of slack past the last aligned slot so every copy stays
    # in bounds (each lane writes its FULL padded column; the next lane's
    # aligned offset overwrites the overhang)
    R_t = -(-R // _DMA_ALIGN) * _DMA_ALIGN
    N = -(-(total_al + R_t) // _COMPACT_BUCKET) * _COMPACT_BUCKET
    csum = np.full(B, total_al, np.int32)
    csum[:nb] = starts
    buf = np.asarray(_compact_words_dma(jnp.asarray(csum), words, N,
                                        interpret))
    bb = buf.astype(">u4").tobytes()
    return [bb[starts[b] * 4:starts[b] * 4 + int(blen[b])]
            for b in range(nb)]


# ------------------------------------------------ decode output downloads

_DEC_TRIM_BUCKET = 2048   # coarse so the jit shape variants stay few


@partial(jax.jit, static_argnums=(3, 4, 5))
def _dec_outputs_T(lit, tok, mrec, lr: int, tr: int, mr: int):
    return (lit[:, :lr, :].transpose(0, 2, 1),
            tok[:, :tr, :].transpose(0, 2, 1),
            mrec[:, :mr, :].transpose(0, 2, 1))


def fetch_decode_host(res, trim: bool = True):
    """Download one decode dispatch's record streams, transposed to
    lane-major ON DEVICE (the host transposes otherwise cost about as
    much as the transfers themselves) and trimmed to the used rows from
    the counts rows (nlit/ntok/nmatch — the buffers are sized for the
    worst legal block, so the rectangle download otherwise dominates the
    tunnel time; PERF.md round 4). Trim rows bucket to 2048 to bound jit
    shape variants. Returns ([g, lanes, Wl] lit, [g, lanes, Wt] tok,
    [g, lanes, Wm] mrec, [g, 8, lanes] counts) numpy arrays for
    postprocess_decode(..., transposed=True)."""
    lit, tok, mrec, counts = res
    cnt = np.asarray(counts)   # small download; also the dispatch fence

    def _rows(used, W):
        if not trim:
            return W
        r = -(-max(int(used), 1) // _DEC_TRIM_BUCKET) * _DEC_TRIM_BUCKET
        return min(W, r)

    lr = _rows((int(cnt[:, 1, :].max(initial=0)) + 3) // 4, lit.shape[1])
    tr = _rows(int(cnt[:, 2, :].max(initial=0)) // 32 + 2, tok.shape[1])
    mr = _rows(int(cnt[:, 3, :].max(initial=0)), mrec.shape[1])
    lt, tt, mt = _dec_outputs_T(lit, tok, mrec, lr, tr, mr)
    return np.asarray(lt), np.asarray(tt), np.asarray(mt), cnt


# ------------------------------------------------- self-contained encoder

MOP_FLUSH = 254   # u8 op-stream marker for one flush emission
MOP_PAD = 255


def _fused_pair_body(m1, sym1, m2, sym2, carry, stage_ref, cb_ref, cs_ref,
                     bits_ref, d0_ref, d1_ref, iota32, iota256, iota64,
                     wide):
    """Code ONE fused pair (the shared heart of the op-stream and
    token-input encoder kernels): slot 1 holds only the cheap models
    (flag / bits / dist / flush / pad), slot 2 uniquely holds 256-table
    ops (byte / size / dist / flush / pad), so the 256-row extract +
    suffix-update machinery runs once per pair."""
    lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry

    # ------------- slot 1: flag | bits | dist | flush | pad
    is_flag = m1 == 0
    is_bits = m1 == 3
    is_dist1 = (m1 >= 4) & (m1 < 36)
    bitp1 = jnp.where(is_dist1, m1 - 4, _i(0))
    flush1 = m1 == MOP_FLUSH
    active1 = m1 < 36

    bt = bits_ref[0:32, :]
    oh32_at = iota32 == sym1
    oh32_lt = iota32 == (sym1 - 1)
    at32 = jnp.sum(jnp.where(oh32_at, bt, _i(0)), axis=0,
                   keepdims=True, dtype=I32)
    st32 = jnp.sum(jnp.where(oh32_lt, bt, _i(0)), axis=0,
                   keepdims=True, dtype=I32)
    tot32 = bt[31:32, :]
    lit0 = bits_ref[32:33, :]
    lit1 = bits_ref[33:34, :]
    oh_bp1 = iota32 == bitp1
    f0 = jnp.sum(jnp.where(oh_bp1, d0_ref[...], _i(0)), axis=0,
                 keepdims=True, dtype=I32)
    f1 = jnp.sum(jnp.where(oh_bp1, d1_ref[...], _i(0)), axis=0,
                 keepdims=True, dtype=I32)
    b0 = jnp.where(is_flag, lit0, f0)
    b1 = jnp.where(is_flag, lit1, f1)
    start1 = jnp.where(is_bits, st32,
                       jnp.where(sym1 == 1, b0, _i(0)))
    size1 = jnp.where(is_bits, at32 - st32,
                      jnp.where(sym1 == 1, b1, b0))
    total1 = jnp.where(is_bits, tot32, b0 + b1)

    bits_ref[0:32, :] = bt + jnp.where(
        is_bits & (iota32 >= sym1), _i(1), _i(0))
    bits_ref[32:33, :] = lit0 + jnp.where(
        is_flag & (sym1 == 0), _i(1), _i(0))
    bits_ref[33:34, :] = lit1 + jnp.where(
        is_flag & (sym1 == 1), _i(1), _i(0))

    lh, ll, rh, rl, pre_h, pre_l, cnt = _enc_coder_step(
        active1, flush1, i2u(start1), i2u(size1), i2u(total1),
        lh, ll, rh, rl, wide)
    ocnt, wpos, ob0, ob1, ob2 = _enc_append(
        stage_ref, iota64, cnt, pre_h, pre_l, ocnt, wpos, ob0, ob1, ob2)

    # ------------- slot 2: byte | size | dist | flush | pad
    is_size = m2 == 1
    is_byte = m2 == 2
    is_dist2 = (m2 >= 4) & (m2 < 36)
    bitp2 = jnp.where(is_dist2, m2 - 4, _i(0))
    flush2 = m2 == MOP_FLUSH
    active2 = m2 < 36
    is256 = is_byte | is_size

    tab256 = jnp.where(is_byte, cb_ref[...], cs_ref[...])
    oh_at = iota256 == sym2
    oh_lt = iota256 == (sym2 - 1)
    at256 = jnp.sum(jnp.where(oh_at, tab256, _i(0)), axis=0,
                    keepdims=True, dtype=I32)
    st256 = jnp.sum(jnp.where(oh_lt, tab256, _i(0)), axis=0,
                    keepdims=True, dtype=I32)
    tot256 = tab256[255:256, :]
    oh_bp2 = iota32 == bitp2
    f0b = jnp.sum(jnp.where(oh_bp2, d0_ref[...], _i(0)), axis=0,
                  keepdims=True, dtype=I32)
    f1b = jnp.sum(jnp.where(oh_bp2, d1_ref[...], _i(0)), axis=0,
                  keepdims=True, dtype=I32)
    start2 = jnp.where(is256, st256,
                       jnp.where(sym2 == 1, f0b, _i(0)))
    size2 = jnp.where(is256, at256 - st256,
                      jnp.where(sym2 == 1, f1b, f0b))
    total2 = jnp.where(is256, tot256, f0b + f1b)

    cb_ref[...] = cb_ref[...] + jnp.where(
        is_byte & (iota256 >= sym2), _i(1), _i(0))
    cs_ref[...] = cs_ref[...] + jnp.where(
        is_size & (iota256 >= sym2), _i(1), _i(0))
    # both slots' distance-bit updates in one RMW per table
    d0_ref[...] = (d0_ref[...]
                   + jnp.where(oh_bp1 & is_dist1 & (sym1 == 0),
                               _i(1), _i(0))
                   + jnp.where(oh_bp2 & is_dist2 & (sym2 == 0),
                               _i(1), _i(0)))
    d1_ref[...] = (d1_ref[...]
                   + jnp.where(oh_bp1 & is_dist1 & (sym1 == 1),
                               _i(1), _i(0))
                   + jnp.where(oh_bp2 & is_dist2 & (sym2 == 1),
                               _i(1), _i(0)))

    lh, ll, rh, rl, pre_h, pre_l, cnt = _enc_coder_step(
        active2, flush2, i2u(start2), i2u(size2), i2u(total2),
        lh, ll, rh, rl, wide)
    ocnt, wpos, ob0, ob1, ob2 = _enc_append(
        stage_ref, iota64, cnt, pre_h, pre_l, ocnt, wpos, ob0, ob1, ob2)
    return lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2


def _encode_full_kernel(m_ref, s_ref, *refs, wide: bool = False,
                        seeded: bool = False, fused: bool = False):
    """Self-contained encoder: model tables live on the device, the input is
    the packed (model, symbol) micro-op stream (1 byte each) — no
    host-precomputed statistics. Grid (G, NT) streams T-chunks; tables and
    coder registers persist in scratch across chunks.

    regs rows: 0 low_hi, 1 low_lo, 2 rng_hi, 3 rng_lo, 4 ocnt, 5 wpos,
               6 s2base, 7..9 obuf words. bits_ref rows 0:32 hold the
               pm_bits cumulative table; rows 32:34 hold the binary
               pm_literal frequencies.

    ``seeded`` (sqzt v2 warm start, FORMAT.md §3.1): a per-lane model-seed
    table input follows the op streams — rows 0:256 byte csum, 256:512
    size csum, 512:544 bits csum, 544:546 literal freqs, 546:578 dist
    freq0, 578:610 dist freq1 (cold lanes carry the fresh-model values).
    """
    if seeded:
        (seed_ref, out_ref, lens_ref, regs_ref, stage_ref,
         cb_ref, cs_ref, bits_ref, d0_ref, d1_ref) = refs
    else:
        (out_ref, lens_ref, regs_ref, stage_ref,
         cb_ref, cs_ref, bits_ref, d0_ref, d1_ref) = refs
    tc = pl.program_id(1)
    nt = pl.num_programs(1)
    TCW, B = m_ref.shape[1], m_ref.shape[2]
    TC = TCW * 4
    CW = out_ref.shape[1]
    iota64 = jax.lax.broadcasted_iota(I32, (64, B), 0)
    iota256 = jax.lax.broadcasted_iota(I32, (256, B), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, B), 0)

    @pl.when(tc == 0)
    def _():
        regs_ref[...] = jnp.zeros((10, B), U32)
        regs_ref[2:4, :] = jnp.full((2, B), MASK32, U32)
        out_ref[0] = jnp.zeros((CW, B), U32)
        if seeded:
            cb_ref[...] = seed_ref[0, 0:256, :]
            cs_ref[...] = seed_ref[0, 256:512, :]
            bits_ref[0:32, :] = seed_ref[0, 512:544, :]
            bits_ref[32:34, :] = seed_ref[0, 544:546, :]
            d0_ref[...] = seed_ref[0, 546:578, :]
            d1_ref[...] = seed_ref[0, 578:610, :]
        else:
            cb_ref[...] = iota256 + 1
            cs_ref[...] = iota256 + 1
            bits_ref[0:32, :] = iota32 + 1
            bits_ref[32:34, :] = jnp.ones((2, B), I32)  # lit freq0/freq1
            d0_ref[...] = jnp.ones((32, B), I32)
            d1_ref[...] = jnp.ones((32, B), I32)

    def flush_rounds(wpos, force):
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
        # op streams are packed 4 per u32 word (big-endian): dynamic u8 row
        # loads need 8-aligned indices, u32 rows do not
        lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry
        sh = ((3 - (i & 3)) << 3).astype(U32)
        mword = m_ref[0, pl.ds(i >> 2, 1), :]
        sword = s_ref[0, pl.ds(i >> 2, 1), :]
        m = u2i((mword >> sh) & 0xFF)
        sym = u2i((sword >> sh) & 0xFF)
        is_flag = m == 0
        is_size = m == 1
        is_byte = m == 2
        is_bits = m == 3
        is_dist = (m >= 4) & (m < 36)
        bitp = jnp.where(is_dist, m - 4, _i(0))
        flush = m == MOP_FLUSH
        active = m < 36

        # model stats from the device tables (values BEFORE the update)
        tab256 = jnp.where(is_byte, cb_ref[...], cs_ref[...])
        oh_at = iota256 == sym
        oh_lt = iota256 == (sym - 1)
        at256 = jnp.sum(jnp.where(oh_at, tab256, _i(0)), axis=0,
                        keepdims=True, dtype=I32)
        st256 = jnp.sum(jnp.where(oh_lt, tab256, _i(0)), axis=0,
                        keepdims=True, dtype=I32)
        tot256 = tab256[255:256, :]

        bt = bits_ref[0:32, :]
        oh32_at = iota32 == sym
        oh32_lt = iota32 == (sym - 1)
        at32 = jnp.sum(jnp.where(oh32_at, bt, _i(0)), axis=0,
                       keepdims=True, dtype=I32)
        st32 = jnp.sum(jnp.where(oh32_lt, bt, _i(0)), axis=0,
                       keepdims=True, dtype=I32)
        tot32 = bt[31:32, :]

        lit0 = bits_ref[32:33, :]
        lit1 = bits_ref[33:34, :]
        oh_bp = iota32 == bitp
        f0 = jnp.sum(jnp.where(oh_bp, d0_ref[...], _i(0)), axis=0,
                     keepdims=True, dtype=I32)
        f1 = jnp.sum(jnp.where(oh_bp, d1_ref[...], _i(0)), axis=0,
                     keepdims=True, dtype=I32)
        b0 = jnp.where(is_flag, lit0, f0)
        b1 = jnp.where(is_flag, lit1, f1)
        is256 = is_byte | is_size
        start = jnp.where(is256, st256,
                jnp.where(is_bits, st32,
                jnp.where(sym == 1, b0, _i(0))))
        size = jnp.where(is256, at256 - st256,
               jnp.where(is_bits, at32 - st32,
               jnp.where(sym == 1, b1, b0)))
        total = jnp.where(is256, tot256,
                jnp.where(is_bits, tot32, b0 + b1))

        # adaptive update (strictly after reading the stats)
        cb_ref[...] = cb_ref[...] + jnp.where(
            is_byte & (iota256 >= sym), _i(1), _i(0))
        cs_ref[...] = cs_ref[...] + jnp.where(
            is_size & (iota256 >= sym), _i(1), _i(0))
        bits_ref[0:32, :] = bt + jnp.where(
            is_bits & (iota32 >= sym), _i(1), _i(0))
        bits_ref[32:33, :] = lit0 + jnp.where(
            is_flag & (sym == 0), _i(1), _i(0))
        bits_ref[33:34, :] = lit1 + jnp.where(
            is_flag & (sym == 1), _i(1), _i(0))
        d0_ref[...] = d0_ref[...] + jnp.where(
            oh_bp & is_dist & (sym == 0), _i(1), _i(0))
        d1_ref[...] = d1_ref[...] + jnp.where(
            oh_bp & is_dist & (sym == 1), _i(1), _i(0))

        lh, ll, rh, rl, pre_h, pre_l, cnt = _enc_coder_step(
            active, flush, i2u(start), i2u(size), i2u(total), lh, ll, rh, rl,
            wide)
        ocnt, wpos, ob0, ob1, ob2 = _enc_append(
            stage_ref, iota64, cnt, pre_h, pre_l, ocnt, wpos, ob0, ob1, ob2)

        maxgap = jnp.max(u2i(wpos) - u2i(regs_ref[6:7, :]))

        @pl.when(maxgap >= jnp.int32(44))
        def _():
            flush_rounds(wpos, force=False)

        return lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2

    def stepf(i, carry):
        """Fused pair step (requires a plan_pack(paired=True) stream):
        ops 2i and 2i+1 per iteration — slot 1 holds only the cheap
        models (flag / bits / dist / flush / pad), slot 2 uniquely holds
        256-table ops (byte / size / dist / flush / pad), so the 256-row
        extract + suffix-update machinery runs once per PAIR."""
        lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry
        j = i << 1
        sh1 = ((3 - (j & 3)) << 3).astype(U32)
        sh2 = ((2 - (j & 3)) << 3).astype(U32)
        mword = m_ref[0, pl.ds(j >> 2, 1), :]
        sword = s_ref[0, pl.ds(j >> 2, 1), :]
        m1 = u2i((mword >> sh1) & 0xFF)
        sym1 = u2i((sword >> sh1) & 0xFF)
        m2 = u2i((mword >> sh2) & 0xFF)
        sym2 = u2i((sword >> sh2) & 0xFF)

        carry = _fused_pair_body(
            m1, sym1, m2, sym2, carry, stage_ref, cb_ref, cs_ref,
            bits_ref, d0_ref, d1_ref, iota32, iota256, iota64, wide)
        lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry

        maxgap = jnp.max(u2i(wpos) - u2i(regs_ref[6:7, :]))

        @pl.when(maxgap >= jnp.int32(40))
        def _():
            flush_rounds(wpos, force=False)

        return lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2

    carry0 = tuple(regs_ref[i:i + 1, :] for i in (0, 1, 2, 3, 4, 5, 7, 8, 9))
    if fused:
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(TC // 2), stepf,
                                  carry0)
    else:
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(TC), step, carry0)
    lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry
    for i, v in zip((0, 1, 2, 3, 4, 5, 7, 8, 9),
                    (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2)):
        regs_ref[i:i + 1, :] = v

    @pl.when(tc == nt - 1)
    def _():
        lens_ref[0, 0:1, :] = u2i((wpos << 2) + ocnt)
        mask = (iota64 == (u2i(wpos) & 63)) & (ocnt > 0)
        stage_ref[...] = jnp.where(mask, ob0, stage_ref[...])
        wfin = wpos + b2u(ocnt > 0)
        for _ in range(3):
            flush_rounds(wfin, force=True)


SEED_ROWS = 640          # 610 used rows (FORMAT.md §3.1 layout), 8-aligned


def _encode_full_pallas_call(m_ops, s_ops, seed_tab, cap_words: int, tc: int,
                             interpret: bool, wide: bool,
                             fused: bool = False):
    G, TW, B = m_ops.shape
    T = TW * 4
    seeded = seed_tab is not None
    assert B % 128 == 0 and T % tc == 0 and cap_words % 32 == 0
    z = np.int32(0)
    spec_in = pl.BlockSpec((1, tc // 4, B), lambda g, t: (g, t, z),
                           memory_space=pltpu.VMEM)
    in_specs = [spec_in, spec_in]
    operands = [m_ops, s_ops]
    if seeded:
        in_specs.append(pl.BlockSpec((1, SEED_ROWS, B),
                                     lambda g, t: (g, z, z),
                                     memory_space=pltpu.VMEM))
        operands.append(seed_tab)
    return pl.pallas_call(
        partial(_encode_full_kernel, wide=wide, seeded=seeded, fused=fused),
        grid=(G, T // tc),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, cap_words, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, cap_words, B), U32),
            jax.ShapeDtypeStruct((G, 8, B), I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((10, B), U32),    # coder registers + cursors
            pltpu.VMEM((64, B), U32),    # output word ring
            pltpu.VMEM((256, B), I32),   # csum byte
            pltpu.VMEM((256, B), I32),   # csum size
            pltpu.VMEM((34, B), I32),    # csum bits + lit freqs
            pltpu.VMEM((32, B), I32),    # dist freq0
            pltpu.VMEM((32, B), I32),    # dist freq1
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=("cap_words", "tc", "interpret", "wide",
                                   "fused"))
def _encode_full_pallas(m_ops, s_ops, cap_words: int, tc: int = ENC_TC,
                        interpret: bool = False, wide: bool = False,
                        fused: bool = False):
    """m_ops/s_ops: [G, T/4, B] u32 (4 big-endian-packed u8 ops per word).
    ``fused`` requires a paired op stream (plan_pack(paired=True))."""
    return _encode_full_pallas_call(m_ops, s_ops, None, cap_words, tc,
                                    interpret, wide, fused)


@partial(jax.jit, static_argnames=("cap_words", "tc", "interpret", "fused"))
def _encode_full_pallas_seeded(m_ops, s_ops, seed_tab, cap_words: int,
                               tc: int = ENC_TC, interpret: bool = False,
                               fused: bool = False):
    """Seeded (warm) variant; always uses the wide divider — warm model
    totals reach seed(<=2^14) + block updates, past the 2^15 narrow bound."""
    return _encode_full_pallas_call(m_ops, s_ops, seed_tab, cap_words, tc,
                                    interpret, True, fused)


def _enc_seed_table(seed, G: int, B: int, fresh_lane0: bool) -> np.ndarray:
    """[G, SEED_ROWS, B] i32 encoder-table seed columns (csum forms).
    ``fresh_lane0``: block 0 (group 0, lane 0) keeps the cold init."""
    f = np.asarray(seed.flat, dtype=np.int64)
    col = np.zeros(SEED_ROWS, np.int32)
    col[0:256] = np.cumsum(f[258:514])     # pm_byte inclusive csum
    col[256:512] = np.cumsum(f[2:258])     # pm_size inclusive csum
    col[512:544] = np.cumsum(f[514:546])   # pm_bits inclusive csum
    col[544], col[545] = f[0], f[1]        # pm_literal freqs
    col[546:578] = f[546:578]              # dist freq0
    col[578:610] = f[578:610]              # dist freq1
    tab = np.broadcast_to(col[None, :, None], (G, SEED_ROWS, B)).copy()
    if fresh_lane0:
        fresh = np.zeros(SEED_ROWS, np.int32)
        fresh[0:256] = np.arange(1, 257)
        fresh[256:512] = np.arange(1, 257)
        fresh[512:544] = np.arange(1, 33)
        fresh[544:610] = 1
        tab[0, :, 0] = fresh
    return tab


def encode_groups_full(m_ops: np.ndarray, s_ops: np.ndarray, cap: int,
                       tc: int = ENC_TC, interpret: bool = False):
    """Self-contained device encode from [NB, T] i32 micro-op arrays
    (sqz4_jax.microops layout: model -1 pad / 36 flush, symbol)."""
    NB, T = m_ops.shape
    G = -(-NB // LANES)
    Tp = -(-T // tc) * tc
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    m8 = np.full((G * LANES, Tp), MOP_PAD, dtype=np.uint8)
    s8 = np.zeros((G * LANES, Tp), dtype=np.uint8)
    m_src = np.where(m_ops < 0, MOP_PAD,
                     np.where(m_ops >= 36, MOP_FLUSH, m_ops))
    m8[:NB, :T] = m_src.astype(np.uint8)
    s8[:NB, :T] = (s_ops & 0xFF).astype(np.uint8)

    def pack_words(a8):
        a = np.ascontiguousarray(
            a8.reshape(G, LANES, Tp).transpose(0, 2, 1))     # [G, Tp, B]
        a = a.reshape(G, Tp // 4, 4, LANES).astype(np.uint32)
        return ((a[:, :, 0] << 24) | (a[:, :, 1] << 16)
                | (a[:, :, 2] << 8) | a[:, :, 3])
    words, lens = _encode_full_pallas(jnp.asarray(pack_words(m8)),
                                      jnp.asarray(pack_words(s8)),
                                      cap_words, tc, interpret)
    lens = np.asarray(lens)
    if int(lens[:, 0].max(initial=0)) > cap_words * 4:
        raise ValueError("compressed block exceeded the output capacity")
    return unpack_group_payloads(fetch_words_trimmed(words, lens), lens, NB)



@jax.jit
def _pack_ops_words(x8):
    """Device-side op-stream relayout: [G, B, R] u8 (contiguous per-block
    rows from sqz4_fast_plan) -> the kernel's [G, R/4, B] u32 layout
    (4 big-endian u8 ops per word). A fused XLA reshape/transpose — this
    replaces the host pass whose ~2 KiB-strided per-op RMWs capped the
    exact planner at ~13 MB/s/core (PERF.md round 3)."""
    G, B, R = x8.shape
    x = x8.astype(jnp.uint32).reshape(G, B, R // 4, 4)
    w = (x[..., 0] << 24) | (x[..., 1] << 16) | (x[..., 2] << 8) | x[..., 3]
    return w.transpose(0, 2, 1)


def parse_mode(parse: str = "auto") -> str:
    """Resolve the sqzt-path parse policy: 'fast' (bounded approximate
    matcher, the throughput default) or 'exact' (reference-semantics
    matcher). SQZ_PARSE overrides; 'auto' = fast."""
    env = os.environ.get("SQZ_PARSE")
    if env in ("fast", "exact"):
        return env
    return "fast" if parse == "auto" else parse


def encode_data_full(data: bytes, blk_bits: int, window: int, lz: bool,
                     cap: int, tc: int = ENC_TC, lanes: int = ENC_LANES,
                     warm: bool = False, interpret: bool = False,
                     parse: str = "auto"):
    """Whole-buffer encode: native threaded planning straight into the
    kernel's word layout, then the self-contained device coder. ``warm``
    (sqzt v2, FORMAT.md §3.1): blocks 1+ match into block 0's tail and
    start from its rescaled model state via the seeded kernel.

    ``parse``: 'fast' (default via 'auto') plans with the bounded
    approximate matcher + contiguous emission + device-side word pack
    (~20x the planning throughput, ratio within ~0.5 pp — PERF.md);
    'exact' keeps the reference-semantics parse."""
    from sqz_tpu import native
    if blk_bits > 16:
        # the wide divider's exactness proof covers totals < 2^17, i.e.
        # blocks up to 64 KiB (FORMAT.md §3.1) — larger blocks must take
        # the host/scan path
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    parse = parse_mode(parse)
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    warm = warm and NB > 1
    fused = os.environ.get("SQZ_ENC_FUSED", "1") == "1"
    # paired streams add <= 1 pad per match; 5/2 ops-per-byte covers it
    tp_cap = -(-(5 * bs // 2 + 64) // (4 * tc)) * 4 * tc
    seed = None
    if parse == "fast":
        depth = int(os.environ.get("SQZ_FAST_DEPTH", "32"))
        res = native.sqz4_fast_plan(data, window, blk_bits, lz, tp_cap,
                                    warm=warm, paired=fused, depth=depth)
        m8, s8, mx = res[:3]
        if warm:
            seed = res[3]
        rows = -(-int(mx) // (4 * tc)) * tc
        G = -(-NB // lanes)
        mp = np.full((G * lanes, rows * 4), 255, np.uint8)
        sp8 = np.zeros((G * lanes, rows * 4), np.uint8)
        mp[:NB] = m8[:, :rows * 4]
        sp8[:NB] = s8[:, :rows * 4]
        mw_dev = _pack_ops_words(jnp.asarray(mp.reshape(G, lanes, rows * 4)))
        sw_dev = _pack_ops_words(jnp.asarray(sp8.reshape(G, lanes, rows * 4)))
    else:
        if warm:
            mw, sw, mx, seed = native.sqz4_plan_pack(
                data, window, blk_bits, lz, lanes, tp_cap, warm=True,
                paired=fused)
        else:
            mw, sw, mx = native.sqz4_plan_pack(data, window, blk_bits, lz,
                                               lanes, tp_cap, paired=fused)
        rows = -(-int(mx) // (4 * tc)) * tc    # used word rows, tc-aligned
        G = mw.shape[0]
        mw_dev = jnp.asarray(mw[:, :rows])
        sw_dev = jnp.asarray(sw[:, :rows])
    if warm:
        # warm-seeded models can EXPAND a block whose content mismatches
        # block 0 (e.g. text seed, incompressible block) — give headroom
        cap = cap + bs // 4
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    if warm:
        seed_tab = _enc_seed_table(seed, G, lanes, fresh_lane0=True)
        words, lens = _encode_full_pallas_seeded(
            mw_dev, sw_dev,
            jnp.asarray(seed_tab), cap_words, tc, interpret, fused)
    else:
        words, lens = _encode_full_pallas(mw_dev, sw_dev,
                                          cap_words, tc, interpret,
                                          blk_bits >= 15, fused)
    lens = np.asarray(lens)
    if int(lens[:, 0].max(initial=0)) > cap_words * 4:
        if not warm:
            raise ValueError("compressed block exceeded the output capacity")
        # pathological expansion (adversarially seed-mismatched blocks):
        # redo just the overflowed blocks on the host, seeded identically
        payloads = unpack_group_payloads(fetch_words_trimmed(words, lens),
                                         lens, NB)
        flat = lens[:, 0].reshape(-1)[:NB]
        dictionary = data[:bs][-window:] if lz else b""
        for b in np.nonzero(flat > cap_words * 4)[0]:
            blk = data[b * bs:(b + 1) * bs]
            payloads[b] = native.sqz4_compress_payload(
                blk, window, lz=lz, seed=seed if b else None,
                dictionary=dictionary if b else b"")
        return payloads
    return unpack_group_payloads(fetch_words_trimmed(words, lens), lens, NB)



# ------------------------------------------------- token-input encoder

TOK_DONE = np.uint32(0xFFFFFFFF)     # lane finished (post-flush sentinel)


def _encode_tok_kernel(tok_all, lit_all, out_ref, lens_ref, regs_ref,
                       stage_ref, cb_ref, cs_ref, bits_ref, d0_ref, d1_ref,
                       stok_ref, slit_ref, bases_ref,
                       *, t_max: int, wide: bool = False,
                       lit_skip: bool = False):
    """Fused-pair encoder fed by TOKENS instead of expanded micro-ops
    (PERF.md round 3): one u32 token per parse decision (layout in
    native sqz4_tok_plan) plus a dense packed literal-byte stream —
    ~4x less host->device traffic and ~4x less host emission work than
    the op-stream layout. The kernel expands each token to the SAME
    fused pair grammar the op-stream kernel consumes, so coded bytes are
    identical for the same parse; the shared `_fused_pair_body` does the
    model/coder work.

    Per-lane expansion state rides in the fori carry: the current token
    word, a phase counter (0 = flag pair, 1 = bits/dist0 pair, p >= 2 =
    dist pairs, >= 16 = post-EOS flush pairs), the literal-run remainder,
    and the token/literal stream cursors. Tokens and literal words are
    fetched through 96-row sliding windows (the decoder's s1 idiom) since
    lanes consume their streams at different rates; both advance <= 1
    element per pair, so refreshes gate safely to every 8th pair.

    bases rows: 0 = token window base, 1 = literal window base.

    ``lit_skip`` (the device-resident RLE path, ops/resident.py): the
    literal stream is the RAW block (already HBM-resident) rather than a
    host-compacted one, so match tokens must advance the literal cursor
    past their covered bytes. The jump is drained at 32 bytes (8 words)
    per pair while the lane sits in a wait phase (15 — emits PAD pairs;
    coding for a cell match needs only 2-3 of its 4 pairs). Window-safety
    proof: the refresh threshold drops to 32, so a refresh (end of step
    t, t&7==7) leaves offset <= 31; a read at step t+k (k <= 8) sees at
    most 7 subsequent advances of <= 8 words -> offset <= 31 + 56 = 87
    < 96 rows (conservatively 31 + 8*8 = 95 <= 95 still holds).
    Everything else (grammar, models, coded bytes) is identical — the
    static flag compiles to a separate kernel and host-parse paths are
    untouched.
    """
    Tt, B = tok_all.shape[1], tok_all.shape[2]
    Lw = lit_all.shape[1]
    CW = out_ref.shape[1]
    iota64 = jax.lax.broadcasted_iota(I32, (64, B), 0)
    iota96 = jax.lax.broadcasted_iota(I32, (96, B), 0)
    iota256 = jax.lax.broadcasted_iota(I32, (256, B), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, B), 0)

    regs_ref[...] = jnp.zeros((16, B), U32)
    regs_ref[2:4, :] = jnp.full((2, B), MASK32, U32)
    out_ref[0] = jnp.zeros((CW, B), U32)
    cb_ref[...] = iota256 + 1
    cs_ref[...] = iota256 + 1
    bits_ref[0:32, :] = iota32 + 1
    bits_ref[32:34, :] = jnp.ones((2, B), I32)
    d0_ref[...] = jnp.ones((32, B), I32)
    d1_ref[...] = jnp.ones((32, B), I32)
    bases_ref[...] = jnp.zeros((8, B), I32)
    stok_ref[...] = tok_all[0, 0:96, :]
    slit_ref[...] = lit_all[0, 0:96, :]

    def flush_rounds(wpos, force):
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

    def win_refresh(win_ref, base_row, src, rows, idx, th: int = 64):
        kb = idx >> 5
        base = bases_ref[base_row:base_row + 1, :]
        need = (idx - base) >= jnp.int32(th)
        bases_ref[base_row:base_row + 1, :] = jnp.where(need, kb << 5, base)
        zu = jnp.zeros((32, B), U32)
        for slot in range(3):
            sl = win_ref[32 * slot:32 * slot + 32]
            sl = jnp.where(need, zu, sl)
            for c in range(rows // 32):
                sel = need & ((kb + jnp.int32(slot)) == jnp.int32(c))
                sl = jnp.where(sel, src[0, 32 * c:32 * c + 32, :], sl)
            win_ref[32 * slot:32 * slot + 32] = sl

    def win_word(win_ref, base_row, idx):
        off = idx - bases_ref[base_row:base_row + 1, :]
        v = jnp.sum(jnp.where(iota96 == off, u2i(win_ref[...]), _i(0)),
                    axis=0, keepdims=True, dtype=I32)
        return i2u(v)

    def step(t, carry):
        if lit_skip:
            (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2,
             tok, phase, run, tidx, lidx, skip) = carry
        else:
            (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2,
             tok, phase, run, tidx, lidx) = carry

        # ---- fetch the next token on lanes that consumed theirs
        need = tok == _u(0)
        tnew = win_word(stok_ref, 0, tidx)
        fetched = jnp.where(need, tnew, tok)
        tok = jnp.where(need & (fetched == 0), jnp.broadcast_to(
            jnp.asarray(TOK_DONE, U32), fetched.shape), fetched)
        tidx = tidx + need.astype(I32)
        phase = jnp.where(need, _i(0), phase)

        done = tok == _u(TOK_DONE)
        isflush = (phase >= 16) & ~done
        ismatch = (u2i((tok >> 8) & 1) == 1) & ~done & ~isflush
        cnt_len = u2i(tok & 0xFF)
        nb = u2i((tok >> 9) & 0x1F)
        dist = u2i((tok >> 16) & 0x7FFF)
        eos = ismatch & (cnt_len == 255)
        islit = ~done & ~isflush & ~ismatch
        run = jnp.where(need & islit, cnt_len, run)
        if lit_skip:
            # a fetched match token owes cnt_len raw-stream bytes
            skip = jnp.where(need & ismatch & ~eos, cnt_len, skip)

        # ---- literal byte for this pair's slot 2
        lword = u2i(win_word(slit_ref, 1, lidx >> 2))
        lbyte = (lword >> ((3 - (lidx & 3)) << 3)) & 0xFF

        # ---- expand (token, phase) -> fused pair (m1, s1, m2, s2)
        p0 = ismatch & (phase == 0)
        p1 = ismatch & (phase == 1)
        pk = ismatch & (phase >= 2) & (phase < 15) if lit_skip \
            else ismatch & (phase >= 2)
        k1 = 2 * phase - 3
        k2 = 2 * phase - 2
        m1 = jnp.where(islit, _i(0),
             jnp.where(p0, _i(0),
             jnp.where(p1, _i(3),
             jnp.where(pk, 4 + k1,
             jnp.where(isflush, _i(MOP_FLUSH), _i(MOP_PAD))))))
        s1 = jnp.where(islit, _i(1),
             jnp.where(p1, nb,
             jnp.where(pk, (dist >> jnp.maximum(k1, 0)) & 1, _i(0))))
        m2 = jnp.where(islit, _i(2),
             jnp.where(p0, _i(1),
             jnp.where(p1 & (nb >= 2), _i(4),
             jnp.where(pk & (k2 <= nb - 2), 4 + k2,
             jnp.where(isflush, _i(MOP_FLUSH), _i(MOP_PAD))))))
        s2 = jnp.where(islit, lbyte,
             jnp.where(p0, cnt_len,
             jnp.where(p1, dist & 1,
             jnp.where(pk, (dist >> jnp.maximum(k2, 0)) & 1, _i(0)))))

        # ---- advance expansion state
        litlast = islit & (run == 1)
        run = jnp.where(islit, run - 1, run)
        lidx = lidx + islit.astype(I32)
        adv = (p1 & (nb <= 2)) | (pk & (k2 >= nb - 2))
        if lit_skip:
            drain = jnp.minimum(skip, _i(32))
            lidx = lidx + drain        # match lanes never read this pair
            skip = skip - drain
            skip_done = skip <= 0
            pwait = ismatch & (phase == 15)
            phase2 = jnp.where(p0 & eos, _i(16),
                     jnp.where(p0, _i(1),
                     jnp.where(p1 & ~adv, _i(2),
                     jnp.where(pk & ~adv, phase + 1,
                     jnp.where((adv | pwait) & ~skip_done, _i(15),
                     jnp.where(isflush, phase + 1, phase))))))
            fin = (adv | pwait) & skip_done & ~eos
            tok = jnp.where(litlast | fin, _u(0), tok)
        else:
            phase2 = jnp.where(p0 & eos, _i(16),
                     jnp.where(p0, _i(1),
                     jnp.where(p1 & ~adv, _i(2),
                     jnp.where(pk & ~adv, phase + 1,
                     jnp.where(isflush, phase + 1, phase)))))
            tok = jnp.where(litlast | (adv & ~eos), _u(0), tok)
        tok = jnp.where(isflush & (phase2 >= 20), _u(TOK_DONE), tok)
        phase = phase2

        carry2 = _fused_pair_body(
            m1, s1, m2, s2, (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2),
            stage_ref, cb_ref, cs_ref, bits_ref, d0_ref, d1_ref,
            iota32, iota256, iota64, wide)
        lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry2

        # ---- gated maintenance: output retirement + stream windows.
        # margins: ring threshold 40 + 8 pairs x <= 2 words = 56 < 64;
        # windows: off <= 63 at check + 8 advances = 71 < 96
        @pl.when((t & 7) == jnp.int32(7))
        def _():
            maxgap = jnp.max(u2i(wpos) - u2i(regs_ref[6:7, :]))

            @pl.when(maxgap >= jnp.int32(40))
            def _():
                flush_rounds(wpos, force=False)

            win_refresh(stok_ref, 0, tok_all, Tt, tidx)
            win_refresh(slit_ref, 1, lit_all, Lw, lidx >> 2,
                        th=32 if lit_skip else 64)

        out = (lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2,
               tok, phase, run, tidx, lidx)
        return out + (skip,) if lit_skip else out

    # expansion-state carries load from VMEM rows (splat zeros would give
    # Mosaic a replicated layout it cannot join with lane-varying updates)
    carry0 = (regs_ref[0:1, :], regs_ref[1:2, :], regs_ref[2:3, :],
              regs_ref[3:4, :], regs_ref[4:5, :], regs_ref[5:6, :],
              regs_ref[7:8, :], regs_ref[8:9, :], regs_ref[9:10, :],
              regs_ref[10:11, :], u2i(regs_ref[11:12, :]),
              u2i(regs_ref[12:13, :]), u2i(regs_ref[13:14, :]),
              u2i(regs_ref[14:15, :]))
    if lit_skip:
        carry0 = carry0 + (u2i(regs_ref[15:16, :]),)
    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t_max), step, carry0)
    lh, ll, rh, rl, ocnt, wpos, ob0, ob1, ob2 = carry[:9]

    lens_ref[0, 0:1, :] = u2i((wpos << 2) + ocnt)
    mask = (iota64 == (u2i(wpos) & 63)) & (ocnt > 0)
    stage_ref[...] = jnp.where(mask, ob0, stage_ref[...])
    wfin = wpos + b2u(ocnt > 0)
    for _ in range(3):
        flush_rounds(wfin, force=True)


def _encode_tok_pallas_call(toks, lits, t_max: int, cap_words: int,
                            interpret: bool, wide: bool,
                            lit_skip: bool = False):
    G, Tt, B = toks.shape
    Lw = lits.shape[1]
    # compiled lanes must fill vregs (128); the interpreter only needs
    # the 32-wide tiling the kernel's loads assume
    assert G == 1 and B % (32 if interpret else 128) == 0 \
        and Tt % 32 == 0 and Lw % 32 == 0
    assert Tt >= 96 and Lw >= 96 and cap_words % 32 == 0
    z = np.int32(0)
    return pl.pallas_call(
        partial(_encode_tok_kernel, t_max=t_max, wide=wide,
                lit_skip=lit_skip),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, Tt, B), lambda g: (z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lw, B), lambda g: (z, z, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cap_words, B), lambda g: (z, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda g: (z, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, cap_words, B), U32),
            jax.ShapeDtypeStruct((1, 8, B), I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((16, B), U32),    # coder registers + expansion state
            pltpu.VMEM((64, B), U32),    # output word ring
            pltpu.VMEM((256, B), I32),   # csum byte
            pltpu.VMEM((256, B), I32),   # csum size
            pltpu.VMEM((34, B), I32),    # csum bits + lit freqs
            pltpu.VMEM((32, B), I32),    # dist freq0
            pltpu.VMEM((32, B), I32),    # dist freq1
            pltpu.VMEM((96, B), U32),    # token window
            pltpu.VMEM((96, B), U32),    # literal-word window
            pltpu.VMEM((8, B), I32),     # window bases
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(toks, lits)


@partial(jax.jit, static_argnames=("t_max", "cap_words", "interpret",
                                   "wide", "lit_skip"))
def _encode_tok_pallas(toks, lits, t_max: int, cap_words: int,
                       interpret: bool = False, wide: bool = False,
                       lit_skip: bool = False):
    """toks: [1, Tt, B] u32 tokens; lits: [1, Lw, B] u32 packed literal
    bytes (4 big-endian per word). ``lit_skip``: the literal stream is
    the raw block and match tokens jump the cursor (resident RLE path)."""
    return _encode_tok_pallas_call(toks, lits, t_max, cap_words,
                                   interpret, wide, lit_skip)


@jax.jit
def _transpose_tok(x):
    """[1, B, Tt] u32 (contiguous host rows) -> [1, Tt, B] device layout."""
    return x.transpose(0, 2, 1)


def encode_data_tok(data: bytes, blk_bits: int, window: int, lz: bool,
                    cap: int, tc: int = ENC_TC, lanes: int = ENC_LANES,
                    interpret: bool = False, depth: int = None):
    """Whole-buffer encode through the token-input kernel (cold sqzt
    path). Blocks whose parse exceeds the token/literal caps re-route
    through the op-stream kernel; payload bytes are identical either way
    for the same parse. Returns per-block payloads."""
    from sqz_tpu import native
    if blk_bits > 16:
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    if depth is None:
        depth = int(os.environ.get("SQZ_FAST_DEPTH", "32"))
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    tok_cap = min(-(-(2 * bs // 3 + 96) // 32) * 32, 1 << 14)
    lit_cap = max(bs, 128)
    toks, lits, counts, _mx = native.sqz4_tok_plan(
        data, window, blk_bits, lz, tok_cap, lit_cap, depth=depth)
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    wide = blk_bits >= 15
    payloads: list = [None] * NB
    # straggler segregation (same rationale as decode_groups): group
    # blocks by pair count so one literal-heavy block does not stretch a
    # whole text group's loop bound / literal-slab width
    fit_all = [b for b in range(NB) if counts[b, 2] >= 0]
    fit_all.sort(key=lambda b: int(counts[b, 2]))
    pend = []
    for g0 in range(0, len(fit_all), lanes):
        fit = fit_all[g0:g0 + lanes]
        n = len(fit)
        # bucket the static dims so the jit cache hits across groups
        # (pad pairs are cheap idle lanes); interpret mode keeps exact
        # sizes — every padded pair costs real interpreter time there
        bq = 32 if interpret else 1024
        Tt = max(96, min(-(-int(counts[fit, 0].max()) // bq) * bq, tok_cap))
        lit_words = (int(counts[fit, 1].max()) + 3) // 4
        Lw = max(96, min(-(-lit_words // bq) * bq, lit_cap // 4))
        t_max = -(-int(counts[fit, 2].max()) // bq) * bq if not interpret \
            else int(counts[fit, 2].max())
        tarr = np.zeros((1, lanes, Tt), np.uint32)
        larr = np.zeros((1, lanes, Lw * 4), np.uint8)
        tarr[0, :n] = toks[fit, :Tt]
        larr[0, :n] = lits[fit, :Lw * 4]
        tdev = _transpose_tok(jnp.asarray(tarr))
        ldev = _pack_ops_words(jnp.asarray(larr))
        words, lens = _encode_tok_pallas(tdev, ldev, t_max, cap_words,
                                         interpret, wide)
        pend.append((fit, words, lens))
    for fit, words, lens in pend:
        lens_np = np.asarray(lens)
        if int(lens_np[:, 0].max(initial=0)) > cap_words * 4:
            raise ValueError("compressed block exceeded the output capacity")
        grp = unpack_group_payloads(fetch_words_trimmed(words, lens_np),
                                    lens_np, len(fit))
        for i, b in enumerate(fit):
            payloads[b] = grp[i]
    over = [b for b in range(NB) if payloads[b] is None]
    if over:
        # cap-overflow blocks (pathological parses): op-stream fallback
        for b in over:
            blk = data[b * bs:(b + 1) * bs]
            sub = encode_data_full(blk, blk_bits, window, lz, cap, tc,
                                   lanes, interpret=interpret, parse="fast")
            payloads[b] = sub[0]
    return payloads


# ---------------------------------------------------- squeeze bit packer

def _bitpack_kernel(ops_ref, out_ref, lens_ref, regs_ref, stage_ref):
    """Assemble squeeze bitstreams from recorded writes (one u32 per write:
    nbits in bits 29..25, the value bit-reversed in bits 24..0; 0 = pad).
    The adaptive-Huffman planning runs on the host at native speed
    (native.squeeze_plan_pack); this kernel is the device bitstream stage —
    the parallel equivalent of the reference's shift register
    (attic/map_experiment/bitstream.h:28-63), one 64-bit accumulator per
    lane, spilling 32-bit words through the ring/retire machinery.

    regs rows: 0 acc_hi, 1 acc_lo, 2 bitcnt, 3 wpos, 4 s2base.
    """
    tc = pl.program_id(1)
    nt = pl.num_programs(1)
    TC, B = ops_ref.shape[1], ops_ref.shape[2]
    CW = out_ref.shape[1]
    iota64 = jax.lax.broadcasted_iota(I32, (64, B), 0)

    @pl.when(tc == 0)
    def _():
        regs_ref[...] = jnp.zeros((8, B), U32)
        out_ref[0] = jnp.zeros((CW, B), U32)

    def flush_rounds(wpos, force):
        s2base = u2i(regs_ref[4:5, :])
        gap = u2i(wpos) - s2base
        doit = gap >= jnp.int32(1 if force else 32)
        half = (s2base >> 5) & 1
        chunk = jnp.where(doit, s2base >> 5, jnp.int32(-1))
        rows = jnp.where(half == 0, stage_ref[0:32], stage_ref[32:64])
        for c in range(CW // 32):
            out_ref[0, 32 * c:32 * c + 32] = jnp.where(
                chunk == jnp.int32(c), rows,
                out_ref[0, 32 * c:32 * c + 32])
        regs_ref[4:5, :] = i2u(jnp.where(doit, s2base + 32, s2base))

    def step(i, carry):
        ah, al, bitcnt, wpos = carry
        w = ops_ref[0, pl.ds(i, 1), :]
        nb = w >> 25
        val = w & _u(0x1FFFFFF)
        # append MSB-of-chunk-first at bit offset bitcnt
        sh_h, sh_l = shl64(jnp.zeros_like(val), val,
                           _u(64) - bitcnt - nb)
        live = nb > 0
        ah = jnp.where(live, ah | sh_h, ah)
        al = jnp.where(live, al | sh_l, al)
        bitcnt = bitcnt + nb
        # spill one 32-bit word when full (nb <= 24, bitcnt < 32 before)
        spill = bitcnt >= 32
        mask = (iota64 == (u2i(wpos) & 63)) & spill
        stage_ref[...] = jnp.where(mask, ah, stage_ref[...])
        wpos = wpos + b2u(spill)
        ah = jnp.where(spill, al, ah)
        al = jnp.where(spill, jnp.zeros_like(al), al)
        bitcnt = bitcnt - jnp.where(spill, _u(32), _u(0))

        t = tc * jnp.int32(TC) + i

        @pl.when((t & 7) == jnp.int32(0))
        def _():
            @pl.when(jnp.max(u2i(wpos) - u2i(regs_ref[4:5, :]))
                     >= jnp.int32(44))
            def _():
                flush_rounds(wpos, force=False)

        return ah, al, bitcnt, wpos

    carry0 = tuple(regs_ref[i:i + 1, :] for i in (0, 1, 2, 3))
    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(TC), step, carry0)
    ah, al, bitcnt, wpos = carry
    for i, v in zip((0, 1, 2, 3), (ah, al, bitcnt, wpos)):
        regs_ref[i:i + 1, :] = v

    @pl.when(tc == nt - 1)
    def _():
        # reference flush pads the final 64-bit shift word with zeros
        # (bitstream.h:112-118): spill both accumulator words, report
        # ceil(bits/64)*8 bytes
        bits = (wpos << 5) + bitcnt
        # spill two words unconditionally: the reference flush pads the
        # final 64-bit shift word with zeros (bitstream.h:112-118), and the
        # pad region must overwrite stale ring rows
        mask = iota64 == (u2i(wpos) & 63)
        stage_ref[...] = jnp.where(mask, jnp.where(bitcnt > 0, ah,
                                                   jnp.zeros_like(ah)),
                                   stage_ref[...])
        mask = iota64 == (u2i(wpos + 1) & 63)
        stage_ref[...] = jnp.where(mask, al, stage_ref[...])
        lens_ref[0, 0:1, :] = u2i(((bits + 63) >> 6) << 3)
        for _ in range(3):
            flush_rounds(wpos + 2, force=True)


@partial(jax.jit, static_argnames=("cap_words", "tc", "interpret"))
def _bitpack_pallas(ops, cap_words: int, tc: int = ENC_TC,
                    interpret: bool = False):
    """ops: [G, T, B] u32 write records; returns (words, lens[G,8,B])."""
    G, T, B = ops.shape
    assert B % 128 == 0 and T % tc == 0 and cap_words % 32 == 0
    z = np.int32(0)
    return pl.pallas_call(
        _bitpack_kernel,
        grid=(G, T // tc),
        in_specs=[pl.BlockSpec((1, tc, B), lambda g, t: (g, t, z),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, cap_words, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, B), lambda g, t: (g, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, cap_words, B), U32),
            jax.ShapeDtypeStruct((G, 8, B), I32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, B), U32),
            pltpu.VMEM((64, B), U32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ops)


def squeeze_encode_data(data: bytes, blk_bits: int, win_bits: int, cap: int,
                        tc: int = ENC_TC, lanes: int = ENC_LANES,
                        interpret: bool = False, warm: bool = False,
                        parse: str = "auto"):
    """squeeze whole-buffer encode: host adaptive-Huffman planning (native,
    threaded) + device bitstream assembly. ``warm``: sqzt v2 (the planning
    stage handles seeding; the bit packer is state-free). ``parse``:
    'fast' bounded matcher ('auto' default — this is an sqzt-only path,
    same policy as the sqz4 engine; the squeeze matcher is ~2/3 of the
    plan cost, measured 2.5x on text — PERF.md) or 'exact'."""
    from sqz_tpu import native
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    parse = parse_mode(parse)
    depth = int(os.environ.get("SQZ_FAST_DEPTH", "32"))
    # worst case ~1 write/bit-run: <= 4 per literal (sym path chunk, NYT,
    # raw) and a few per match; 4 per byte + EOS margin is generous
    tw_cap = -(-(4 * bs + 64) // tc) * tc
    words, mx = native.squeeze_plan_pack(data, win_bits, blk_bits,
                                         lanes, tw_cap, warm=warm,
                                         parse=parse, depth=depth)
    rows = max(-(-int(mx) // tc) * tc, tc)
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    out, lens = _bitpack_pallas(jnp.asarray(np.ascontiguousarray(
        words[:, :rows])), cap_words, tc, interpret)
    lens = np.asarray(lens)
    if int(lens[:, 0].max(initial=0)) > cap_words * 4:
        raise ValueError("compressed block exceeded the output capacity")
    return unpack_group_payloads(np.asarray(out), lens, NB)


# ----------------------------------------------------------------- decoder

ST_FLAG, ST_BYTE, ST_SIZE, ST_BITS, ST_DIST, ST_DONE, ST_ERR = range(7)
E_ILSEQ, E_SIZE, E_BITS, E_DIST, E_OVERRUN = 1, 2, 3, 4, 5


def _i(x):
    return jnp.asarray(x, I32)


def _onehot_row(tab_ref, idx, rows):
    """tab[idx[lane], lane] for an i32 [rows, B] table; idx i32 [1, B]."""
    iota = jax.lax.broadcasted_iota(I32, (rows, tab_ref.shape[-1]), 0)
    return jnp.sum(jnp.where(iota == idx, tab_ref[...], _i(0)), axis=0,
                   keepdims=True, dtype=I32)



class _Rows:
    """Slot view over the leading row axis of a 2-D scratch ref - lets one
    physical scratch buffer hold several interleaved coder slots (the Mosaic
    scheduler overlaps the slots' independent dependence chains)."""

    def __init__(self, ref, off, rows):
        self.ref, self.off, self.rows = ref, off, rows
        self.shape = (rows, ref.shape[-1])

    def _m(self, idx):
        if idx is Ellipsis:
            return slice(self.off, self.off + self.rows)
        if isinstance(idx, tuple):
            return (self._m(idx[0]),) + idx[1:]
        if isinstance(idx, slice):
            return slice(self.off + idx.start, self.off + idx.stop)
        raise TypeError(idx)

    def __getitem__(self, idx):
        return self.ref[self._m(idx)]

    def __setitem__(self, idx, v):
        self.ref[self._m(idx)] = v


class _Slot3:
    """View selecting one leading-axis slot of a 3-D block ref."""

    def __init__(self, ref, sl):
        self.ref, self.sl = ref, sl

    def _m(self, idx):
        assert isinstance(idx, tuple) and idx[0] == 0
        return (self.sl,) + idx[1:]

    def __getitem__(self, idx):
        return self.ref[self._m(idx)]

    def __setitem__(self, idx, v):
        self.ref[self._m(idx)] = v


def _decode_kernel(payload_all, meta_all, *rest, t_max: int,
                   wide: bool = False, slots: int = 1,
                   seeded: bool = False, fused: bool = False):
    """One grid step decodes LANES blocks in lock-step.

    Per-class cumulative-frequency tables (inclusive csum) live in VMEM and
    are updated incrementally (+1 on every slot >= decoded symbol), so the
    hot step never recomputes a prefix sum. Table layouts trade on the
    value range (same trick, two regimes):

    * non-wide (model totals < 2^15, blocks <= 2^14): the byte and size
      csums pack into ONE i32 table (cb | cs<<16) — one read and one
      suffix-RMW per step instead of two of each;
    * wide (totals < 2^17): each entry stores csum*512 + row so one masked
      max yields symbol AND start together (csum is strictly increasing —
      freqs start at 1 and never decrease — so row order equals value
      order), replacing the separate popcount reduction.

    The 32-row distance-bit binary models always pack (d0 | d1<<16; each
    half <= 1 + matches < 2^16 even at 64 KiB blocks), and the bits-count
    table always stores csum*64 + row.

    Stream bytes feed through a 4-word lookahead register (word-aligned
    refills from a 96-row sliding window over the payload). Decoded tokens
    leave as three dense streams — literal bytes, token-kind bits, match
    records (len<<16|dist) — each via a 64-row VMEM ring retired in 32-row
    chunks; sqz_tpu.native.assemble (or the numpy fallback) reconstructs
    the output bytes, which keeps every per-step memory access
    position-independent.

    bases rows: 0 s1base, 1 lit, 2 tok, 3 mrec ring retirement bases.
    counts rows: 0 optr, 1 nlit, 2 ntok, 3 nmatch, 4 err, 5 steps, 6 ovf.

    ``seeded`` (sqzt v2 warm start, FORMAT.md §3.1): a model-seed table
    input follows meta, holding the packed wide-mode table forms — rows
    0:256 byte csum*512+row, 256:512 size csum*512+row, 512:544 bits
    csum*64+row, 544:576 d0|d1<<16, 576/577 literal freqs — and meta row 2
    carries the shared-dictionary length per lane (distance validation
    allows dist <= produced + dlen; the host assembler resolves the
    dictionary bytes).
    """
    if seeded:
        assert wide, "warm model totals need the wide divider"
        seed_all, rest = rest[0], rest[1:]
    lit_all, tok_all, mrec_all, counts_all = rest[:4]
    scratch = rest[4:]
    packed = not wide
    if packed:
        (cbs_all, bits_all, d01_all, s1_all,
         litring_all, tokring_all, mrecring_all, bases_all) = scratch
        cb_all = cs_all = cbs_all
    else:
        (cb_all, cs_all, bits_all, d01_all, s1_all,
         litring_all, tokring_all, mrecring_all, bases_all) = scratch
    Pw, B = payload_all.shape[1], payload_all.shape[2]
    LW, TW, MW = lit_all.shape[1], tok_all.shape[1], mrec_all.shape[1]
    iota64 = jax.lax.broadcasted_iota(I32, (64, B), 0)
    iota96 = jax.lax.broadcasted_iota(I32, (96, B), 0)
    iota256 = jax.lax.broadcasted_iota(I32, (256, B), 0)
    iota32 = jax.lax.broadcasted_iota(I32, (32, B), 0)
    zu = jnp.zeros((1, B), U32)
    zi = jnp.zeros((1, B), I32)

    def make(sl):
        payload_ref = _Slot3(payload_all, sl)
        meta_ref = _Slot3(meta_all, sl)
        lit_ref = _Slot3(lit_all, sl)
        tok_ref = _Slot3(tok_all, sl)
        mrec_ref = _Slot3(mrec_all, sl)
        counts_ref = _Slot3(counts_all, sl)
        cb_ref = _Rows(cb_all, sl * 256, 256)
        cs_ref = _Rows(cs_all, sl * 256, 256)
        bits_ref = _Rows(bits_all, sl * 32, 32)
        d01_ref = _Rows(d01_all, sl * 32, 32)
        s1_ref = _Rows(s1_all, sl * 96, 96)
        litring_ref = _Rows(litring_all, sl * 64, 64)
        tokring_ref = _Rows(tokring_all, sl * 64, 64)
        mrecring_ref = _Rows(mrecring_all, sl * 64, 64)
        bases_ref = _Rows(bases_all, sl * 8, 8)

        # ---- init: fresh models (freq 1 -> inclusive csum = index + 1),
        # or the warm seed table (packed forms precomputed on the host)
        if seeded:
            seed_ref = _Slot3(seed_all, sl)
            cb_ref[...] = seed_ref[0, 0:256, :]
            cs_ref[...] = seed_ref[0, 256:512, :]
            bits_ref[...] = seed_ref[0, 512:544, :]
            d01_ref[...] = seed_ref[0, 544:576, :]
            bases_ref[...] = jnp.zeros((8, B), I32)
            bases_ref[4:5, :] = seed_ref[0, 576:577, :]
            bases_ref[5:6, :] = seed_ref[0, 577:578, :]
        else:
            if packed:
                cb_ref[...] = (iota256 + 1) * 65537          # cb | cs << 16
            else:
                cb_ref[...] = (iota256 + 1) * 512 + iota256  # csum*512 + row
                cs_ref[...] = (iota256 + 1) * 512 + iota256
            bits_ref[...] = (iota32 + 1) * 64 + iota32       # csum*64 + row
            d01_ref[...] = jnp.full((32, B), 65537, I32)     # d0 | d1 << 16
            # lit model as two scalar rows folded into bases_ref rows 4, 5
            bases_ref[...] = jnp.zeros((8, B), I32)
            bases_ref[4:5, :] = jnp.ones((1, B), I32)
            bases_ref[5:6, :] = jnp.ones((1, B), I32)
        s1_ref[...] = payload_ref[0, 0:96, :]
        sizes = meta_ref[0, 1:2, :] + zi
        dlen = meta_ref[0, 2:3, :] + zi    # warm shared-dictionary length

        def retire(ring_ref, base_row: int, out_ref, ow: int, wpos, force):
            base = bases_ref[base_row:base_row + 1, :]
            gap = wpos - base
            doit = gap >= jnp.int32(1 if force else 32)
            half = (base >> 5) & 1
            chunk = jnp.where(doit, base >> 5, jnp.int32(-1))
            rows = jnp.where(half == 0, ring_ref[0:32], ring_ref[32:64])
            for c in range(ow // 32):
                out_ref[0, 32 * c:32 * c + 32] = jnp.where(
                    chunk == jnp.int32(c), rows,
                    out_ref[0, 32 * c:32 * c + 32])
            bases_ref[base_row:base_row + 1, :] = jnp.where(doit, base + 32, base)

        def s1_refresh(widx):
            kb = (widx >> 5)
            need = (widx - bases_ref[0:1, :]) >= jnp.int32(64)
            newbase = jnp.where(need, kb << 5, bases_ref[0:1, :])
            bases_ref[0:1, :] = newbase
            for slot in range(3):
                sl = s1_ref[32 * slot:32 * slot + 32]
                sl = jnp.where(need, zu, sl)
                for c in range(Pw // 32):
                    sel = need & ((kb + jnp.int32(slot)) == jnp.int32(c))
                    sl = jnp.where(sel, payload_ref[0, 32 * c:32 * c + 32, :], sl)
                s1_ref[32 * slot:32 * slot + 32] = sl

        def s1_word(widx):
            """payload word widx (per-lane) from the s1 window, as u32."""
            off = widx - bases_ref[0:1, :]
            v = jnp.sum(jnp.where(iota96 == off, u2i(s1_ref[...]), _i(0)),
                        axis=0, keepdims=True, dtype=I32)
            return i2u(v)

        def la_refill(la, lav, rpos):
            """Load one stream word into the 16-byte lookahead for lanes <= 12.

            (rpos + lav) is word-aligned on the stream side by construction, but
            the buffer offset `lav` is an arbitrary byte offset — the loaded word
            splits across buffer words lav>>2 and lav>>2 + 1. Bytes >= lav are
            zero (shifts feed zeros; loads only ever OR into that region).
            """
            la0, la1, la2, la3 = la
            need = lav <= 12
            w = s1_word((rpos + lav) >> 2)
            wsel = lav >> 2
            sr = i2u((lav & 3) << 3)
            hi = w >> sr
            lo = (w << (_u(31) - sr)) << 1
            zero = jnp.zeros_like(w)
            la0 = la0 | jnp.where(need & (wsel == 0), hi, zero)
            la1 = (la1 | jnp.where(need & (wsel == 1), hi, zero)
                   | jnp.where(need & (wsel == 0), lo, zero))
            la2 = (la2 | jnp.where(need & (wsel == 2), hi, zero)
                   | jnp.where(need & (wsel == 1), lo, zero))
            la3 = (la3 | jnp.where(need & (wsel == 3), hi, zero)
                   | jnp.where(need & (wsel == 2), lo, zero))
            return (la0, la1, la2, la3), jnp.where(need, lav + 4, lav)

        def la_shift(la, k):
            """Shift the 4-word lookahead left by k bytes (k in 0..8)."""
            la0, la1, la2, la3 = la
            wk = k >> 2
            w0 = jnp.where(wk == 0, la0, jnp.where(wk == 1, la1, la2))
            w1 = jnp.where(wk == 0, la1, jnp.where(wk == 1, la2, la3))
            w2 = jnp.where(wk == 0, la2, jnp.where(wk == 1, la3, zu))
            w3 = jnp.where(wk == 0, la3, zu)
            s = i2u((k & 3) << 3)
            sl = _u(31) - s
            n0 = (w0 << s) | ((w1 >> 1) >> sl)
            n1 = (w1 << s) | ((w2 >> 1) >> sl)
            n2 = (w2 << s) | ((w3 >> 1) >> sl)
            n3 = w3 << s
            return (n0, n1, n2, n3)

        def step(t, c):
            (ch, cl, lh, ll, rh, rl, la0, la1, la2, la3, lav,
             state, rpos, psize, pbits, pdist, bitpos,
             optr, nlit, ntok, nmatch, litw, tokw, err,
             litp, tokp, mrecp) = c
            la = (la0, la1, la2, la3)
            active = state < ST_DONE
            is_flag = state == ST_FLAG
            is_byte = state == ST_BYTE
            is_size = state == ST_SIZE
            is_bits = state == ST_BITS
            is_dist = state == ST_DIST
            is256 = is_byte | is_size

            # ---- total of the active model (pre-update)
            if packed:
                p255 = cb_ref[255:256, :]
                tot_b = p255 & 0xFFFF
                tot_s = jax.lax.shift_right_logical(p255, jnp.int32(16))
            else:
                tot_b = jax.lax.shift_right_logical(cb_ref[255:256, :],
                                                    jnp.int32(9))
                tot_s = jax.lax.shift_right_logical(cs_ref[255:256, :],
                                                    jnp.int32(9))
            tot_bits = jax.lax.shift_right_logical(bits_ref[31:32, :],
                                                   jnp.int32(6))
            f01 = _onehot_row(d01_ref, bitpos, 32)
            f0 = f01 & 0xFFFF
            f1 = jax.lax.shift_right_logical(f01, jnp.int32(16))
            lit0 = bases_ref[4:5, :]
            lit1 = bases_ref[5:6, :]
            total = jnp.where(is_byte, tot_b,
                    jnp.where(is_size, tot_s,
                    jnp.where(is_bits, tot_bits,
                    jnp.where(is_flag, lit0 + lit1, f0 + f1))))
            total = jnp.where(active, total, zi + 1)
            tot_u = i2u(total)

            # ---- underflow escape: range < total -> consume 2, re-inflate
            uf = active & (rh == 0) & (rl < tot_u)
            top2 = la0 >> 16
            nch_, ncl_ = shl64(ch, cl, _u(16))
            ch = jnp.where(uf, nch_ | top2, ch)
            cl = jnp.where(uf, ncl_, cl)
            nlh_, nll_ = shl64(lh, ll, _u(16))
            lh = jnp.where(uf, nlh_, lh)
            ll = jnp.where(uf, nll_, ll)
            rh = jnp.where(uf, ~lh, rh)
            rl = jnp.where(uf, ~ll, rl)
            la = la_shift(la, jnp.where(uf, _i(2), _i(0)))
            lav = lav - jnp.where(uf, _i(2), _i(0))
            rpos = rpos + jnp.where(uf, _i(2), _i(0))

            # ---- rng_div = range // total; diff = code - low; cum by binsearch
            rdh, rdl, _ = div64_small(rh, rl,
                                      jnp.where(active, tot_u, _u(1)), wide)
            dfh, dfl = sub64(ch, cl, lh, ll)
            # cum = diff // rng_div: f32 quotient estimate (abs error << 1 since
            # cum < total < 2^17 and both f32 conversions are ~2^-23 relative),
            # then exact +-2 correction with incremental u64 products
            rd_f = jnp.maximum(f32_from_u64(rdh, rdl), jnp.float32(1.0))
            est = (f32_from_u64(dfh, dfl) / rd_f).astype(I32)
            c0 = jnp.clip(est - 2, zi, total - 1)
            p0h, p0l = mul_small64(i2u(c0), rdh, rdl)
            r2h, r2l = shl64(rdh, rdl, _u(1))
            r3h, r3l = add64(r2h, r2l, rdh, rdl)
            r4h, r4l = shl64(rdh, rdl, _u(2))
            cum = c0
            for kh, kl, k in ((rdh, rdl, 1), (r2h, r2l, 2),
                              (r3h, r3l, 3), (r4h, r4l, 4)):
                th_, tl_ = add64(p0h, p0l, kh, kl)
                take = ((c0 + k) < total) & ~lt64(dfh, dfl, th_, tl_)
                cum = jnp.where(take, c0 + k, cum)
            bh_, bl_ = mul_small64(tot_u, rdh, rdl)
            bad_cum = active & ~lt64(dfh, dfl, bh_, bl_)

            # ---- symbol + start/size from the class csum tables.  The
            # csums are strictly increasing (every freq >= 1), so with
            # csum*K + row entries one masked max returns the last row
            # <= cum — symbol count and start value in a single reduction.
            if packed:
                p = cb_ref[...]
                tab256 = jnp.where(
                    is_byte, p & 0xFFFF,
                    jax.lax.shift_right_logical(p, jnp.int32(16)))
                le256 = tab256 <= cum
                sym256 = jnp.sum(jnp.where(le256, _i(1), _i(0)), axis=0,
                                 keepdims=True, dtype=I32)
                start256 = jnp.max(jnp.where(le256, tab256, _i(0)),
                                   axis=0, keepdims=True)
                at256 = jnp.min(jnp.where(le256, jnp.int32(0x7FFFFFFF),
                                          tab256),
                                axis=0, keepdims=True)
            else:
                tab256 = jnp.where(is_byte, cb_ref[...], cs_ref[...])
                le256 = tab256 <= cum * 512 + 511
                m256 = jnp.max(jnp.where(le256, tab256, _i(-1)),
                               axis=0, keepdims=True)
                at256 = jax.lax.shift_right_logical(
                    jnp.min(jnp.where(le256, jnp.int32(0x7FFFFFFF), tab256),
                            axis=0, keepdims=True), jnp.int32(9))
                sym256 = jnp.where(m256 < 0, zi, (m256 & 511) + 1)
                start256 = jnp.where(
                    m256 < 0, zi,
                    jax.lax.shift_right_logical(m256, jnp.int32(9)))
            tabb = bits_ref[...]
            le32 = tabb <= cum * 64 + 63
            m32 = jnp.max(jnp.where(le32, tabb, _i(-1)),
                          axis=0, keepdims=True)
            at32 = jax.lax.shift_right_logical(
                jnp.min(jnp.where(le32, jnp.int32(0x7FFFFFFF), tabb),
                        axis=0, keepdims=True), jnp.int32(6))
            sym32 = jnp.where(m32 < 0, zi, (m32 & 63) + 1)
            start32 = jnp.where(
                m32 < 0, zi,
                jax.lax.shift_right_logical(m32, jnp.int32(6)))
            bin0 = jnp.where(is_flag, lit0, f0)
            bin1 = jnp.where(is_flag, lit1, f1)
            symb = jnp.where(cum >= bin0, _i(1), _i(0))
            startb = jnp.where(symb == 1, bin0, zi)
            sizeb = jnp.where(symb == 1, bin1, bin0)
            sym = jnp.where(is256, sym256, jnp.where(is_bits, sym32, symb))
            start = jnp.where(is256, start256,
                              jnp.where(is_bits, start32, startb))
            size = jnp.where(is256, at256 - start256,
                             jnp.where(is_bits, at32 - start32, sizeb))

            # ---- coder update: low += start*rng_div; range = rng_div*size
            su, zu_ = i2u(jnp.where(active, start, zi)), zu
            ah_, al_ = mul_small64(su, rdh, rdl)
            nlh_, nll_ = add64(lh, ll, ah_, al_)
            lh = jnp.where(active, nlh_, lh)
            ll = jnp.where(active, nll_, ll)
            nrh_, nrl_ = mul_small64(i2u(jnp.where(active, size, zi + 1)), rdh, rdl)
            rh = jnp.where(active, nrh_, rh)
            rl = jnp.where(active, nrl_, rl)

            # ---- adaptive update (strictly after coding)
            if packed:
                delta = jnp.where(is_byte, _i(1),
                                  jnp.where(is_size, _i(0x10000), zi))
                cb_ref[...] = cb_ref[...] + jnp.where(
                    iota256 >= sym, delta, zi)
            else:
                cb_ref[...] = cb_ref[...] + jnp.where(
                    is_byte & (iota256 >= sym), _i(512), _i(0))
                cs_ref[...] = cs_ref[...] + jnp.where(
                    is_size & (iota256 >= sym), _i(512), _i(0))
            bits_ref[...] = bits_ref[...] + jnp.where(
                is_bits & (iota32 >= sym), _i(64), _i(0))
            bases_ref[4:5, :] = lit0 + jnp.where(is_flag & (sym == 0), _i(1), _i(0))
            bases_ref[5:6, :] = lit1 + jnp.where(is_flag & (sym == 1), _i(1), _i(0))
            ddelta = jnp.where(is_dist & (sym == 0), _i(1),
                               jnp.where(is_dist & (sym == 1), _i(0x10000),
                                         zi))
            d01_ref[...] = d01_ref[...] + jnp.where(
                iota32 == bitpos, ddelta, zi)

            # ---- renorm consume: splice cnt leading bytes of la into code
            sh_h, sh_l = add64(lh, ll, rh, rl)
            cnt = jnp.where(active, u2i(clz64(lh ^ sh_h, ll ^ sh_l) >> 3), zi)
            shift = umin(i2u(cnt) << 3, _u(63))
            full = cnt >= 8
            drop = _u(64) - umin(i2u(cnt) << 3, _u(64))
            th_, tl_ = shr64(la[0], la[1], umin(drop, _u(63)))
            th_ = jnp.where(cnt == 0, zu, jnp.where(full, la[0], th_))
            tl_ = jnp.where(cnt == 0, zu, jnp.where(full, la[1], tl_))
            sch, scl = shl64(ch, cl, shift)
            ch = jnp.where(full, th_, sch | th_)
            cl = jnp.where(full, tl_, scl | tl_)
            slh, sll = shl64(lh, ll, shift)
            lh = jnp.where(full, zu, slh)
            ll = jnp.where(full, zu, sll)
            srh, srl = shl64(rh, rl, shift)
            rh = jnp.where(full, zu, srh)
            rl = jnp.where(full, zu, srl)
            la = la_shift(la, cnt)
            lav = lav - cnt
            rpos = rpos + cnt

            # ---- state machine + token outputs
            nstate = state
            nstate = jnp.where(is_flag,
                               jnp.where(sym == 1, _i(ST_BYTE), _i(ST_SIZE)), nstate)

            # literal byte -> dense literal stream + token bit 0
            lit_over = is_byte & (optr >= sizes)
            litw = litw | jnp.where(is_byte, i2u(sym) << i2u(24 - ((nlit & 3) << 3)),
                                    zu)
            spill_lit = is_byte & ((nlit & 3) == 3)
            mask = (iota64 == (litp & 63)) & spill_lit
            litring_ref[...] = jnp.where(mask, litw, litring_ref[...])
            litw = jnp.where(spill_lit, zu, litw)
            litp = litp + jnp.where(spill_lit, _i(1), _i(0))
            nlit = nlit + jnp.where(is_byte, _i(1), _i(0))
            optr = optr + jnp.where(is_byte, _i(1), _i(0))
            nstate = jnp.where(is_byte, _i(ST_FLAG), nstate)

            eos = is_size & (sym == 255)
            bad_size = is_size & ~eos & ((sym < 2) | (sym > 254))
            psize = jnp.where(is_size & ~eos, sym, psize)
            nstate = jnp.where(is_size, jnp.where(eos, _i(ST_DONE), _i(ST_BITS)),
                               nstate)

            done_now = is_bits & (sym == 1)
            bad_bits = is_bits & (sym == 0)
            pbits = jnp.where(is_bits, sym, pbits)
            pdist = jnp.where(is_bits, zi, pdist)
            bitpos = jnp.where(is_bits, zi, bitpos)
            nstate = jnp.where(is_bits & ~done_now & ~bad_bits, _i(ST_DIST), nstate)

            pdist = jnp.where(is_dist, pdist | (sym << bitpos), pdist)
            bitpos = bitpos + jnp.where(is_dist, _i(1), _i(0))
            dist_done = is_dist & (bitpos == pbits - 1)
            emit = done_now | dist_done
            dist = pdist | jnp.where(
                emit, jnp.int32(1) << jnp.where(pbits > 0, pbits - 1, zi), zi)
            bad_dist = emit & (dist > optr + dlen)
            over = emit & (optr + psize > sizes)
            emit_ok = emit & ~bad_dist & ~over

            # match record + token bit 1
            mrec = i2u(psize) << 16 | i2u(dist)
            mask = (iota64 == (mrecp & 63)) & emit_ok
            mrecring_ref[...] = jnp.where(mask, mrec, mrecring_ref[...])
            mrecp = mrecp + jnp.where(emit_ok, _i(1), _i(0))
            nmatch = nmatch + jnp.where(emit_ok, _i(1), _i(0))
            optr = optr + jnp.where(emit_ok, psize, zi)
            tokw = tokw | jnp.where(emit_ok, _u(1) << i2u(ntok & 31), zu)
            is_tok = is_byte | emit_ok
            ntok = ntok + jnp.where(is_tok, _i(1), _i(0))
            spill_tok = is_tok & ((ntok & 31) == 0)
            mask = (iota64 == (tokp & 63)) & spill_tok
            tokring_ref[...] = jnp.where(mask, tokw, tokring_ref[...])
            tokw = jnp.where(spill_tok, zu, tokw)
            tokp = tokp + jnp.where(spill_tok, _i(1), _i(0))
            nstate = jnp.where(emit, _i(ST_FLAG), nstate)

            # ---- errors
            newerr = jnp.where(bad_cum, _i(E_ILSEQ),
                     jnp.where(bad_size, _i(E_SIZE),
                     jnp.where(bad_bits, _i(E_BITS),
                     jnp.where(bad_dist, _i(E_DIST),
                     jnp.where(lit_over | over, _i(E_OVERRUN), zi)))))
            err = jnp.where(active & (err == 0) & (newerr > 0), newerr, err)
            nstate = jnp.where(active & (newerr > 0), _i(ST_ERR), nstate)
            state = jnp.where(active, nstate, state)

            # ---- refill the lookahead (3 word-loads cover a 10-byte burst)
            la, lav = la_refill(la, lav, rpos)
            la, lav = la_refill(la, lav, rpos)
            la, lav = la_refill(la, lav, rpos)

            # ---- window slide + ring retirements: the max-reduce trigger
            # checks run every 8th step (widx moves <= 3 words/step: 64+27 < 96
            # window; lit <= 1 word per 4 steps, mrec <= 1/step: 44+8+2 < 64
            # ring rows — no overrun between checks)
            widx = (rpos + lav) >> 2

            @pl.when((t & 7) == jnp.int32(0))
            def _():
                @pl.when(jnp.max(widx - bases_ref[0:1, :]) >= jnp.int32(64))
                def _():
                    s1_refresh(widx)

                @pl.when(jnp.max(litp - bases_ref[1:2, :]) >= jnp.int32(44))
                def _():
                    retire(litring_ref, 1, lit_ref, LW, litp, False)

                @pl.when(jnp.max(tokp - bases_ref[2:3, :]) >= jnp.int32(44))
                def _():
                    retire(tokring_ref, 2, tok_ref, TW, tokp, False)

                @pl.when(jnp.max(mrecp - bases_ref[3:4, :]) >= jnp.int32(44))
                def _():
                    retire(mrecring_ref, 3, mrec_ref, MW, mrecp, False)

            return (ch, cl, lh, ll, rh, rl,
                    la[0], la[1], la[2], la[3], lav,
                    state, rpos, psize, pbits, pdist, bitpos,
                    optr, nlit, ntok, nmatch, litw, tokw, err,
                    litp, tokp, mrecp)

        def stepf(t, c):
            """Fused pair step: TWO coder ops per iteration.

            Grammar (the whole point): op1 only ever decodes the CHEAP
            models — flag (scalar rows), bits (32-row table), dist
            (binary) — and op2 is the unique slot that may touch the
            256-row byte/size tables (or another dist bit, or idles when
            op1 completed a token). Pairs: (flag,byte) = one literal,
            (flag,size) match head / EOS, (bits,dist0), (dist,dist),
            (bits|dist-final, idle). The expensive 256-row passes thus run
            once per pair instead of once per micro-op, and the fixed
            per-iteration overhead (ring checks, loop) halves.
            """
            (ch, cl, lh, ll, rh, rl, la0, la1, la2, la3, lav,
             state, rpos, psize, pbits, pdist, bitpos,
             optr, nlit, ntok, nmatch, litw, tokw, err,
             litp, tokp, mrecp) = c
            la = (la0, la1, la2, la3)

            def rc_front(total, act, ch, cl, lh, ll, rh, rl, la, lav, rpos):
                """Underflow escape + divide + cum for one coder op."""
                tot_u = i2u(jnp.where(act, total, zi + 1))
                uf = act & (rh == 0) & (rl < tot_u)
                top2 = la[0] >> 16
                nch_, ncl_ = shl64(ch, cl, _u(16))
                ch = jnp.where(uf, nch_ | top2, ch)
                cl = jnp.where(uf, ncl_, cl)
                nlh_, nll_ = shl64(lh, ll, _u(16))
                lh = jnp.where(uf, nlh_, lh)
                ll = jnp.where(uf, nll_, ll)
                rh = jnp.where(uf, ~lh, rh)
                rl = jnp.where(uf, ~ll, rl)
                la = la_shift(la, jnp.where(uf, _i(2), _i(0)))
                lav = lav - jnp.where(uf, _i(2), _i(0))
                rpos = rpos + jnp.where(uf, _i(2), _i(0))
                rdh, rdl, _ = div64_small(rh, rl, tot_u, wide)
                dfh, dfl = sub64(ch, cl, lh, ll)
                rd_f = jnp.maximum(f32_from_u64(rdh, rdl), jnp.float32(1.0))
                est = (f32_from_u64(dfh, dfl) / rd_f).astype(I32)
                c0 = jnp.clip(est - 2, zi, total - 1)
                p0h, p0l = mul_small64(i2u(c0), rdh, rdl)
                r2h, r2l = shl64(rdh, rdl, _u(1))
                r3h, r3l = add64(r2h, r2l, rdh, rdl)
                r4h, r4l = shl64(rdh, rdl, _u(2))
                cum = c0
                for kh, kl, k in ((rdh, rdl, 1), (r2h, r2l, 2),
                                  (r3h, r3l, 3), (r4h, r4l, 4)):
                    th_, tl_ = add64(p0h, p0l, kh, kl)
                    take = ((c0 + k) < total) & ~lt64(dfh, dfl, th_, tl_)
                    cum = jnp.where(take, c0 + k, cum)
                bh_, bl_ = mul_small64(tot_u, rdh, rdl)
                bad = act & ~lt64(dfh, dfl, bh_, bl_)
                return (cum, bad, rdh, rdl,
                        ch, cl, lh, ll, rh, rl, la, lav, rpos)

            def rc_back(start, size, act, rdh, rdl,
                        ch, cl, lh, ll, rh, rl, la, lav, rpos):
                """Coder interval update + renorm consume for one op."""
                su = i2u(jnp.where(act, start, zi))
                ah_, al_ = mul_small64(su, rdh, rdl)
                nlh_, nll_ = add64(lh, ll, ah_, al_)
                lh = jnp.where(act, nlh_, lh)
                ll = jnp.where(act, nll_, ll)
                nrh_, nrl_ = mul_small64(
                    i2u(jnp.where(act, size, zi + 1)), rdh, rdl)
                rh = jnp.where(act, nrh_, rh)
                rl = jnp.where(act, nrl_, rl)
                sh_h, sh_l = add64(lh, ll, rh, rl)
                cnt = jnp.where(act,
                                u2i(clz64(lh ^ sh_h, ll ^ sh_l) >> 3), zi)
                shift = umin(i2u(cnt) << 3, _u(63))
                full = cnt >= 8
                drop = _u(64) - umin(i2u(cnt) << 3, _u(64))
                th_, tl_ = shr64(la[0], la[1], umin(drop, _u(63)))
                th_ = jnp.where(cnt == 0, zu, jnp.where(full, la[0], th_))
                tl_ = jnp.where(cnt == 0, zu, jnp.where(full, la[1], tl_))
                sch, scl = shl64(ch, cl, shift)
                ch = jnp.where(full, th_, sch | th_)
                cl = jnp.where(full, tl_, scl | tl_)
                slh, sll = shl64(lh, ll, shift)
                lh = jnp.where(full, zu, slh)
                ll = jnp.where(full, zu, sll)
                srh, srl = shl64(rh, rl, shift)
                rh = jnp.where(full, zu, srh)
                rl = jnp.where(full, zu, srl)
                la = la_shift(la, cnt)
                lav = lav - cnt
                rpos = rpos + cnt
                return ch, cl, lh, ll, rh, rl, la, lav, rpos

            # ================= op1: flag | bits | dist ==================
            act1 = state < ST_DONE
            o1_flag = state == ST_FLAG
            o1_bits = state == ST_BITS
            o1_dist = state == ST_DIST

            tot_bits = jax.lax.shift_right_logical(bits_ref[31:32, :],
                                                   jnp.int32(6))
            f01 = _onehot_row(d01_ref, bitpos, 32)
            f0 = f01 & 0xFFFF
            f1 = jax.lax.shift_right_logical(f01, jnp.int32(16))
            lit0 = bases_ref[4:5, :]
            lit1 = bases_ref[5:6, :]
            total1 = jnp.where(o1_flag, lit0 + lit1,
                     jnp.where(o1_bits, tot_bits, f0 + f1))
            (cum1, bad1, rdh, rdl, ch, cl, lh, ll, rh, rl, la, lav,
             rpos) = rc_front(total1, act1, ch, cl, lh, ll, rh, rl,
                              la, lav, rpos)

            tabb = bits_ref[...]
            le32 = tabb <= cum1 * 64 + 63
            m32 = jnp.max(jnp.where(le32, tabb, _i(-1)),
                          axis=0, keepdims=True)
            at32 = jax.lax.shift_right_logical(
                jnp.min(jnp.where(le32, jnp.int32(0x7FFFFFFF), tabb),
                        axis=0, keepdims=True), jnp.int32(6))
            sym32 = jnp.where(m32 < 0, zi, (m32 & 63) + 1)
            start32 = jnp.where(
                m32 < 0, zi,
                jax.lax.shift_right_logical(m32, jnp.int32(6)))
            bin0 = jnp.where(o1_flag, lit0, f0)
            bin1 = jnp.where(o1_flag, lit1, f1)
            symb = jnp.where(cum1 >= bin0, _i(1), _i(0))
            startb = jnp.where(symb == 1, bin0, zi)
            sizeb = jnp.where(symb == 1, bin1, bin0)
            sym1 = jnp.where(o1_bits, sym32, symb)
            start1 = jnp.where(o1_bits, start32, startb)
            size1 = jnp.where(o1_bits, at32 - start32, sizeb)
            (ch, cl, lh, ll, rh, rl, la, lav, rpos) = rc_back(
                start1, size1, act1, rdh, rdl,
                ch, cl, lh, ll, rh, rl, la, lav, rpos)

            # op1 adaptive updates (bits table, flag freqs; dist deferred)
            bits_ref[...] = tabb + jnp.where(
                o1_bits & (iota32 >= sym1), _i(64), _i(0))
            bases_ref[4:5, :] = lit0 + jnp.where(
                o1_flag & (sym1 == 0), _i(1), _i(0))
            bases_ref[5:6, :] = lit1 + jnp.where(
                o1_flag & (sym1 == 1), _i(1), _i(0))
            d1pos = bitpos
            d1delta = jnp.where(o1_dist & (sym1 == 0), _i(1),
                                jnp.where(o1_dist & (sym1 == 1),
                                          _i(0x10000), zi))

            # transition 1 -> op2 micro-state
            bad_bits1 = o1_bits & (sym1 == 0)
            done_b1 = o1_bits & (sym1 == 1)         # nbits==1: dist = 1
            pbits = jnp.where(o1_bits, sym1, pbits)
            pdist = jnp.where(o1_bits, zi, pdist)
            bitpos = jnp.where(o1_bits, zi, bitpos)
            pdist = jnp.where(o1_dist, pdist | (sym1 << bitpos), pdist)
            bitpos = bitpos + jnp.where(o1_dist, _i(1), _i(0))
            done_d1 = o1_dist & (bitpos == pbits - 1)
            emit1 = act1 & ~bad1 & (done_b1 | done_d1)

            o2_byte = act1 & ~bad1 & o1_flag & (sym1 == 1)
            o2_size = act1 & ~bad1 & o1_flag & (sym1 == 0)
            o2_dist = (act1 & ~bad1 & ~bad_bits1
                       & ((o1_bits & (sym1 > 1))
                          | (o1_dist & ~done_d1)))
            act2 = o2_byte | o2_size | o2_dist
            is256_2 = o2_byte | o2_size

            # mid-pair lookahead refills (op1 consumed <= 10 bytes)
            la, lav = la_refill(la, lav, rpos)
            la, lav = la_refill(la, lav, rpos)

            # ================= op2: byte | size | dist | idle ===========
            if packed:
                p255 = cb_ref[255:256, :]
                tot_b = p255 & 0xFFFF
                tot_s = jax.lax.shift_right_logical(p255, jnp.int32(16))
            else:
                tot_b = jax.lax.shift_right_logical(cb_ref[255:256, :],
                                                    jnp.int32(9))
                tot_s = jax.lax.shift_right_logical(cs_ref[255:256, :],
                                                    jnp.int32(9))
            f01b = _onehot_row(d01_ref, bitpos, 32)
            # op1's deferred dist update touches row d1pos != bitpos (the
            # bit position advanced), so reading the table before the merged
            # update is exact
            f0b = f01b & 0xFFFF
            f1b = jax.lax.shift_right_logical(f01b, jnp.int32(16))
            total2 = jnp.where(o2_byte, tot_b,
                     jnp.where(o2_size, tot_s, f0b + f1b))
            (cum2, bad2, rdh2, rdl2, ch, cl, lh, ll, rh, rl, la, lav,
             rpos) = rc_front(total2, act2, ch, cl, lh, ll, rh, rl,
                              la, lav, rpos)

            # the pair's single 256-row pass
            if packed:
                p = cb_ref[...]
                tab256 = jnp.where(
                    o2_byte, p & 0xFFFF,
                    jax.lax.shift_right_logical(p, jnp.int32(16)))
                le256 = tab256 <= cum2
                sym256 = jnp.sum(jnp.where(le256, _i(1), _i(0)), axis=0,
                                 keepdims=True, dtype=I32)
                start256 = jnp.max(jnp.where(le256, tab256, _i(0)),
                                   axis=0, keepdims=True)
                at256 = jnp.min(jnp.where(le256, jnp.int32(0x7FFFFFFF),
                                          tab256),
                                axis=0, keepdims=True)
            else:
                tab256 = jnp.where(o2_byte, cb_ref[...], cs_ref[...])
                le256 = tab256 <= cum2 * 512 + 511
                m256 = jnp.max(jnp.where(le256, tab256, _i(-1)),
                               axis=0, keepdims=True)
                at256 = jax.lax.shift_right_logical(
                    jnp.min(jnp.where(le256, jnp.int32(0x7FFFFFFF), tab256),
                            axis=0, keepdims=True), jnp.int32(9))
                sym256 = jnp.where(m256 < 0, zi, (m256 & 511) + 1)
                start256 = jnp.where(
                    m256 < 0, zi,
                    jax.lax.shift_right_logical(m256, jnp.int32(9)))
            symb2 = jnp.where(cum2 >= f0b, _i(1), _i(0))
            sym2 = jnp.where(is256_2, sym256, symb2)
            start2 = jnp.where(is256_2, start256,
                               jnp.where(symb2 == 1, f0b, zi))
            size2 = jnp.where(is256_2, at256 - start256,
                              jnp.where(symb2 == 1, f1b, f0b))
            (ch, cl, lh, ll, rh, rl, la, lav, rpos) = rc_back(
                start2, size2, act2, rdh2, rdl2,
                ch, cl, lh, ll, rh, rl, la, lav, rpos)

            # op2 adaptive updates + the merged dist update of both ops
            if packed:
                delta = jnp.where(o2_byte, _i(1),
                                  jnp.where(o2_size, _i(0x10000), zi))
                cb_ref[...] = cb_ref[...] + jnp.where(
                    iota256 >= sym2, delta, zi)
            else:
                cb_ref[...] = cb_ref[...] + jnp.where(
                    o2_byte & (iota256 >= sym2), _i(512), _i(0))
                cs_ref[...] = cs_ref[...] + jnp.where(
                    o2_size & (iota256 >= sym2), _i(512), _i(0))
            d2delta = jnp.where(o2_dist & (sym2 == 0), _i(1),
                                jnp.where(o2_dist & (sym2 == 1),
                                          _i(0x10000), zi))
            d01_ref[...] = (d01_ref[...]
                            + jnp.where(iota32 == d1pos, d1delta, zi)
                            + jnp.where(iota32 == bitpos, d2delta, zi))

            # transition 2 + merged token outputs
            lit_over = o2_byte & (optr >= sizes)
            litw = litw | jnp.where(
                o2_byte, i2u(sym2) << i2u(24 - ((nlit & 3) << 3)), zu)
            spill_lit = o2_byte & ((nlit & 3) == 3)
            mask = (iota64 == (litp & 63)) & spill_lit
            litring_ref[...] = jnp.where(mask, litw, litring_ref[...])
            litw = jnp.where(spill_lit, zu, litw)
            litp = litp + jnp.where(spill_lit, _i(1), _i(0))
            nlit = nlit + jnp.where(o2_byte, _i(1), _i(0))
            optr = optr + jnp.where(o2_byte, _i(1), _i(0))

            eos = o2_size & (sym2 == 255)
            bad_size = o2_size & ~eos & ((sym2 < 2) | (sym2 > 254))
            psize = jnp.where(o2_size & ~eos, sym2, psize)

            pdist = jnp.where(o2_dist, pdist | (sym2 << bitpos), pdist)
            bitpos = bitpos + jnp.where(o2_dist, _i(1), _i(0))
            done_d2 = o2_dist & (bitpos == pbits - 1) & ~bad2
            emit = emit1 | done_d2
            dist = pdist | jnp.where(
                emit, jnp.int32(1) << jnp.where(pbits > 0, pbits - 1, zi),
                zi)
            bad_dist = emit & (dist > optr + dlen)
            over = emit & (optr + psize > sizes)
            emit_ok = emit & ~bad_dist & ~over

            mrec = i2u(psize) << 16 | i2u(dist)
            mask = (iota64 == (mrecp & 63)) & emit_ok
            mrecring_ref[...] = jnp.where(mask, mrec, mrecring_ref[...])
            mrecp = mrecp + jnp.where(emit_ok, _i(1), _i(0))
            nmatch = nmatch + jnp.where(emit_ok, _i(1), _i(0))
            optr = optr + jnp.where(emit_ok, psize, zi)
            tokw = tokw | jnp.where(emit_ok, _u(1) << i2u(ntok & 31), zu)
            is_tok = o2_byte | emit_ok
            ntok = ntok + jnp.where(is_tok, _i(1), _i(0))
            spill_tok = is_tok & ((ntok & 31) == 0)
            mask = (iota64 == (tokp & 63)) & spill_tok
            tokring_ref[...] = jnp.where(mask, tokw, tokring_ref[...])
            tokw = jnp.where(spill_tok, zu, tokw)
            tokp = tokp + jnp.where(spill_tok, _i(1), _i(0))

            # next state
            nstate = state
            nstate = jnp.where(o2_byte, _i(ST_FLAG), nstate)
            nstate = jnp.where(o2_size,
                               jnp.where(eos, _i(ST_DONE), _i(ST_BITS)),
                               nstate)
            nstate = jnp.where(o2_dist,
                               jnp.where(done_d2, _i(ST_FLAG), _i(ST_DIST)),
                               nstate)
            nstate = jnp.where(emit1, _i(ST_FLAG), nstate)

            newerr = jnp.where(bad1 | bad2, _i(E_ILSEQ),
                     jnp.where(bad_size, _i(E_SIZE),
                     jnp.where(bad_bits1, _i(E_BITS),
                     jnp.where(bad_dist, _i(E_DIST),
                     jnp.where(lit_over | over, _i(E_OVERRUN), zi)))))
            err = jnp.where(act1 & (err == 0) & (newerr > 0), newerr, err)
            nstate = jnp.where(act1 & (newerr > 0), _i(ST_ERR), nstate)
            state = jnp.where(act1, nstate, state)

            # end-of-pair refills restore lav >= 13
            la, lav = la_refill(la, lav, rpos)
            la, lav = la_refill(la, lav, rpos)
            la, lav = la_refill(la, lav, rpos)

            # window slide + ring retirement checks every 4 pairs (widx
            # moves <= 6 words/pair: 64 + 24 < 96 window rows; mrec <= 1
            # per pair: 44 + 4 + 2 < 64 ring rows)
            widx = (rpos + lav) >> 2

            @pl.when((t & 3) == jnp.int32(0))
            def _():
                @pl.when(jnp.max(widx - bases_ref[0:1, :]) >= jnp.int32(64))
                def _():
                    s1_refresh(widx)

                @pl.when(jnp.max(litp - bases_ref[1:2, :]) >= jnp.int32(44))
                def _():
                    retire(litring_ref, 1, lit_ref, LW, litp, False)

                @pl.when(jnp.max(tokp - bases_ref[2:3, :]) >= jnp.int32(44))
                def _():
                    retire(tokring_ref, 2, tok_ref, TW, tokp, False)

                @pl.when(jnp.max(mrecp - bases_ref[3:4, :]) >= jnp.int32(44))
                def _():
                    retire(mrecring_ref, 3, mrec_ref, MW, mrecp, False)

            return (ch, cl, lh, ll, rh, rl,
                    la[0], la[1], la[2], la[3], lav,
                    state, rpos, psize, pbits, pdist, bitpos,
                    optr, nlit, ntok, nmatch, litw, tokw, err,
                    litp, tokp, mrecp)

        # ---- prime code with the first 8 stream bytes; fill the lookahead.
        # Every carry initializer derives from a memory load: Mosaic assigns
        # constant vectors a replicated layout it cannot unify with the loop
        # body's outputs at the while_loop carry boundary.
        zi0 = bases_ref[6:7, :]          # zeroed at init, stays zero
        zu0 = i2u(zi0)
        ones = ~zu0
        ch = payload_ref[0, 0:1, :]
        cl = payload_ref[0, 1:2, :]
        la = (zu0, zu0, zu0, zu0)
        lav = zi0
        rpos = zi0 + 8
        for _ in range(4):
            la, lav = la_refill(la, lav, rpos)
        c0 = (ch, cl, zu0, zu0, ones, ones,
              la[0], la[1], la[2], la[3], lav,
              zi0 + ST_FLAG, rpos, zi0, zi0, zi0, zi0,
              zi0, zi0, zi0, zi0, zu0, zu0, zi0, zi0, zi0, zi0)

        def drain(t, c):
            (ch, cl, lh, ll, rh, rl, la0, la1, la2, la3, lav,
             state, rpos, psize, pbits, pdist, bitpos,
             optr, nlit, ntok, nmatch, litw, tokw, err,
             litp, tokp, mrecp) = c
            mask = (iota64 == (litp & 63)) & ((nlit & 3) != 0)
            litring_ref[...] = jnp.where(mask, litw, litring_ref[...])
            litp_f = litp + jnp.where((nlit & 3) != 0, _i(1), _i(0))
            mask = (iota64 == (tokp & 63)) & ((ntok & 31) != 0)
            tokring_ref[...] = jnp.where(mask, tokw, tokring_ref[...])
            tokp_f = tokp + jnp.where((ntok & 31) != 0, _i(1), _i(0))
            for _ in range(3):
                retire(litring_ref, 1, lit_ref, LW, litp_f, True)
                retire(tokring_ref, 2, tok_ref, TW, tokp_f, True)
                retire(mrecring_ref, 3, mrec_ref, MW, mrecp, True)

            hang = (state < ST_DONE)
            counts_ref[0, 0:1, :] = optr
            counts_ref[0, 1:2, :] = nlit
            counts_ref[0, 2:3, :] = ntok
            counts_ref[0, 3:4, :] = nmatch
            counts_ref[0, 4:5, :] = jnp.where(
                (err == 0) & hang, jnp.int32(E_ILSEQ), err)
            counts_ref[0, 5:6, :] = t + zi
            counts_ref[0, 6:7, :] = jnp.where(nmatch > jnp.int32(MW),
                                              _i(1), _i(0))
            counts_ref[0, 7:8, :] = state

        return c0, (stepf if fused else step), drain



    made = [make(sl) for sl in range(slots)]

    def cond(carry):
        t, cs_ = carry
        alive = None
        for c in cs_:
            a = jnp.max(jnp.where(c[11] < ST_DONE, _i(1), _i(0))) > 0
            alive = a if alive is None else (alive | a)
        return (t < jnp.int32(t_max)) & alive

    def step_all(carry):
        t, cs_ = carry
        return t + jnp.int32(1), tuple(
            made[sl][1](t, cs_[sl]) for sl in range(slots))

    t, cs_ = jax.lax.while_loop(
        cond, step_all,
        (jnp.int32(0), tuple(m[0] for m in made)))
    for sl in range(slots):
        made[sl][2](t, cs_[sl])


@partial(jax.jit, static_argnames=("t_max", "lw", "tw", "mw", "interpret",
                                   "wide", "slots", "fused"))
def _decode_pallas(payload, meta, t_max: int, lw: int, tw: int,
                   mw: int, interpret: bool = False, wide: bool = False,
                   slots: int = 1, seed_tab=None, fused: bool = False):
    """payload: [G, Pw, B] u32 words (big-endian bytes); meta [G, 8, B] i32
    (row 0 payload lengths, row 1 original sizes, row 2 warm dict length).
    G must be a multiple of `slots`; each kernel instance interleaves
    `slots` groups so their independent dependence chains overlap in the
    scheduler. ``seed_tab`` [G, SEED_ROWS, B] i32: warm model seed
    (packed decode-table forms, _dec_seed_table).

    Returns (lit [G, LW, B] u32, tok [G, TW, B] u32, mrec [G, MW, B] u32,
    counts [G, 8, B] i32).
    """
    G, Pw, B = payload.shape
    seeded = seed_tab is not None
    assert B % 128 == 0 and Pw % 32 == 0 and G % slots == 0
    z = np.int32(0)
    S = slots
    in_specs = [
        pl.BlockSpec((S, Pw, B), lambda g: (g, z, z),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 8, B), lambda g: (g, z, z),
                     memory_space=pltpu.VMEM),
    ]
    operands = [payload, meta]
    if seeded:
        in_specs.append(pl.BlockSpec((S, SEED_ROWS, B), lambda g: (g, z, z),
                                     memory_space=pltpu.VMEM))
        operands.append(seed_tab)
    return pl.pallas_call(
        partial(_decode_kernel, t_max=t_max, wide=wide, slots=S,
                seeded=seeded, fused=fused),
        grid=(G // S,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((S, lw, B), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, tw, B), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, mw, B), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 8, B), lambda g: (g, z, z),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, lw, B), U32),
            jax.ShapeDtypeStruct((G, tw, B), U32),
            jax.ShapeDtypeStruct((G, mw, B), U32),
            jax.ShapeDtypeStruct((G, 8, B), I32),
        ),
        scratch_shapes=(
            # csum byte|size packed (non-wide) / csum*512+row byte, size
            [pltpu.VMEM((S * 256, B), I32)] if not wide else
            [pltpu.VMEM((S * 256, B), I32), pltpu.VMEM((S * 256, B), I32)]
        ) + [
            pltpu.VMEM((S * 32, B), I32),    # csum*64+row bits
            pltpu.VMEM((S * 32, B), I32),    # dist freq0|freq1 packed
            pltpu.VMEM((S * 96, B), U32),    # stream window
            pltpu.VMEM((S * 64, B), U32),    # literal ring
            pltpu.VMEM((S * 64, B), U32),    # token-bit ring
            pltpu.VMEM((S * 64, B), U32),    # match-record ring
            pltpu.VMEM((S * 8, B), I32),     # retirement bases + lit model
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "SQZ_DEC_VMEM_MB", "118")) * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _dec_seed_table(seed, G: int, B: int) -> np.ndarray:
    """[G, SEED_ROWS, B] i32 decoder-table seed (packed wide-mode forms)."""
    f = np.asarray(seed.flat, dtype=np.int64)
    col = np.zeros(SEED_ROWS, np.int64)
    col[0:256] = np.cumsum(f[258:514]) * 512 + np.arange(256)
    col[256:512] = np.cumsum(f[2:258]) * 512 + np.arange(256)
    col[512:544] = np.cumsum(f[514:546]) * 64 + np.arange(32)
    col[544:576] = f[546:578] | (f[578:610] << 16)
    col[576], col[577] = f[0], f[1]
    return np.broadcast_to(col.astype(np.int32)[None, :, None],
                           (G, SEED_ROWS, B)).copy()


def assemble_tokens_numpy(tok_bits: np.ndarray, lits: bytes,
                          mrecs: np.ndarray, ntok: int, size: int,
                          dictionary: bytes = b"") -> bytes:
    """Reference reconstruction of the decode-kernel record streams.
    ``dictionary``: warm shared preset history (FORMAT.md §3.1)."""
    out = bytearray(dictionary)
    dlen = len(out)
    li = 0
    mi = 0
    for tix in range(ntok):
        if (int(tok_bits[tix >> 5]) >> (tix & 31)) & 1:
            rec = int(mrecs[mi])
            mi += 1
            length, dist = rec >> 16, rec & 0xFFFF
            for _ in range(length):
                out.append(out[-dist])
        else:
            out.append(lits[li])
            li += 1
    assert len(out) - dlen == size, (len(out) - dlen, size)
    return bytes(out[dlen:])


DEC_SLOTS = 2        # interleaved groups per decode-kernel instance at
                     # <= 2^14 blocks (512 lanes x 2 slots measured best;
                     # 4 slots at 512 lanes thrashes VMEM — PERF.md)


def plan_decode_dispatch(NB: int, blk_bits: int, lanes: int = 0,
                         slots: int = 0, interpret: bool = False):
    """The decode-kernel dispatch plan shared by decode_groups and
    bench.py: lane/slot selection, buffer dimensions, and whether groups
    must dispatch as chunked grid-1 calls (one group already fills VMEM,
    so a multi-group grid cannot double-buffer). Returns a dict."""
    bs = 1 << blk_bits
    if lanes <= 0:
        # 512 lanes beat 256 at every block size once the VMEM cap allows
        # them (v5e has 128 MB physical VMEM; measured sweeps in PERF.md);
        # interpret mode keeps narrow groups for test speed
        lanes = 128 if interpret else 512
    if slots <= 0:
        # two interleaved slots win at 2^14 (128 blocks/slot of VMEM
        # headroom); one slot at 2^15+, where a single 512-lane group
        # already fills the budget
        slots = DEC_SLOTS if (not interpret and blk_bits <= 14) else 1
    G = -(-NB // lanes)
    G = -(-G // slots) * slots
    cap = bs + 4096
    Pw = -(-cap // 4 + 31) // 32 * 32
    lw = max(bs // 4, 32)
    tw = (-(-bs // 32) + 1 + 31) // 32 * 32
    mw = max(bs // 4, 64)
    t_max = 9 * bs + 64
    vmem_mb = int(os.environ.get("SQZ_DEC_VMEM_MB", "118"))
    grp_mb = (Pw + lw + tw + mw) * 4 * lanes * slots / 2**20
    chunked = not interpret and G > slots and 2 * grp_mb > vmem_mb
    return dict(lanes=lanes, slots=slots, G=G, Pw=Pw, lw=lw, tw=tw, mw=mw,
                t_max=t_max, chunked=chunked)


def decode_groups(payloads, sizes, blk_bits: int, interpret: bool = False,
                  slots: int = 0, lanes: int = 0,
                  seed=None, dictionary: bytes = b"", block_ids=None,
                  stats: dict = None):
    """payloads: list of NB payload byte strings; sizes: original lengths.

    ``seed``/``dictionary`` (sqzt v2 warm start, FORMAT.md §3.1): the model
    seed and shared preset history ALL blocks in this call were coded with
    (the warm container's block 0 is decoded on the host first and is not
    part of this call). ``block_ids``: the caller's original index per
    block, used in error messages (defaults to positions).

    ``stats``: optional dict; filled with per-stage active wall seconds
    (VERDICT r3 #4): pack_s (host payload packing), dispatch_s (uploads +
    kernel dispatches, async), fetch_s (blocked on the device + trimmed
    record download), assemble_s (host record assembly), wall_s. The
    chunked path overlaps fetch/assembly of chunk c with chunks c+1's
    device compute, so stage sums can exceed wall_s."""
    import time as _time

    from sqz_tpu import native
    if blk_bits > 16:
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    st = stats if stats is not None else {}
    for k in ("pack_s", "dispatch_s", "fetch_s", "assemble_s"):
        st.setdefault(k, 0.0)
    t_wall0 = _time.perf_counter()
    warm = seed is not None
    NB = len(payloads)
    if NB == 0:
        return []
    ids = list(block_ids) if block_ids is not None else list(range(NB))
    bs = 1 << blk_bits
    plan = plan_decode_dispatch(NB, blk_bits, lanes, slots, interpret)
    lanes, slots = plan["lanes"], plan["slots"]
    Pw = plan["Pw"]
    # warm-expanded payloads past the kernel's stream buffer (possible when
    # a block's content mismatches the block-0 seed) decode on the host —
    # they are rare and pathological, and growing Pw for them would blow
    # the VMEM budget for everyone
    host_out = {}
    if any(len(p) > 4 * Pw for p in payloads):
        keep = [b for b, p in enumerate(payloads) if len(p) <= 4 * Pw]
        for b, p in enumerate(payloads):
            if len(p) > 4 * Pw:
                if native.available():
                    host_out[b] = native.sqz4_decompress_payload(
                        p, sizes[b], seed=seed, dictionary=dictionary)
                else:
                    from sqz_tpu.oracle.sqz4 import sqz4_decode_payload
                    host_out[b] = sqz4_decode_payload(
                        p, sizes[b], seed=seed, dictionary=dictionary)
        sub = decode_groups([payloads[b] for b in keep],
                            [sizes[b] for b in keep], blk_bits, interpret,
                            slots, lanes, seed, dictionary,
                            block_ids=[ids[b] for b in keep], stats=st)
        outs = [None] * NB
        for i, b in enumerate(keep):
            outs[b] = sub[i]
        for b, v in host_out.items():
            outs[b] = v
        st["wall_s"] = _time.perf_counter() - t_wall0
        return outs
    G = plan["G"]
    # group blocks by compressed size: the while_loop runs until the
    # slowest lane in a group finishes, and step count tracks payload
    # size — sorting keeps stragglers together instead of padding every
    # group to the global worst block
    order = sorted(range(NB), key=lambda b: len(payloads[b]))
    payloads = [payloads[b] for b in order]
    sizes = [sizes[b] for b in order]
    t0 = _time.perf_counter()
    buf, meta = pack_decode_chunk(payloads, sizes, lanes, G, Pw,
                                  len(dictionary))
    st["pack_s"] += _time.perf_counter() - t0
    lw, tw, mw, t_max = plan["lw"], plan["tw"], plan["mw"], plan["t_max"]
    wide = warm or blk_bits >= 15
    fused = os.environ.get("SQZ_DEC_FUSED", "1") == "1"
    seed_tab = _dec_seed_table(seed, G, lanes) if warm else None
    sort_ids = [ids[b] for b in order]
    if plan["chunked"]:
        # one group already fills VMEM (64 KiB blocks at 512 lanes): a
        # multi-group grid cannot double-buffer, so dispatch grid-1 calls
        # per group chunk — async dispatch keeps the device saturated
        # while each earlier chunk's trimmed download + assembly drains
        t0 = _time.perf_counter()
        chunks = [_decode_pallas(jnp.asarray(buf[g:g + slots]),
                                 jnp.asarray(meta[g:g + slots]),
                                 t_max, lw, tw, mw, interpret,
                                 wide, slots,
                                 jnp.asarray(seed_tab[g:g + slots])
                                 if warm else None, fused)
                  for g in range(0, G, slots)]
        st["dispatch_s"] += _time.perf_counter() - t0
        per = lanes * slots
        outs = []
        for c, res in enumerate(chunks):
            t0 = _time.perf_counter()
            lt, tt, mt, cnt = fetch_decode_host(res)
            st["fetch_s"] += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            outs.extend(postprocess_decode(
                lt, tt, mt, cnt, payloads[c * per:(c + 1) * per],
                sizes[c * per:(c + 1) * per], bs, seed=seed,
                dictionary=dictionary, transposed=True,
                block_ids=sort_ids[c * per:(c + 1) * per]))
            st["assemble_s"] += _time.perf_counter() - t0
    else:
        t0 = _time.perf_counter()
        res = _decode_pallas(
            jnp.asarray(buf), jnp.asarray(meta), t_max, lw, tw, mw,
            interpret, wide, slots,
            jnp.asarray(seed_tab) if warm else None, fused)
        st["dispatch_s"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        lt, tt, mt, cnt = fetch_decode_host(res)
        st["fetch_s"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        outs = postprocess_decode(lt, tt, mt, cnt, payloads, sizes, bs,
                                  seed=seed, dictionary=dictionary,
                                  transposed=True, block_ids=sort_ids)
        st["assemble_s"] += _time.perf_counter() - t0
    unsorted = [None] * NB
    for pos, b in enumerate(order):
        unsorted[b] = outs[pos]
    st["wall_s"] = _time.perf_counter() - t_wall0
    return unsorted


def pack_decode_chunk(payloads, sizes, lanes: int, groups: int, Pw: int,
                      dlen: int = 0):
    """Pack one decode dispatch's inputs: payload bytes -> [groups, Pw,
    lanes] big-endian words (zero-padded to the group count) and the
    [groups, 8, lanes] meta table (rows: payload len, original size,
    dictionary len). Shared by decode_groups and the pipelined packer
    (ops/pipeline.py) so the layout cannot drift between them."""
    from sqz_tpu import native
    meta = np.zeros((groups, 8, lanes), dtype=np.int32)
    for i, p in enumerate(payloads):
        assert len(p) <= 4 * Pw, "payload exceeds decoder buffer"
        g, lane = divmod(i, lanes)
        meta[g, 0, lane] = len(p)
        meta[g, 1, lane] = sizes[i]
        meta[g, 2, lane] = dlen
    if native.available():
        buf = native.sqz4_pack_payloads(payloads, lanes, Pw)
        if buf.shape[0] < groups:   # pad group count to the slot multiple
            buf = np.concatenate(
                [buf, np.zeros((groups - buf.shape[0],) + buf.shape[1:],
                               np.uint32)])
    else:
        buf = np.zeros((groups, Pw, lanes), dtype=np.uint32)
        for i, p in enumerate(payloads):
            g, lane = divmod(i, lanes)
            w = np.frombuffer(p.ljust(-(-len(p) // 4) * 4, b"\0"),
                              dtype=">u4")
            buf[g, :len(w), lane] = w
    return buf, meta


def postprocess_decode(lit, tok, mrec, counts, payloads, sizes, bs,
                       seed=None, dictionary: bytes = b"",
                       block_ids=None, transposed: bool = False):
    """Post-kernel host stage for one decode dispatch (or a concatenation):
    record arrays -> per-block output bytes (lane-major block order).
    Validates error lanes, falls back to the host codec for pathological
    overflow blocks, and assembles the rest. Shared by decode_groups and
    the pipelined decoder (ops/pipeline.py).
    ``transposed``: lit/tok/mrec are [g, lanes, W] (fetch_decode_host —
    the device did the transpose); default is the raw [g, W, lanes]
    kernel layout. ``block_ids``: the caller's original block index per
    position — error messages report these, so a corrupt block is
    identifiable through the straggler sort and chunking."""
    from sqz_tpu import native
    nb = len(payloads)
    if transposed:
        g, lanes = lit.shape[0], lit.shape[1]
        litb = lit.reshape(g * lanes, -1)[:nb]
        tokb = tok.reshape(g * lanes, -1)[:nb]
        mrecb = mrec.reshape(g * lanes, -1)[:nb]
    else:
        g, lanes = lit.shape[0], lit.shape[2]
        litb = np.ascontiguousarray(
            lit.transpose(0, 2, 1).reshape(g * lanes, -1))[:nb]
        tokb = np.ascontiguousarray(
            tok.transpose(0, 2, 1).reshape(g * lanes, -1))[:nb]
        mrecb = np.ascontiguousarray(
            mrec.transpose(0, 2, 1).reshape(g * lanes, -1))[:nb]
    litu8 = litb.astype(">u4").view(np.uint8).reshape(nb, -1)
    cnt = counts.transpose(0, 2, 1).reshape(g * lanes, 8)[:nb]
    optr, ntoks, err, ovf = cnt[:, 0], cnt[:, 2], cnt[:, 4], cnt[:, 6]
    szs_np = np.asarray(sizes, dtype=np.int64)
    ids = list(block_ids) if block_ids is not None else list(range(nb))
    bad = np.nonzero(err * (1 - ovf))[0]
    if bad.size:
        raise ValueError(
            f"corrupt sqz4 block(s) {[ids[b] for b in bad]} "
            f"(codes {err[bad].tolist()})")
    short = np.nonzero((optr != szs_np) & (ovf == 0))[0]
    if short.size:
        raise ValueError(f"block {ids[short[0]]}: produced "
                         f"{optr[short[0]]} of {szs_np[short[0]]}")
    outs: list = [None] * nb
    ov_idx = np.nonzero(ovf)[0]
    if ov_idx.size and native.available():
        for b in ov_idx:  # pathological match density: host codec fallback
            outs[b] = native.sqz4_decompress_payload(
                payloads[b], sizes[b], seed=seed, dictionary=dictionary)
    elif ov_idx.size:
        from sqz_tpu.oracle.sqz4 import sqz4_decode_payload
        for b in ov_idx:
            outs[b] = sqz4_decode_payload(payloads[b], sizes[b], seed=seed,
                                          dictionary=dictionary)
    live = np.nonzero(ovf == 0)[0]
    if live.size:
        if native.available():
            asm = native.assemble_blocks(
                tokb[live], litu8[live], mrecb[live],
                ntoks[live].astype(np.int64), szs_np[live], bs,
                dictionary=dictionary)
            for i, b in enumerate(live):
                outs[b] = asm[i, :sizes[b]].tobytes()
        else:
            for b in live:
                outs[b] = assemble_tokens_numpy(
                    tokb[b], litu8[b].tobytes(), mrecb[b],
                    int(ntoks[b]), sizes[b], dictionary=dictionary)
    return outs
