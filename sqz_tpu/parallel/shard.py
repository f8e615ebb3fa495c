"""shard_map distribution of the block-parallel codec over a device mesh.

Blocks shard over the 1-D "blocks" mesh axis; every device runs the batched
sqz4 encode scan on its local blocks (identical lock-step program), and the
per-block compressed lengths are exchanged with a psum so every device knows
the container's length table. The variable-length payloads stay sharded —
the host assembling the sqzt container pulls them in block order (the
"ordered gather"; on a multi-host pod this is jax.experimental
multihost_utils / process-local addressable shards, over ICI not DCN for the
in-slice legs).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
import inspect

_VMA_KW = ("check_vma" if "check_vma" in inspect.signature(shard_map).parameters
           else "check_rep")

from sqz_tpu.ops.sqz4_jax import encode_scan_impl, microops_from_tokens, OP_PAD


@lru_cache(maxsize=32)
def sharded_encode_fn(mesh: Mesh, cap: int, with_state: bool = False):
    """jitted shard_map program: ops sharded by block → (payloads, lens,
    total_bytes) with lens all-gathered and the total psum-reduced.
    ``with_state``: warm-start model tables ride along, sharded by block
    (sqzt v2, FORMAT.md §3.1)."""

    def local(m_ops, s_ops, *state):
        payload, lens = encode_scan_impl(m_ops, s_ops, cap,
                                         state if state else None)
        total = jax.lax.psum(jnp.sum(lens.astype(jnp.int64)), "blocks")
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        return payload, all_lens, total

    in_specs = [P("blocks", None), P("blocks", None)]
    if with_state:
        in_specs += [P("blocks", None, None), P("blocks", None)]
    # check_vma=False: the codec scans materialize per-step constants whose
    # varying-axis inference conflicts with loop-carry typing; the program is
    # purely block-local plus explicit collectives, so the check adds nothing.
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("blocks", None), P(None), P()),
        **{_VMA_KW: False},
    ))


def encode_blocks_sharded(token_lists: Sequence[list], blk_bits: int,
                          mesh: Mesh, seeds=None) -> List[bytes]:
    """Ordered-gather sqz4 block compression over the mesh.

    Multi-host ready: payloads stay sharded; each process trims only its
    addressable shards against the device-all-gathered (replicated) length
    table, and process 0 assembles the ordered list (single-process: the
    exchange is the identity). Returns None on processes other than 0 of a
    multi-process run. ``seeds``: per-block ModelSeed/None — warm blocks'
    tables shard over the mesh with their ops (FORMAT.md §3.1)."""
    from sqz_tpu.parallel import multihost
    n = mesh.devices.size
    ops = [microops_from_tokens(t) for t in token_lists]
    B = len(ops)
    Bp = ((B + n - 1) // n) * n                      # pad to device multiple
    T = max(len(m) for m, _ in ops)
    m_ops = np.full((Bp, T), OP_PAD, dtype=np.int32)
    s_ops = np.zeros((Bp, T), dtype=np.int32)
    for b, (m, s) in enumerate(ops):
        m_ops[b, :len(m)] = m
        s_ops[b, :len(s)] = s
    cap = (1 << blk_bits) * 2 + 4096
    fn = sharded_encode_fn(mesh, cap, with_state=seeds is not None)
    if seeds is not None:
        from sqz_tpu.ops.sqz4_jax import init_model_state
        F, totals = init_model_state(Bp, list(seeds) + [None] * (Bp - B))
        payload, lens, _ = fn(jnp.asarray(m_ops), jnp.asarray(s_ops),
                              F, totals)
    else:
        payload, lens, _ = fn(jnp.asarray(m_ops), jnp.asarray(s_ops))
    lens = np.asarray(lens)                          # replicated: host copy
    local = multihost.addressable_scan_payloads(payload, lens, B)
    return multihost.gather_payloads_to_host0(local, lens, B)


@lru_cache(maxsize=32)
def sharded_decode_fn(mesh: Mesh, out_cap: int, t_max: int, m_max: int):
    """shard_map program: payloads sharded by block → decoded bytes sharded
    by block, with the per-block error flags and produced lengths
    all-gathered so every process can validate the whole container."""
    from sqz_tpu.formats.constants import SQZ4_MAX_LEN
    from sqz_tpu.ops.lz_apply import apply_matches
    from sqz_tpu.ops.sqz4_jax import _decode_scan

    def local(payloads, plens, sizes):
        out, optr, matches, mptr, err = _decode_scan.__wrapped__(
            payloads, plens, sizes, out_cap, t_max, m_max)
        out = apply_matches(out, matches[:, :m_max], SQZ4_MAX_LEN)
        all_optr = jax.lax.all_gather(optr, "blocks", tiled=True)
        all_err = jax.lax.all_gather(err, "blocks", tiled=True)
        return out, all_optr, all_err

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("blocks", None), P("blocks"), P("blocks")),
        out_specs=(P("blocks", None), P(None), P(None)),
        **{_VMA_KW: False},
    ))


def decode_blocks_sharded(payloads: Sequence[bytes], sizes: Sequence[int],
                          blk_bits: int, mesh: Mesh) -> List[bytes]:
    """Ordered-gather sqz4 block decode over the mesh (the mirror of
    encode_blocks_sharded): payloads shard by block, each device runs the
    batched scan decoder + match application on its shard, and the host
    assembles its addressable shards (process 0 gets the ordered list)."""
    from sqz_tpu.parallel import multihost
    n = mesh.devices.size
    B = len(payloads)
    Bp = ((B + n - 1) // n) * n
    P_ = max(max(len(p) for p in payloads), 8)
    P_ = 1 << (P_ - 1).bit_length()
    buf = np.zeros((Bp, P_), dtype=np.uint8)
    for b, p in enumerate(payloads):
        buf[b, :len(p)] = np.frombuffer(p, dtype=np.uint8)
    plens = np.zeros(Bp, dtype=np.int32)
    plens[:B] = [len(p) for p in payloads]
    szs = np.zeros(Bp, dtype=np.int32)
    szs[:B] = list(sizes)
    out_cap = 1 << blk_bits
    t_max = 17 * out_cap // 4 + 64
    m_max = out_cap // 2 + 1
    fn = sharded_decode_fn(mesh, out_cap, t_max, m_max)
    out, optr, err = fn(jnp.asarray(buf), jnp.asarray(plens),
                        jnp.asarray(szs))
    err = np.asarray(err)[:B]
    optr = np.asarray(optr)[:B]
    if err.any():
        raise ValueError(
            f"corrupt sqz4 block(s): {np.nonzero(err)[0].tolist()}")
    short = np.nonzero(optr != szs[:B])[0]
    if short.size:
        raise ValueError(f"block {short[0]}: produced {optr[short[0]]} "
                         f"of {szs[short[0]]}")
    # ordered gather of the decoded shards (lengths = the known sizes)
    local = multihost.addressable_scan_payloads(
        out, np.asarray(szs, np.int64), B)
    return multihost.gather_payloads_to_host0(
        local, np.asarray(szs, np.int64), B)


# ----------------------------------------------- pallas kernels over a mesh

@lru_cache(maxsize=32)
def sharded_encode_pallas_fn(mesh: Mesh, cap_words: int, tc: int,
                             interpret: bool = False, wide: bool = False,
                             seeded: bool = False, fused: bool = False):
    """shard_map program running the self-contained Pallas encoder on each
    device's local block groups (group axis sharded; ICI all-gather of the
    per-block lengths for the container table). ``wide`` selects the
    base-2^14 exact divider required once model totals exceed 2^15
    (blk_bits >= 15) — same rule as encode_data_full. ``seeded``: a warm
    model-seed table rides along, sharded with its groups; ``fused``
    requires a paired plan (plan_pack(paired=True))."""
    from sqz_tpu.ops.sqz4_pallas import _encode_full_pallas_call

    def local(m_words, s_words, *seed):
        words, lens = _encode_full_pallas_call(
            m_words, s_words, seed[0] if seed else None, cap_words, tc,
            interpret, wide, fused)
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        return words, all_lens

    in_specs = [P("blocks", None, None), P("blocks", None, None)]
    if seeded:
        in_specs.append(P("blocks", None, None))
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("blocks", None, None), P(None)),
        **{_VMA_KW: False},
    ))


def encode_data_sharded_pallas(data: bytes, blk_bits: int, window: int,
                               mesh: Mesh, lanes: int = 128,
                               tc: int = 256,
                               interpret: bool = False,
                               warm: bool = False) -> List[bytes]:
    """Whole-buffer sqz4 encode with block groups sharded over the mesh:
    native plan+pack -> per-device Pallas coder -> ordered host gather.

    ``warm`` runs the all-seeded pass (sqzt v2): block 0's seed is derived
    on the host during planning and broadcast into every device's seed
    table shard (the per-block fresh/warm pick composes on top, exactly
    as in ops.engine.compress_blocks)."""
    import os as _os
    from sqz_tpu import native
    from sqz_tpu.ops.sqz4_pallas import (unpack_group_payloads,
                                         _enc_seed_table)
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    n = mesh.devices.size
    fused = _os.environ.get("SQZ_ENC_FUSED", "1") == "1"
    # pad the group count to a device multiple
    G = -(-NB // lanes)
    Gp = ((G + n - 1) // n) * n
    tp_cap = -(-(5 * bs // 2 + 64) // (4 * tc)) * 4 * tc
    if warm:
        mw, sw, mx, seed = native.sqz4_plan_pack(
            data, window, blk_bits, True, lanes, tp_cap, warm=True,
            paired=fused)
        seed_tab = _enc_seed_table(seed, Gp, lanes, fresh_lane0=True)
    else:
        mw, sw, mx = native.sqz4_plan_pack(data, window, blk_bits, True,
                                           lanes, tp_cap, paired=fused)
        seed_tab = None
    rows = max(-(-int(mx) // tc) * tc, tc)
    if Gp > G:
        pad = np.full((Gp - G,) + mw.shape[1:], 0xFFFFFFFF, np.uint32)
        mw = np.concatenate([mw, pad])
        sw = np.concatenate([sw, np.zeros_like(pad)])
    cap_words = (-(-(bs + 2048 + 3) // 4) + 31) // 32 * 32
    if warm:
        cap_words = (-(-(bs + bs // 4 + 2048 + 3) // 4) + 31) // 32 * 32
    fn = sharded_encode_pallas_fn(mesh, cap_words, tc, interpret,
                                  wide=warm or blk_bits >= 15,
                                  seeded=warm, fused=fused)
    args = [jnp.asarray(np.ascontiguousarray(mw[:, :rows])),
            jnp.asarray(np.ascontiguousarray(sw[:, :rows]))]
    if warm:
        args.append(jnp.asarray(seed_tab))
    words, lens = fn(*args)
    # multi-host ready ordered gather: payloads stay sharded, every process
    # trims its addressable shards against the replicated length table
    from sqz_tpu.parallel import multihost
    lens_flat = np.asarray(lens)[:, 0, :].reshape(-1)
    over = np.nonzero(lens_flat[:NB] > cap_words * 4)[0]
    if over.size and not warm:
        raise ValueError("compressed block exceeded the output capacity")
    out = multihost.gather_payloads_to_host0(
        multihost.addressable_block_payloads(words, lens_flat, NB),
        lens_flat, NB)
    if over.size and out is not None:
        # pathological warm expansion past the kernel buffer (seed badly
        # mismatched content): redo just those blocks on the host, seeded
        # identically — mirrors encode_data_full's fallback
        dictionary = data[:bs][-window:]
        for b in over:
            blk = data[b * bs:(b + 1) * bs]
            out[b] = native.sqz4_compress_payload(
                blk, window, lz=True, seed=seed if b else None,
                dictionary=dictionary if b else b"")
    return out


# ------------------------------------------- device-resident over a mesh

@lru_cache(maxsize=32)
def sharded_resident_fn(mesh: Mesh, Tt: int, Lw: int, t_max: int,
                        cap_words: int, interpret: bool, wide: bool,
                        rle: bool, lanes: int):
    """shard_map program for the device-resident encode (ops/resident.py):
    each device parses and codes ITS OWN resident blocks — the
    distributed-checkpoint use case (sharded arrays compress in place,
    only payload bytes ever leave the devices; no reference counterpart,
    SURVEY.md §2.6). RLE mode uses the literal-worst-case step bound —
    the per-group pair count is not host-readable inside the jitted mesh
    program. Each device loops lane groups of ``lanes`` blocks so one
    kernel call's VMEM footprint stays bounded regardless of shard size
    (the non-sharded path's grouping rule). Cached: jax.jit keys on
    function identity, so a fresh closure per call would recompile every
    checkpoint save."""
    from sqz_tpu.ops import resident
    from sqz_tpu.ops.sqz4_pallas import _encode_tok_pallas_call

    def local(blocks, lengths):
        words_g, lens_g = [], []
        for g0 in range(0, blocks.shape[0], lanes):
            grp = blocks[g0:g0 + lanes]
            gln = lengths[g0:g0 + lanes]
            if rle:
                toks, _pairs = resident._rle_tokens_from_blocks(grp, gln, Tt)
            else:
                toks = resident._tokens_from_lengths(gln, Tt)
            lits = resident._pack_literal_words(grp, Lw)
            w, ln = _encode_tok_pallas_call(
                toks, lits, t_max, cap_words, interpret, wide, lit_skip=rle)
            words_g.append(w)
            lens_g.append(ln)
        words = jnp.concatenate(words_g, axis=0)
        lens = jnp.concatenate(lens_g, axis=0)
        all_lens = jax.lax.all_gather(lens, "blocks", tiled=True)
        return words, all_lens

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("blocks", None), P("blocks")),
        out_specs=(P("blocks", None, None), P(None)),
        **{_VMA_KW: False},
    ))


def encode_resident_sharded(data, blk_bits: int, mesh: Mesh,
                            mode: str = "rle", lanes: int = 128,
                            interpret: bool = False) -> List[bytes]:
    """Device-resident encode with blocks sharded over the mesh: bytes or
    a (device-resident) 1-D u8 array in, ordered per-block sqz4 payloads
    out on host 0 (None elsewhere). ``lanes``: per-device lane-group
    width (multiple of 128)."""
    from sqz_tpu.ops import resident
    from sqz_tpu.parallel import multihost
    if mode not in ("lit", "rle", "lz"):
        raise ValueError(f"unknown resident mode {mode!r}")
    if blk_bits > 16:
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    if mode == "rle" and (1 << blk_bits) < resident.CELL:
        mode = "lit"    # blocks smaller than a cell: no matches possible
    if mode == "lz":
        from sqz_tpu.ops import lzparse
        if (1 << blk_bits) < lzparse.SEG:
            mode = "lit"     # blocks smaller than one parse segment
        else:
            return encode_lz_sharded(data, blk_bits, mesh, lanes,
                                     interpret)
    bs = 1 << blk_bits
    n = mesh.devices.size
    blocks, lengths, NB, _sz = resident._prep_blocks(
        data, blk_bits, n * lanes)
    Tt = resident.rle_group_args(blk_bits)["Tt"] if mode == "rle" \
        else resident._token_dim(bs)
    Lw = resident._lit_word_dim(bs)
    eargs = resident.encode_group_args(blk_bits, interpret=interpret)
    fn = sharded_resident_fn(mesh, Tt, Lw, eargs["t_max"],
                             eargs["cap_words"], interpret,
                             eargs["wide"], mode == "rle", lanes)
    words, lens = fn(blocks, jnp.asarray(lengths))
    lens_flat = np.asarray(lens)[:, 0, :].reshape(-1)
    if (lens_flat[:NB] > eargs["cap_words"] * 4).any():
        raise ValueError("compressed block exceeded the output capacity")
    return multihost.gather_payloads_to_host0(
        multihost.addressable_block_payloads(words, lens_flat, NB),
        lens_flat, NB)


# ------------------------------------------- device-LZ parse over a mesh

@lru_cache(maxsize=32)
def sharded_lz_kernel_fn(mesh: Mesh, Tt: int, Lw: int, t_max: int,
                         cap_words: int, interpret: bool, wide: bool,
                         klanes: int):
    """shard_map program coding LZ-parsed token streams on each device's
    shard (the lane-sharded [1, Tt, B] layout the global-view plan stages
    produce). Loops lane groups of ``klanes`` so one kernel call's VMEM
    stays bounded; pads each group to the kernel's vreg lane multiple
    with empty (EOS-only) lanes and slices the outputs back."""
    from sqz_tpu.ops.resident import EOS_TOKEN
    from sqz_tpu.ops.sqz4_pallas import _encode_tok_pallas_call

    vreg = 32 if interpret else 128

    def local(toks, lits):
        per = toks.shape[2]
        words_g, lens_g = [], []
        for g0 in range(0, per, klanes):
            t = toks[:, :, g0:g0 + klanes]
            li = lits[:, :, g0:g0 + klanes]
            nb = t.shape[2]
            npad = -(-nb // vreg) * vreg
            if npad != nb:
                t = jnp.pad(t, ((0, 0), (0, 0), (0, npad - nb)))
                t = t.at[0, 0, nb:].set(jnp.asarray(EOS_TOKEN, jnp.uint32))
                li = jnp.pad(li, ((0, 0), (0, 0), (0, npad - nb)))
            w, ln = _encode_tok_pallas_call(t, li, t_max, cap_words,
                                            interpret, wide, lit_skip=True)
            words_g.append(w[:, :, :nb])
            lens_g.append(ln[:, :, :nb])
        words = (jnp.concatenate(words_g, axis=2) if len(words_g) > 1
                 else words_g[0])
        lens = (jnp.concatenate(lens_g, axis=2) if len(lens_g) > 1
                else lens_g[0])
        all_lens = jax.lax.all_gather(lens, "blocks", axis=2, tiled=True)
        return words, all_lens

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, "blocks"), P(None, None, "blocks")),
        out_specs=(P(None, None, "blocks"), P(None, None, None)),
        **{_VMA_KW: False},
    ))


def encode_lz_sharded(data, blk_bits: int, mesh: Mesh, lanes: int = 256,
                      interpret: bool = False) -> List[bytes]:
    """Device-LZ resident encode with blocks sharded over the mesh
    (the multi-chip surface for ops/lzparse.py, VERDICT r4 #3).

    The parse runs GLOBAL-VIEW: the SAME staged jit programs as
    lzparse.lz_plan_device (table sorts / candidate select / greedy parse)
    are fed block-sharded arrays, and the GSPMD partitioner keeps every
    stage shard-local — all sorts and scans act along the in-block axis,
    so no collectives are inserted and each device plans its own blocks
    concurrently. The staging discipline carries over unchanged: each
    stage is its own program with at most two lax.sort HLOs, and the
    per-DEVICE sort batch stays at SQZ_LZ_SORT_ROWS (64) rows — the
    partitioner rewrites to local shapes before backend codegen, so the
    compile-friendly shape is preserved on every chip. One i32 (the
    global max fused-pair count, replicated by construction) is read back
    between the plan and the kernel — the same sync the single-device
    path performs. Payloads are byte-identical to
    resident.encode_resident_blocks(mode="lz")."""
    import os as _os

    from jax.sharding import NamedSharding

    from sqz_tpu.ops import lzparse, resident
    from sqz_tpu.parallel import multihost
    n = mesh.devices.size
    bs = 1 << blk_bits
    rows = max(1, int(_os.environ.get("SQZ_LZ_SORT_ROWS", "64")))
    blocks, lengths, NB, _sz = resident._prep_blocks(data, blk_bits,
                                                     n * rows)
    B = blocks.shape[0]
    per = B // n                       # a multiple of rows by _prep_blocks
    gargs = lzparse.lz_group_args(blk_bits, interpret=interpret)
    Tt, Lw = gargs["Tt"], max(96, bs // 4)
    blocks = jax.device_put(blocks, NamedSharding(mesh, P("blocks", None)))
    lens_d = jax.device_put(jnp.asarray(lengths),
                            NamedSharding(mesh, P("blocks")))
    # slice rows-wide column groups of every device's shard concurrently:
    # [B, bs] -> [n, per, bs] (axis 0 sharded) -> local column slice ->
    # back to the [n*rows, bs] stage shape (still axis-0 sharded)
    b3 = blocks.reshape(n, per, bs)
    l2 = lens_d.reshape(n, per)
    toks_j, lits_j, pairs_j = [], [], []
    for j in range(0, per, rows):
        blk = b3[:, j:j + rows].reshape(n * rows, bs)
        ln = l2[:, j:j + rows].reshape(n * rows)
        grams = lzparse._grams_env()
        dists = [lzparse._table_stage(blk, ln, k, gargs["seg"],
                                      gargs["verify"])
                 for k in grams]
        ml, dist = lzparse._select_stage(ln, *dists, grams=grams)
        toks, lits, pairs, _dem = lzparse._parse_stage(
            blk, ml, dist, ln, Tt, lzparse.SEG, True, Lw)
        toks_j.append(toks.reshape(1, Tt, n, rows))
        lits_j.append(lits.reshape(1, Lw, n, rows))
        pairs_j.append(pairs.reshape(n, rows))
    cat = (lambda xs, ax: xs[0] if len(xs) == 1
           else jnp.concatenate(xs, axis=ax))
    toks = cat(toks_j, 3).reshape(1, Tt, B)
    lits = cat(lits_j, 3).reshape(1, Lw, B)
    pairs = cat(pairs_j, 1).reshape(B)
    # kernel step bound: global max pairs, computed under jit with an
    # explicitly REPLICATED output so every process can read its local
    # copy (a plain np.asarray on a multi-process sharded array is not
    # addressable); bucketed so the kernel program is reused across calls
    pmax = jax.jit(jnp.max,
                   out_shardings=NamedSharding(mesh, P()))(pairs)
    bq = 32 if interpret else 1024
    t_max = max(bq, -(-int(jax.device_get(pmax)) // bq) * bq)
    klanes = min(lanes, 256 if blk_bits >= 16 else 512)
    fn = sharded_lz_kernel_fn(mesh, Tt, Lw, t_max, gargs["cap_words"],
                              interpret, gargs["wide"], klanes)
    words, all_lens = fn(toks, lits)
    lens_flat = np.asarray(all_lens)[0, 0, :]
    if (lens_flat[:NB] > gargs["cap_words"] * 4).any():
        raise ValueError("compressed block exceeded the output capacity")
    return multihost.gather_payloads_to_host0(
        multihost.addressable_lane_payloads(words, lens_flat, NB),
        lens_flat, NB)


@lru_cache(maxsize=32)
def sharded_resident_decode_fn(mesh: Mesh, Pw: int, t_max: int, lw: int,
                               tw: int, mw: int, bs: int, interpret: bool,
                               wide: bool, lanes: int):
    """shard_map program for the device-resident RLE decode
    (ops/resident.decode_rle_group): each device decodes + assembles its
    own block shards in lane groups of ``lanes`` (one kernel call's VMEM
    stays bounded regardless of shard size); bad-lane flags all-gather so
    every process sees which (rare) blocks need the host fallback.
    Cached for the same reason as sharded_resident_fn."""
    from sqz_tpu.ops import resident

    from sqz_tpu.ops import lz_restore

    def local(buf, plens, sizes):
        blocks_g, bad_g = [], []
        per = plens.shape[0]
        for g0 in range(0, per, lanes):
            blocks, _counts, bad = resident.decode_rle_group(
                buf[:, :, g0:g0 + lanes], plens[g0:g0 + lanes],
                sizes[g0:g0 + lanes], Pw=Pw, t_max=t_max, lw=lw, tw=tw,
                mw=mw, bs=bs, interpret=interpret, wide=wide)
            # lanes the cell model rejects re-assemble with the exact
            # general assembly (ops/lz_restore.py) — the sharded mirror
            # of decompress_resident(assembly="auto"); host fallback then
            # only ever sees kernel-flagged corrupt blocks. lax.cond:
            # pure cell containers skip the second pass at runtime.
            def _fix(_, g0=g0, blocks=blocks, bad=bad):
                gblocks, _gc, gbad = lz_restore.decode_lz_group(
                    buf[:, :, g0:g0 + lanes], plens[g0:g0 + lanes],
                    sizes[g0:g0 + lanes], Pw=Pw, t_max=t_max, lw=lw,
                    tw=tw, mw=mw, bs=bs, interpret=interpret, wide=wide)
                sel = bad & ~gbad
                return (jnp.where(sel[:, None], gblocks, blocks),
                        bad & gbad)

            def _keep(_, blocks=blocks, bad=bad):
                return blocks, bad

            blocks, bad = jax.lax.cond(jnp.any(bad), _fix, _keep, None)
            blocks_g.append(blocks)
            bad_g.append(bad)
        blocks = jnp.concatenate(blocks_g, axis=0)
        bad = jnp.concatenate(bad_g, axis=0)
        all_bad = jax.lax.all_gather(bad, "blocks", tiled=True)
        return blocks, all_bad

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("blocks", None, None), P("blocks"), P("blocks")),
        out_specs=(P("blocks", None), P(None)),
        **{_VMA_KW: False},
    ))


def decompress_resident_sharded(blob: bytes, mesh: Mesh, lanes: int = 128,
                                interpret: bool = False):
    """Restore a cold sqz4 sqzt container to a device-resident u8 array
    with blocks sharded over the mesh (each device assembles its own
    shards; the sharded mirror of ops/resident.decompress_resident —
    shared container/payload scaffolding lives there)."""
    import numpy as np

    from sqz_tpu.ops import resident
    from sqz_tpu.ops import sqz4_pallas as sp
    blk_bits, osize, payloads, sizes_l = \
        resident.unpack_cold_container(blob)
    bs = 1 << blk_bits
    NB = len(payloads)
    if blk_bits < 7:                         # smaller than a cell
        out = np.zeros((NB, bs), np.uint8)
        resident.host_decode_blocks(payloads, sizes_l, range(NB), out)
        return jnp.asarray(out.reshape(-1)[:osize])
    n = mesh.devices.size
    rows = max(n * lanes, -(-NB // (n * lanes)) * n * lanes)
    per = rows // n                          # blocks per device shard
    plan = sp.plan_decode_dispatch(lanes, blk_bits, lanes=lanes, slots=1,
                                   interpret=interpret)
    Pw = plan["Pw"]
    buf = np.zeros((n, Pw, per), np.uint32)
    plens = np.zeros((rows,), np.int32)
    sizes = np.zeros((rows,), np.int32)
    over = np.zeros((rows,), bool)
    for g in range(n):
        grp = payloads[g * per:(g + 1) * per]
        gsz = sizes_l[g * per:(g + 1) * per]
        bg, pl, sz, ov = resident.pack_payload_group(grp, gsz, Pw, per)
        buf[g] = bg[0]
        plens[g * per:g * per + per] = pl
        sizes[g * per:g * per + per] = sz
        over[g * per:g * per + per] = ov
    fn = sharded_resident_decode_fn(
        mesh, Pw, plan["t_max"], plan["lw"], plan["tw"], plan["mw"], bs,
        interpret, blk_bits >= 15, lanes)
    blocks, all_bad = fn(jnp.asarray(buf), jnp.asarray(plens),
                         jnp.asarray(sizes))
    bad_np = np.asarray(all_bad)[:NB] | over[:NB]
    bad_idx = np.nonzero(bad_np)[0]
    if bad_idx.size:
        # surgical per-block fallback: only the (rare) bad blocks cross
        # the link, not the whole container
        fix = np.zeros((bad_idx.size, bs), np.uint8)
        resident.host_decode_blocks([payloads[i] for i in bad_idx],
                                    [sizes_l[i] for i in bad_idx],
                                    range(bad_idx.size), fix)
        blocks = blocks.at[jnp.asarray(bad_idx)].set(jnp.asarray(fix))
    return blocks[:NB].reshape(-1)[:osize]
