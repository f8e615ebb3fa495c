"""TPU engine entry points used by sqz_tpu.api (sqzt container required).

Pipeline split: greedy match finding (tokenization) runs on the host native
runtime — embarrassingly block-parallel CPU work — while the
serial-by-construction entropy coding runs on the device. On real TPU
hardware the sqz4 coder uses the Pallas kernels (sqz4_pallas: the whole
serial coder loop as one Mosaic kernel, 128 blocks per vreg lane group); on
CPU backends (tests, virtual meshes) it falls back to the batched XLA scans
(sqz4_jax). Set SQZ_NO_PALLAS=1 to force the scan path everywhere.
"""

from __future__ import annotations

import os
from typing import List, Sequence

from sqz_tpu.formats.constants import (
    SQZ4_MIN_LEN, SQZ4_MAX_LEN, sqz4_reject_short_far,
    SQUEEZE_LEN_MIN, SQUEEZE_LEN_MAX,
)


def _tokenize(part: bytes, window: int, min_len: int, max_len: int,
              reject: bool, lz: bool, dictionary: bytes = b"") -> list:
    if not lz:
        return [("lit", b) for b in part]
    from sqz_tpu import native
    if native.available() and not dictionary:
        toks = native.tokenize(part, window, min_len, max_len,
                               reject_short_far=reject)
        out = []
        for kind, a, b in toks:
            out.append(("lit", int(a)) if kind == 0 else ("match", int(a), int(b)))
        return out
    from sqz_tpu.oracle.match import greedy_tokens
    if reject:
        return greedy_tokens(part, window, min_len, max_len,
                             reject=sqz4_reject_short_far,
                             dictionary=dictionary)
    return greedy_tokens(part, window, min_len, max_len,
                         dictionary=dictionary)


def use_pallas() -> bool:
    """Mosaic TPU kernels only on TPU backends (a GPU backend would select
    pltpu kernels that cannot compile there); XLA scans elsewhere."""
    if os.environ.get("SQZ_NO_PALLAS") not in (None, "", "0"):
        return False
    import jax
    backend = jax.default_backend()
    # the sandbox's tunneled chip registers as the experimental "axon"
    # platform but exposes TPU devices
    return backend == "tpu" or (backend not in ("cpu", "gpu", "cuda", "rocm")
                                and any(d.platform == "tpu"
                                        for d in jax.devices()))


def _pick_smaller(cold: List[bytes], warm: List[bytes], gate=None):
    """Per-block fresh/warm choice (FORMAT.md §3.1). Block 0 is always the
    cold payload (the warm pass codes it fresh too — identical bytes).
    ``gate``: warm-gate candidacy (VERDICT r2 #5) — non-candidates stay
    fresh even when a seeded payload exists (policy parity with executors
    that never coded one)."""
    out, mask = [], []
    for b, (c, w) in enumerate(zip(cold, warm)):
        fresh = (b == 0 or len(c) <= len(w)
                 or (gate is not None and not gate[b]))
        out.append(c if fresh else w)
        mask.append(fresh)
    return out, mask


def compress_blocks(parts: Sequence[bytes], fmt, win_bits: int,
                    lz: bool, warm: bool = False, blk_bits: int = None,
                    parse: str = "auto"):
    """Cold: payloads. Warm: (payloads, fresh_mask) — both a fresh and a
    seeded pass run, keeping the smaller payload per block.

    ``parse`` (Pallas paths): 'fast' approximate matcher (the 'auto'
    default — sqzt's contract is round-trip + ratio, FORMAT.md §3) or
    'exact' reference-semantics parse; SQZ_PARSE env overrides."""
    from sqz_tpu.api import Format, _warm_dictionary
    from sqz_tpu.formats.constants import warm_gate_mask
    if blk_bits is None:
        # single source of truth for the container framing rule
        from sqz_tpu.formats.container import infer_blk_bits
        blk_bits = infer_blk_bits(parts)
    warm = warm and len(parts) > 1
    dictionary = _warm_dictionary(parts[0], win_bits) if warm else b""
    gate = warm_gate_mask(parts, dictionary) if warm else None
    no_cand = warm and not any(gate)
    if not lz:
        dictionary = b""
    if fmt is Format.SQZ4:
        from sqz_tpu.ops import sqz4_jax
        from sqz_tpu import native
        # blk_bits > 16 exceeds the Pallas wide-divider exactness range
        # (FORMAT.md §3.1) — those containers take the XLA scan path
        if use_pallas() and native.available() and blk_bits <= 16:
            from sqz_tpu.ops import sqz4_pallas
            data = b"".join(parts)
            assert all(len(p) == 1 << blk_bits for p in parts[:-1])
            host_parse = sqz4_pallas.parse_mode(parse)
            if (len(parts) > sqz4_pallas.ENC_LANES
                    and os.environ.get("SQZ_PIPELINE", "1") == "1"):
                # multi-group input: planner-thread / device overlap for
                # the cold pass (ops/pipeline.py) — payloads are
                # byte-identical to the serial path for the same parse
                # (asserted in
                # tests/test_sqz4_pallas.py::test_pipelined_encode_matches_serial)
                from sqz_tpu.ops import pipeline
                cold = pipeline.encode_data_pipelined(
                    data, blk_bits, 1 << win_bits, lz,
                    cap=(1 << blk_bits) + 2048, parse=parse)
            else:
                cold = sqz4_pallas.encode_data_full(
                    data, blk_bits, 1 << win_bits, lz,
                    cap=(1 << blk_bits) + 2048, parse=parse)
            if not warm:
                return cold
            if no_cand:
                return cold, [True] * len(parts)
            if sum(gate) <= len(parts) // 4:
                # few candidates (the common case, VERDICT r2 #5): host
                # threads encode just those seeded, against the seed the
                # decoder derives from the coded block 0; same parse
                # policy as the cold pass
                _blk0, seed = native.sqz4_decompress_payload(
                    cold[0], len(parts[0]), return_state=True)
                warm_p = list(cold)
                for b in range(1, len(parts)):
                    if gate[b]:
                        warm_p[b] = native.sqz4_compress_payload(
                            parts[b], 1 << win_bits, lz=lz, seed=seed,
                            dictionary=dictionary, parse=host_parse)
                return _pick_smaller(cold, warm_p, gate)
            warm_p = sqz4_pallas.encode_data_full(
                data, blk_bits, 1 << win_bits, lz,
                cap=(1 << blk_bits) + 2048, warm=True, parse=parse)
            return _pick_smaller(cold, warm_p, gate)
        tokens = [_tokenize(p, 1 << win_bits, SQZ4_MIN_LEN, SQZ4_MAX_LEN,
                            reject=True, lz=lz) for p in parts]
        cold = sqz4_jax.encode_blocks(tokens, blk_bits)
        if not warm:
            return cold
        if no_cand:
            return cold, [True] * len(parts)
        wtokens = [tokens[0]] + [
            _tokenize(p, 1 << win_bits, SQZ4_MIN_LEN, SQZ4_MAX_LEN,
                      reject=True, lz=lz, dictionary=dictionary)
            if gate[i] else tokens[i]
            for i, p in enumerate(parts[1:], start=1)]
        seed = sqz4_jax.seed_from_tokens(tokens[0])
        seeds = [None] + [seed if gate[i] else None
                          for i in range(1, len(parts))]
        warm_p = sqz4_jax.encode_blocks(wtokens, blk_bits, seeds=seeds)
        return _pick_smaller(cold, warm_p, gate)
    else:
        from sqz_tpu import native
        if use_pallas() and native.available():
            from sqz_tpu.ops import sqz4_pallas
            data = b"".join(parts)
            cold = sqz4_pallas.squeeze_encode_data(
                data, blk_bits, win_bits, cap=(1 << blk_bits) + 4096,
                parse=parse)
            if not warm:
                return cold
            if no_cand:
                return cold, [True] * len(parts)
            if sum(gate) <= len(parts) // 4:
                _blk0, seed = native.squeeze_decompress_payload(
                    cold[0], len(parts[0]), return_state=True)
                warm_p = list(cold)
                host_parse = sqz4_pallas.parse_mode(parse)
                for b in range(1, len(parts)):
                    if gate[b]:
                        warm_p[b] = native.squeeze_compress_payload(
                            parts[b], win_bits, seed=seed,
                            dictionary=dictionary, parse=host_parse)
                return _pick_smaller(cold, warm_p, gate)
            warm_p = sqz4_pallas.squeeze_encode_data(
                data, blk_bits, win_bits, cap=(1 << blk_bits) + 4096,
                warm=True, parse=parse)
            return _pick_smaller(cold, warm_p, gate)
        from sqz_tpu.ops import squeeze_jax
        tokens = [_tokenize(p, 1 << win_bits, SQUEEZE_LEN_MIN, SQUEEZE_LEN_MAX,
                            reject=False, lz=True) for p in parts]
        cold = squeeze_jax.encode_blocks(tokens, blk_bits)
        if not warm:
            return cold
        if no_cand:
            return cold, [True] * len(parts)
        wtokens = [tokens[0]] + [
            _tokenize(p, 1 << win_bits, SQUEEZE_LEN_MIN, SQUEEZE_LEN_MAX,
                      reject=False, lz=True, dictionary=dictionary)
            if gate[i] else tokens[i]
            for i, p in enumerate(parts[1:], start=1)]
        warm_p = squeeze_jax.encode_blocks(wtokens, blk_bits,
                                           warm_from_first=True)
        return _pick_smaller(cold, warm_p, gate)


def _warm_scatter(payloads, sizes, fresh_mask, anchor_mask, decode_batch,
                  decode_anchor, win_bits: int) -> bytes:
    """Decode a warm container's blocks as parallel batches: anchor blocks
    host-side first (their model state must be captured — v2: just block 0;
    v3: every fresh block some warm block anchors on, FORMAT.md §3.2),
    then one cold device batch for the remaining fresh blocks and one
    seeded device batch per distinct anchor."""
    from sqz_tpu.api import _warm_dictionary
    from sqz_tpu.formats.container import resolve_anchors
    anchors = resolve_anchors(fresh_mask, anchor_mask)
    needed = sorted({a for a in anchors if a is not None})
    outs = [None] * len(payloads)
    states = {}
    for a in needed:
        outs[a], seed = decode_anchor(payloads[a], sizes[a])
        states[a] = (seed, _warm_dictionary(outs[a], win_bits))
    cold_idx = [b for b in range(len(payloads))
                if fresh_mask[b] and b not in states]
    batches = [(cold_idx, None)] + [
        ([b for b, a in enumerate(anchors) if a == anc], anc)
        for anc in needed]
    for idx, anc in batches:
        if not idx:
            continue
        seed, dictionary = states[anc] if anc is not None else (None, b"")
        batch = decode_batch([payloads[b] for b in idx],
                             [sizes[b] for b in idx], seed, dictionary)
        for b, blk in zip(idx, batch):
            outs[b] = blk
    return b"".join(outs)


def decompress_blocks(payloads: Sequence[bytes], sizes: Sequence[int],
                      fmt, fresh_mask=None, win_bits: int = 15,
                      anchor_mask=None, blk_bits: int = None) -> bytes:
    """``fresh_mask`` (sqzt v2, FORMAT.md §3.1): per-block fresh/warm
    choice; None = cold container. Warm blocks decode seeded from their
    anchor (v2: block 0; v3 ``anchor_mask``: possibly a later fresh
    block, FORMAT.md §3.2), anchors decoded host-side first; each anchor
    group and the fresh set run as separate device batches.

    ``blk_bits``: the container's block size (api.decompress passes it);
    derived from the largest size otherwise — correct only while every
    non-final block is full (split_blocks guarantees that)."""
    from sqz_tpu.api import Format
    from sqz_tpu import native
    if blk_bits is None:
        blk_bits = max(max(s - 1 for s in sizes), 1).bit_length()
    warm = (fresh_mask is not None and len(payloads) > 1
            and not all(fresh_mask))
    if fmt is Format.SQZ4:
        def decode_batch(pls, szs, seed=None, dictionary=b""):
            if not pls:
                return []
            if use_pallas() and blk_bits <= 16:
                from sqz_tpu.ops import pipeline, sqz4_pallas
                plan = sqz4_pallas.plan_decode_dispatch(len(pls), blk_bits)
                if len(pls) > plan["lanes"] * plan["slots"]:
                    # multi-dispatch batch: overlap packing, kernels, and
                    # record assembly (ops/pipeline.py)
                    return pipeline.decode_data_pipelined(
                        pls, list(szs), blk_bits, seed=seed,
                        dictionary=dictionary)
                return sqz4_pallas.decode_groups(
                    pls, list(szs), blk_bits, seed=seed,
                    dictionary=dictionary)
            from sqz_tpu.ops import sqz4_jax
            return sqz4_jax.decode_blocks(pls, list(szs), blk_bits,
                                          seed=seed, dictionary=dictionary)

        if not warm:
            return b"".join(decode_batch(list(payloads), sizes))

        def decode_anchor(pl, sz):
            if native.available():
                return native.sqz4_decompress_payload(pl, sz,
                                                      return_state=True)
            from sqz_tpu.oracle.sqz4 import sqz4_decode_payload
            return sqz4_decode_payload(pl, sz, return_state=True)
        return _warm_scatter(payloads, sizes, fresh_mask, anchor_mask,
                             decode_batch, decode_anchor, win_bits)
    else:
        if use_pallas() and native.available() and anchor_mask is None:
            # Adaptive-Huffman decode is pointer-chasing with data-dependent
            # restructure cascades — measured at microseconds/symbol when
            # emulated with one-hot node gathers (PERF.md "design decisions");
            # the tpu engine runs the threaded native decoder for squeeze
            # payloads and keeps the device scan for CPU meshes. (v3
            # anchored containers take the anchored scatter below — the
            # threaded executor only knows the v2 block-0 schedule.)
            return native.blocks_decompress(
                list(payloads), sum(sizes), 0, blk_bits,
                fresh_mask=fresh_mask if warm else None, win_bits=win_bits)
        if use_pallas() and native.available():
            def decode_batch_nat(pls, szs, seed=None, dictionary=b""):
                return [native.squeeze_decompress_payload(
                            p, s, seed=seed, dictionary=dictionary)
                        for p, s in zip(pls, szs)]

            def decode_anchor_nat(pl, sz):
                return native.squeeze_decompress_payload(
                    pl, sz, return_state=True)
            return _warm_scatter(payloads, sizes, fresh_mask, anchor_mask,
                                 decode_batch_nat, decode_anchor_nat,
                                 win_bits)
        from sqz_tpu.ops import squeeze_jax

        def decode_batch_sq(pls, szs, seed=None, dictionary=b""):
            if not pls:
                return []
            return squeeze_jax.decode_blocks(pls, list(szs), blk_bits,
                                             seed=seed,
                                             dictionary=dictionary)

        if not warm:
            return b"".join(decode_batch_sq(list(payloads), sizes))

        def decode_anchor_sq(pl, sz):
            if native.available():
                return native.squeeze_decompress_payload(pl, sz,
                                                         return_state=True)
            from sqz_tpu.oracle.bitstream import BitReader
            from sqz_tpu.oracle.squeeze import squeeze_decode_payload
            return squeeze_decode_payload(BitReader(pl), sz,
                                          return_state=True)
        return _warm_scatter(payloads, sizes, fresh_mask, anchor_mask,
                             decode_batch_sq, decode_anchor_sq, win_bits)
