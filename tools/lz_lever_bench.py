"""Price the device-LZ throughput levers ON HARDWARE (VERDICT r4 #5 /
ROADMAP #3): chip-resident encode rate + ratio for each lever config,
same blocks, same measurement protocol (K async dispatches, best-of-2).

Levers:
  grams8   SQZ_LZ_GRAMS=8           one gram table instead of three
  gather   SQZ_LZ_VERIFY=gather     slim 4-operand sorts + in-row gather
                                    neighbor verify (vs carrying words)
  segN     SQZ_LZ_SORT_SEG=N        overlapped segmented sorts (rows
                                    shrink n -> N; finds dist <= N/2)

Ordered cheapest-compile-first; each config prints as soon as it is
measured, so a kill loses only the in-flight config. Every config's
first 8 blocks round-trip through the native decoder before timing.

Env: SQZ_BENCH_BYTES (default 16 MiB), SQZ_BENCH_BLK_BITS (default 16),
SQZ_LEVER_CONFIGS (comma list to restrict, e.g. "default,grams8").
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 16 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 16))

import jax.numpy as jnp

from sqz_tpu import native
from sqz_tpu.ops import lzparse, sqz4_pallas as sp
from sqz_tpu.utils import corpus

bs = 1 << blk_bits
window = 1 << 15
base = b"".join(f.read_bytes() for f in corpus.available_corpus())
chunks = []
while sum(len(c) for c in chunks) < n_bytes:
    chunks += [base, corpus.texty(1 << 20, seed=len(chunks))]
data = b"".join(chunks)[:n_bytes]
NB = len(data) // bs
lanes = 256 if blk_bits >= 16 else 512
B = max(lanes, NB // lanes * lanes)
arr = np.frombuffer(data[:B * bs], np.uint8).reshape(B, bs)
parts = [arr[b].tobytes() for b in range(B)]
blocks_d = jnp.asarray(arr)
lens_d = jnp.asarray(np.full((B,), bs, np.int32))
np.asarray(blocks_d[0, 0])                       # fence upload
print(f"# {B} blocks of 2^{blk_bits} on {lanes}-lane groups", flush=True)

CONFIGS = [
    ("default", {}),
    ("grams8", {"SQZ_LZ_GRAMS": "8"}),
    ("gather", {"SQZ_LZ_VERIFY": "gather"}),
    ("seg4096", {"SQZ_LZ_SORT_SEG": "4096"}),
    ("grams8+seg4096", {"SQZ_LZ_GRAMS": "8", "SQZ_LZ_SORT_SEG": "4096"}),
]
only = os.environ.get("SQZ_LEVER_CONFIGS")
if only:
    names = only.split(",")
    CONFIGS = [c for c in CONFIGS if c[0] in names]

LEVER_KEYS = ("SQZ_LZ_GRAMS", "SQZ_LZ_VERIFY", "SQZ_LZ_SORT_SEG")
K = int(os.environ.get("SQZ_BENCH_K", 4))
mb = B * bs / 1e6
rows = []
for name, env in CONFIGS:
    for k in LEVER_KEYS:
        os.environ.pop(k, None)
    os.environ.update(env)
    t_c0 = time.perf_counter()
    gargs = lzparse.lz_group_args(blk_bits)
    try:
        words, lens = lzparse.encode_lz_group(blocks_d, lens_d, **gargs)
        np.asarray(lens[0, 0, 0])                # compile/load + fence
    except Exception as e:                       # noqa: BLE001
        print(f"{name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
        continue
    t_compile = time.perf_counter() - t_c0
    lens_np = np.asarray(lens)
    payloads = sp.unpack_group_payloads(
        sp.fetch_words_trimmed(words, lens_np), lens_np, B)
    for b in range(8):                           # spec-validity spot check
        assert native.sqz4_decompress_payload(
            payloads[b], bs) == parts[b], f"{name} block {b} round-trip"
    ratio = sum(len(p) for p in payloads) / (B * bs)
    t_enc = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(K):
            w, l = lzparse.encode_lz_group(blocks_d, lens_d, **gargs)
        np.asarray(l[0, 0, 0])
        t_enc = min(t_enc, (time.perf_counter() - t0) / K)
    rows.append((name, mb / t_enc, ratio, t_compile))
    print(f"{name:16s} enc {mb/t_enc:7.1f} MB/s  ratio {ratio*100:6.2f}%"
          f"  first-call {t_compile:6.1f}s", flush=True)

print("\n| config | enc MB/s | ratio | first-call s |", flush=True)
print("|---|---|---|---|", flush=True)
for name, rate, ratio, tc in rows:
    print(f"| {name} | {rate:.1f} | {ratio*100:.2f}% | {tc:.1f} |",
          flush=True)
