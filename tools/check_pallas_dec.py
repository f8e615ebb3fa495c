"""Manual TPU check: Pallas decoder vs native payloads, with timing."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 2 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 14))
lz = os.environ.get("SQZ_BENCH_LZ", "1") == "1"

from sqz_tpu import native
from sqz_tpu.ops import sqz4_pallas
from sqz_tpu.utils import corpus

data = b"".join(f.read_bytes() for f in corpus.available_corpus())
if len(data) < n_bytes:
    data += corpus.texty(n_bytes - len(data), seed=1)
data = data[:n_bytes]
bs = 1 << blk_bits
parts = [data[o:o + bs] for o in range(0, len(data), bs)]
sizes = [len(p) for p in parts]

payloads = [native.sqz4_compress_payload(p, 1 << 15, lz=lz) for p in parts]
t0 = time.perf_counter()
base = [native.sqz4_decompress_payload(pl, s) for pl, s in zip(payloads, sizes)]
t_native = time.perf_counter() - t0
assert b"".join(base) == data
print(f"native 1-thread decode: {len(data)/t_native/1e6:.1f} MB/s")

t0 = time.perf_counter()
outs = sqz4_pallas.decode_groups(payloads, sizes, blk_bits)
t_compile = time.perf_counter() - t0
print(f"pallas decode compile+run: {t_compile:.1f} s")
t0 = time.perf_counter()
outs = sqz4_pallas.decode_groups(payloads, sizes, blk_bits)
t_run = time.perf_counter() - t0
print(f"pallas decode steady: {t_run*1e3:.1f} ms "
      f"({len(data)/t_run/1e6:.1f} MB/s incl. host assemble)")

for b, (o, p) in enumerate(zip(outs, parts)):
    if o != p:
        k = next((j for j in range(min(len(o), len(p))) if o[j] != p[j]),
                 min(len(o), len(p)))
        print(f"block {b}: MISMATCH at {k}")
        sys.exit(1)
print(f"OK: all {len(parts)} blocks decoded bit-exact")
