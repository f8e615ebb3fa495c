"""Manual TPU check: Pallas encoder vs native streams, with timing."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 2 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 14))

from sqz_tpu import native
from sqz_tpu.ops import sqz4_jax, sqz4_pallas
from sqz_tpu.utils import corpus

data = b"".join(f.read_bytes() for f in corpus.available_corpus())
if len(data) < n_bytes:
    data += corpus.texty(n_bytes - len(data), seed=1)
data = data[:n_bytes]
bs = 1 << blk_bits
parts = [data[o:o + bs] for o in range(0, len(data), bs)]
window = 1 << 15

t0 = time.perf_counter()
base = [native.sqz4_compress_payload(p, window, lz=True) for p in parts]
t_native = time.perf_counter() - t0
print(f"native 1-thread encode: {len(data)/t_native/1e6:.1f} MB/s")

t0 = time.perf_counter()
toks = [native.tokenize(p, window, 2, 254, reject_short_far=True)
        for p in parts]
ops = [sqz4_jax.microops_from_token_array(t) for t in toks]
T = max(len(m) for m, _ in ops)
NB = len(ops)
m_ops = np.full((NB, T), sqz4_jax.OP_PAD, dtype=np.int32)
s_ops = np.zeros((NB, T), dtype=np.int32)
for b, (m, s) in enumerate(ops):
    m_ops[b, :len(m)] = m
    s_ops[b, :len(s)] = s
stats = [sqz4_jax.stats_for_ops(m_ops[b], s_ops[b]) for b in range(NB)]
start = np.stack([x[0] for x in stats])
size = np.stack([x[1] for x in stats])
total = np.stack([x[2] for x in stats])
t_host = time.perf_counter() - t0
print(f"host tokenize+stats: {t_host*1e3:.0f} ms "
      f"({len(data)/t_host/1e6:.1f} MB/s), T={T}")

cap = bs * 2 + 4096
t0 = time.perf_counter()
payloads = sqz4_pallas.encode_groups(start, size, total, cap)
t_compile = time.perf_counter() - t0
print(f"pallas encode compile+run: {t_compile:.1f} s")
t0 = time.perf_counter()
payloads = sqz4_pallas.encode_groups(start, size, total, cap)
t_run = time.perf_counter() - t0
print(f"pallas encode steady: {t_run*1e3:.1f} ms "
      f"({len(data)/t_run/1e6:.1f} MB/s incl. host pack/unpack)")

bad = [b for b in range(NB) if payloads[b] != base[b]]
if bad:
    b = bad[0]
    p, q = payloads[b], base[b]
    i = next((k for k in range(min(len(p), len(q))) if p[k] != q[k]),
             min(len(p), len(q)))
    print(f"MISMATCH in {len(bad)}/{NB} blocks; block {b}: "
          f"lens {len(p)} vs {len(q)}, first diff @ {i}: "
          f"{p[max(0,i-4):i+4].hex()} vs {q[max(0,i-4):i+4].hex()}")
    sys.exit(1)
print(f"OK: all {NB} payloads byte-identical to native")
