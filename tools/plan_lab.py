"""Host pipeline stage lab: threads-vs-throughput for the native planning
stages every real encode pays (VERDICT r1 #8) — sqz4_plan_pack (tokenize +
micro-op expand + device-layout pack) and squeeze_plan_pack (full adaptive-
Huffman encode recording bitstream writes).

Env: SQZ_BENCH_BYTES (32 MiB), SQZ_BENCH_BLK_BITS (16),
SQZ_LAB_THREADS ("1,2,4,8,16,0"; 0 = hardware concurrency).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

from sqz_tpu import native                                   # noqa: E402
from sqz_tpu.ops import sqz4_pallas as sp                    # noqa: E402
from sqz_tpu.utils import corpus                             # noqa: E402

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 32 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 16))
threads = [int(x) for x in
           os.environ.get("SQZ_LAB_THREADS", "1,2,4,8,16,0").split(",")]

data = b"".join(f.read_bytes() for f in corpus.available_corpus())
while len(data) < n_bytes:
    data += data
data = data[:n_bytes]
bs = 1 << blk_bits
tc = sp.ENC_TC
tp_cap = -(-(5 * bs // 2 + 64) // (4 * tc)) * 4 * tc
tw_cap = -(-(4 * bs + 64) // tc) * tc
print(f"# {len(data)} B, blocks 2^{blk_bits}, "
      f"hw={os.cpu_count()} cpus", flush=True)
for nt in threads:
    best4 = best_sq = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        native.sqz4_plan_pack(data, 1 << 15, blk_bits, True, sp.ENC_LANES,
                              tp_cap, nthreads=nt, paired=True)
        best4 = min(best4, time.perf_counter() - t0)
        t0 = time.perf_counter()
        native.squeeze_plan_pack(data, 15, blk_bits, sp.ENC_LANES, tw_cap,
                                 nthreads=nt)
        best_sq = min(best_sq, time.perf_counter() - t0)
    label = nt if nt else f"auto({os.cpu_count()})"
    print(f"threads={label}: sqz4_plan_pack {len(data)/best4/1e6:7.1f} MB/s"
          f"   squeeze_plan_pack {len(data)/best_sq/1e6:7.1f} MB/s",
          flush=True)
