"""Block-parallel squeeze decode: the 2-way scaling measurement
(VERDICT r3 weak #7).

PERF.md's squeeze-decode ceiling analysis concludes "the remaining lever
is block-parallel threading, linear on many-core hosts" — asserted, never
demonstrated, because this sandbox exposes 1 vCPU. This lab measures what
*is* measurable here and makes the claim falsifiable:

  1. wall(2 threads) / wall(1 thread) on shared cores — a lock-free
     work-stealing executor timeslices to ~1.0; a contended one collapses
     (>1.2 means threads serialize on something besides the CPU),
  2. process CPU-seconds per MiB at 1 vs 2 threads — extra CPU time at
     2 threads is overhead a many-core host would pay too; parity means
     the only missing ingredient is cores,
  3. the same two numbers for the sqz4 native decode path.

If the quota allows >1 core (cpu_count lies in some sandboxes), (1)
directly shows the speedup instead.

Usage: python tools/decode_scaling_lab.py [MiB]   (default 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

from sqz_tpu import native
from sqz_tpu.utils import corpus


def measure(payloads, total, fmt, blk_bits, nthreads, reps=3):
    best_wall, best_cpu = float("inf"), float("inf")
    for _ in range(reps):
        c0 = time.process_time()
        t0 = time.perf_counter()
        out = native.blocks_decompress(payloads, total, fmt, blk_bits,
                                       nthreads=nthreads)
        wall = time.perf_counter() - t0
        cpu = time.process_time() - c0
        best_wall = min(best_wall, wall)
        best_cpu = min(best_cpu, cpu)
    return out, best_wall, best_cpu


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    blk_bits = 16
    base = b"".join(f.read_bytes() for f in corpus.available_corpus())
    chunks = [base]
    while sum(len(c) for c in chunks) < mib << 20:
        chunks.append(corpus.texty(1 << 20, seed=len(chunks)))
    data = b"".join(chunks)[:mib << 20]
    print(f"input {len(data)} B, cpu_count={os.cpu_count()}")

    for fmt, name in ((0, "squeeze"), (1, "sqz4")):
        payloads = native.blocks_compress(data, fmt, 15, blk_bits,
                                          lz=True, parse="fast")
        rows = {}
        for nt in (1, 2):
            out, wall, cpu = measure(payloads, len(data), fmt, blk_bits, nt)
            assert out == data, f"{name} nt={nt} round-trip"
            rows[nt] = (wall, cpu)
            print(f"{name:8s} nt={nt}: wall {len(data)/wall/1e6:6.1f} MB/s"
                  f"  cpu {cpu/ (len(data)/2**20):.3f} s/MiB")
        w1, c1 = rows[1]
        w2, c2 = rows[2]
        print(f"{name:8s} 2-way: wall ratio {w2/w1:.2f} "
              f"(1.0 = clean timeslice, <0.8 = real cores available), "
              f"cpu overhead {100*(c2/c1-1):+.1f}%")


if __name__ == "__main__":
    main()
