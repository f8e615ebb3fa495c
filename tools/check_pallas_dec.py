"""Manual TPU check: Pallas decoder vs native payloads, with timing."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

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

# ---- corrupt streams through the COMPILED kernel (VERDICT r2 #6): the
# interpret-mode fuzz caps at 12 tiny mutants; here ~100 seeded mutants of
# real payloads hit the hardware error lanes at full speed. Contract per
# mutant: the device decode either rejects (error lane -> ValueError) or
# byte-matches whatever the native decoder does with the same bytes
# (both reject, or both produce identical wrong-length-safe output).
import random

rng = random.Random(1234)
n_mutants = int(os.environ.get("SQZ_FUZZ_MUTANTS", 100))
agree = rejected = produced = 0
for t in range(n_mutants):
    b = rng.randrange(len(payloads))
    pl = bytearray(payloads[b])
    kind = t % 4
    if kind == 0 and len(pl) > 1:                       # single bit flip
        pl[rng.randrange(len(pl))] ^= 1 << rng.randrange(8)
    elif kind == 1 and len(pl) > 1:                     # byte substitution
        pl[rng.randrange(len(pl))] = rng.randrange(256)
    elif kind == 2 and len(pl) > 4:                     # truncation
        del pl[rng.randrange(1, len(pl) - 1):]
    else:                                               # zeroed span
        i = rng.randrange(max(1, len(pl) - 8))
        pl[i:i + 8] = b"\x00" * min(8, len(pl) - i)
    mutant = bytes(pl)
    try:
        nat = native.sqz4_decompress_payload(mutant, sizes[b])
        nat_err = None
    except OSError as e:
        nat, nat_err = None, e.errno
    try:
        dev = sqz4_pallas.decode_groups([mutant], [sizes[b]], blk_bits)[0]
        dev_err = None
    except ValueError:
        dev, dev_err = None, True
    if dev_err:
        rejected += 1
        # device may reject streams the host tolerates (stricter is fine);
        # but if native produced the ORIGINAL block the stream was benign
        # and the device must not reject it
        if nat_err is None and nat == parts[b]:
            print(f"mutant {t}: device rejected a stream native decodes "
                  f"to the original block")
            sys.exit(1)
    else:
        produced += 1
        if nat_err is None and dev != nat:
            print(f"mutant {t}: device output diverges from native "
                  f"(block {b}, kind {kind})")
            sys.exit(1)
        if nat_err is not None:
            # device tolerated what native rejected: acceptable only if
            # the output is the right length (validations differ at the
            # stream tail); flag real divergence
            if len(dev) != sizes[b]:
                print(f"mutant {t}: device produced {len(dev)} B where "
                      f"native raised errno {nat_err}")
                sys.exit(1)
    agree += 1
print(f"OK: {n_mutants} corrupt mutants through the compiled kernel "
      f"({rejected} rejected, {produced} produced; all consistent with "
      f"the native decoder)")
