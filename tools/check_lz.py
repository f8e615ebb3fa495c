"""Manual TPU check: the bounded on-device LZ matcher (ops/lzparse.py)
on real hardware at scale — the VERDICT r3 #1 acceptance test:

  1. device-parsed general-content corpus round-trips bit-exact through
     the native decoder (every block),
  2. ratio within ~1.5 pp of the host fast parse on the same blocks,
  3. chip-resident encode MB/s (kernel rate, no transfers).

Env: SQZ_BENCH_BYTES (default 32 MiB), SQZ_BENCH_BLK_BITS (default 16).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 32 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 16))

import jax.numpy as jnp

from sqz_tpu import native
from sqz_tpu.ops import lzparse, resident
from sqz_tpu.utils import corpus

bs = 1 << blk_bits
window = 1 << 15

# general content only — text, source-ish, binaries, light repetition;
# NOT the cell-aligned synthetic spans check_resident.py stresses
base = b"".join(f.read_bytes() for f in corpus.available_corpus())
chunks = []
while sum(len(c) for c in chunks) < n_bytes:
    chunks += [base, corpus.texty(1 << 20, seed=len(chunks))]
data = b"".join(chunks)[:n_bytes]
NB = -(-len(data) // bs)
parts = [data[o:o + bs] for o in range(0, len(data), bs)]
print(f"input {len(data)} B, {NB} blocks of 2^{blk_bits}")

# ---- device-LZ resident encode: spec-valid streams + exact round trip
t0 = time.perf_counter()
payloads = resident.encode_resident_blocks(data, blk_bits, mode="lz")
t_lz = time.perf_counter() - t0
for b in range(NB):
    out = native.sqz4_decompress_payload(payloads[b], len(parts[b]))
    assert out == parts[b], f"LZ resident block {b} round-trip"
ratio_lz = sum(len(p) for p in payloads) / len(data)
print(f"device LZ: {len(data)/t_lz/1e6:.1f} MB/s incl. transfers, "
      f"ratio {ratio_lz*100:.2f}%; all {NB} blocks round-trip "
      f"through the native decoder")

# ---- host fast parse on the same blocks (the ratio yardstick)
t0 = time.perf_counter()
fast_sizes = [len(native.sqz4_compress_payload(p, window, lz=True,
                                               parse="fast"))
              for p in parts]
t_fast = time.perf_counter() - t0
ratio_fast = sum(fast_sizes) / len(data)
dpp = (ratio_lz - ratio_fast) * 100
print(f"host fast parse: {len(data)/t_fast/1e6:.1f} MB/s, "
      f"ratio {ratio_fast*100:.2f}%  ->  device-LZ delta {dpp:+.2f} pp")
assert dpp <= 1.6, f"ratio gap {dpp:.2f} pp exceeds the 1.5 pp bar"

# ---- chip-resident kernel rate (blocks already in HBM, payload stays)
lanes = 256 if blk_bits >= 16 else 512
B = max(lanes, min(NB, 2 * lanes) // lanes * lanes)
arr = np.frombuffer(data[:B * bs], np.uint8).reshape(B, bs)
blocks_d = jnp.asarray(arr)
lens_d = jnp.asarray(np.full((B,), bs, np.int32))
np.asarray(blocks_d[0, 0])                       # fence upload
gargs = lzparse.lz_group_args(blk_bits)
words, lens = lzparse.encode_lz_group(blocks_d, lens_d, **gargs)
np.asarray(lens[0, 0, 0])                        # compile + fence
K = 4
t_enc = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(K):
        w, l = lzparse.encode_lz_group(blocks_d, lens_d, **gargs)
    np.asarray(l[0, 0, 0])
    t_enc = min(t_enc, (time.perf_counter() - t0) / K)
mb = B * bs / 1e6
print(f"chip-resident: LZ enc {mb/t_enc:.1f} MB/s "
      f"({B} lanes of 2^{blk_bits})")

# ---- chip-resident GENERAL restore (ops/lz_restore.py, VERDICT r4 #4):
# the LZ streams just coded restore on-device with zero host byte
# assembly (decode kernel + compaction-sort/pointer-doubling assembly)
from sqz_tpu.ops import lz_restore, sqz4_pallas as sp

lens_np2 = np.asarray(lens)
lz_pl = sp.unpack_group_payloads(sp.fetch_words_trimmed(words, lens_np2),
                                 lens_np2, B)
plan_g = sp.plan_decode_dispatch(B, blk_bits, lanes=B, slots=1)
dargs_g = dict(Pw=plan_g["Pw"], t_max=plan_g["t_max"], lw=plan_g["lw"],
               tw=plan_g["tw"], mw=plan_g["mw"], bs=bs, interpret=False,
               wide=blk_bits >= 15)
bufg, plg, szg, _ov = resident.pack_payload_group(
    lz_pl, [bs] * B, dargs_g["Pw"], B)
bufd, pld, szd = map(jnp.asarray, (bufg, plg, szg))
np.asarray(bufd[0, 0, 0])                        # fence upload
blocks_g, _cg, bad_g = lz_restore.decode_lz_group(bufd, pld, szd,
                                                  **dargs_g)
assert not bool(np.asarray(bad_g)[:B].any()), "general restore bad lane"
for b in range(0, B, max(1, B // 8)):
    assert np.asarray(blocks_g[b]).tobytes() == arr[b].tobytes(), \
        f"general restore block {b}"
t_gr = float("inf")
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(K):
        r = lz_restore.decode_lz_group(bufd, pld, szd, **dargs_g)
    np.asarray(r[2][0])
    t_gr = min(t_gr, (time.perf_counter() - t0) / K)
print(f"chip-resident: general restore {mb/t_gr:.1f} MB/s "
      f"(zero host byte assembly; verified vs input)")
print("OK: device LZ matcher verified on hardware")
