"""Decode-kernel timing lab: device-resident inputs, K async dispatches per
measurement, one sync — amortizes the sandbox tunnel's ~30 ms dispatch
latency out of the kernel number. Verifies bit-exactness once per config.

Env knobs: SQZ_BENCH_BYTES (default 16 MiB), SQZ_BENCH_BLK_BITS (14),
SQZ_LAB_LANES (comma list, default "128,256"), SQZ_LAB_SLOTS (comma list,
default "1,2,4"), SQZ_LAB_REPS (default 6), SQZ_LAB_K (dispatches per rep, 4).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

n_bytes = int(os.environ.get("SQZ_BENCH_BYTES", 16 * 1024 * 1024))
blk_bits = int(os.environ.get("SQZ_BENCH_BLK_BITS", 14))
lanes_list = [int(x) for x in
              os.environ.get("SQZ_LAB_LANES", "128,256").split(",")]
slots_list = [int(x) for x in
              os.environ.get("SQZ_LAB_SLOTS", "1,2,4").split(",")]
reps = int(os.environ.get("SQZ_LAB_REPS", 6))
K = int(os.environ.get("SQZ_LAB_K", 4))
fused = os.environ.get("SQZ_LAB_FUSED", "1") == "1"

import jax
import jax.numpy as jnp

from sqz_tpu import native
from sqz_tpu.ops import sqz4_pallas as sp
from sqz_tpu.utils import corpus

data = b"".join(f.read_bytes() for f in corpus.available_corpus())
while len(data) < n_bytes:
    data += data
data = data[:n_bytes]
bs = 1 << blk_bits
parts = [data[o:o + bs] for o in range(0, len(data), bs)]
sizes = [len(p) for p in parts]
NB = len(parts)
wide = blk_bits >= 15
payloads = native.blocks_compress(data, 1, 15, blk_bits, lz=True)
order = sorted(range(NB), key=lambda b: len(payloads[b]))
payloads = [payloads[b] for b in order]
dsizes = [sizes[b] for b in order]
print(f"# {len(data)} B, {NB} blocks of 2^{blk_bits}, wide={wide}, fused={fused}",
      flush=True)

for lanes in lanes_list:
    G0 = -(-NB // lanes)
    Pw = -(-(bs + 4096) // 4 + 31) // 32 * 32
    lw = max(bs // 4, 32)
    tw = (-(-bs // 32) + 1 + 31) // 32 * 32
    mw = max(bs // 4, 64)
    t_max = 9 * bs + 64
    for slots in slots_list:
        G = -(-G0 // slots) * slots
        buf = native.sqz4_pack_payloads(payloads, lanes, Pw)
        if buf.shape[0] < G:
            buf = np.concatenate([buf, np.zeros(
                (G - buf.shape[0],) + buf.shape[1:], np.uint32)])
        meta = np.zeros((G, 8, lanes), np.int32)
        for b, p in enumerate(payloads):
            g, lane = divmod(b, lanes)
            meta[g, 0, lane] = len(p)
            meta[g, 1, lane] = dsizes[b]
        bufd, metad = jnp.asarray(buf), jnp.asarray(meta)
        jax.block_until_ready((bufd, metad))
        try:
            out = sp._decode_pallas(bufd, metad, t_max, lw, tw, mw,
                                    False, wide, slots,
                                    None, fused)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"lanes={lanes} slots={slots}: FAIL "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        cnt = np.asarray(out[3]).transpose(0, 2, 1).reshape(G * lanes, 8)[:NB]
        assert not cnt[:, 4].any(), "decode error lanes"
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(K):
                r = sp._decode_pallas(bufd, metad, t_max, lw, tw, mw,
                                      False, wide, slots,
                                      None, fused)
            np.asarray(r[3])     # fence: device executes calls in order;
            #                      block_until_ready is a no-op on the tunnel
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"lanes={lanes} slots={slots} G={G}: {best*1e3:8.2f} ms  "
              f"{len(data)/best/1e6:7.1f} MB/s", flush=True)
