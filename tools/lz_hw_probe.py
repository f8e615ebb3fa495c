"""Stage-by-stage hardware probe of the device LZ parse (ops/lzparse.py):
compile + run walls for each sub-graph at a configurable shape, to find
where the full graph's time goes on the real chip.

Env: LANES (default 64), BLK_BITS (default 16), STAGE (all|tables|match|
greedy|tokens|plan|kernel).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

lanes = int(os.environ.get("LANES", 64))
blk_bits = int(os.environ.get("BLK_BITS", 16))
stage = os.environ.get("STAGE", "all")

import jax
import jax.numpy as jnp

from sqz_tpu.ops import lzparse as lp
from sqz_tpu.utils import corpus

bs = 1 << blk_bits
base = b"".join(f.read_bytes() for f in corpus.available_corpus())
while len(base) < lanes * bs:
    base += base
arr = np.frombuffer(base[:lanes * bs], np.uint8).reshape(lanes, bs)
blocks = jnp.asarray(arr)
lengths = jnp.asarray(np.full((lanes,), bs, np.int32))
np.asarray(blocks[0, 0])            # fence upload
print(f"probe: {lanes} lanes x 2^{blk_bits}, stage={stage}", flush=True)


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    fence = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(jax.tree_util.tree_leaves(fence)[0]).reshape(-1)[0]
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    K = 3
    for _ in range(K):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(
        out[0] if isinstance(out, (tuple, list)) else out)[0]).reshape(-1)[0]
    t_run = (time.perf_counter() - t0) / K
    mb = lanes * bs / 1e6
    print(f"  {name:12s} first {t_compile:7.2f}s   steady {t_run:6.3f}s "
          f"= {mb/t_run:7.1f} MB/s", flush=True)
    return out


if stage in ("all", "tables"):
    for k in lp.GRAM_SIZES:
        f = jax.jit(lambda b, l, k=k: lp._table_dists(b, l, k))
        timed(f"table g{k}", lambda: f(blocks, lengths))

if stage in ("all", "match"):
    f = jax.jit(lp._best_match)
    ml, dist = timed("best_match", lambda: f(blocks, lengths))

if stage in ("all", "greedy"):
    f2 = jax.jit(lambda b, l: lp._greedy_flags(*lp._best_match(b, l),
                                               lp.SEG))
    timed("greedy", lambda: f2(blocks, lengths))

if stage in ("all", "tokens", "plan"):
    Tt = lp.lz_group_args(blk_bits)["Tt"]
    f3 = jax.jit(lambda b, l: lp.lz_plan_device(b, l, Tt))
    timed("plan(full)", lambda: f3(blocks, lengths))

if stage in ("all", "kernel"):
    gargs = lp.lz_group_args(blk_bits)
    timed("enc_group", lambda: lp.encode_lz_group(blocks, lengths,
                                                  **gargs))
print("done", flush=True)
