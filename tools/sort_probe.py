"""Safety-ladder microbench of jax.lax.sort on the TPU backend.

The device LZ parse (ops/lzparse.py) leans on [B, n] variadic sorts; the
first hardware run of the full graph wedged the axon tunnel (2026-08-19),
so this probe isolates WHERE sort cost explodes: it walks shapes from tiny
upward, separates AOT compile time from run time, and varies the operand
count — and each step prints BEFORE it starts, so a wedge identifies the
exact (shape, operands) that caused it.

Run under `timeout`; pass a per-step budget so the ladder stops before a
step that would wedge:  SORT_STEP_BUDGET (s, default 120) aborts the
ladder when the previous step exceeded it.

Env: ROWS (csv, default "8,64,256"), COLS (csv, default
"4096,16384,65536"), OPS (csv operand counts, default "2,4,7"),
SORT_STEP_BUDGET.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

rows = [int(x) for x in os.environ.get("ROWS", "8,64,256").split(",")]
cols = [int(x) for x in os.environ.get("COLS", "4096,16384,65536").split(",")]
opss = [int(x) for x in os.environ.get("OPS", "2,4,7").split(",")]
budget = float(os.environ.get("SORT_STEP_BUDGET", "120"))

import jax
import jax.numpy as jnp

print(f"devices={jax.devices()}", flush=True)
rng = np.random.default_rng(3)


def step(B, n, nops):
    key = jnp.asarray(rng.integers(0, 1 << 31, (B, n), dtype=np.int32))
    pay = [jnp.asarray(rng.integers(0, 1 << 31, (B, n), dtype=np.int32))
           for _ in range(nops - 1)]
    np.asarray(key[0, 0])                            # fence upload

    def f(k, *p):
        return jax.lax.sort((k,) + p, dimension=1, num_keys=1,
                            is_stable=True)

    jf = jax.jit(f)
    print(f"  [{B}x{n} ops={nops}] lowering...", flush=True)
    t0 = time.perf_counter()
    lowered = jf.lower(key, *pay)
    t_low = time.perf_counter() - t0
    print(f"  [{B}x{n} ops={nops}] compiling (lower {t_low:.1f}s)...",
          flush=True)
    t0 = time.perf_counter()
    comp = lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"  [{B}x{n} ops={nops}] running (compile {t_comp:.1f}s)...",
          flush=True)
    t0 = time.perf_counter()
    out = comp(key, *pay)
    np.asarray(out[0][0, 0])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    K = 3
    for _ in range(K):
        out = comp(key, *pay)
    np.asarray(out[0][0, 0])
    t_run = (time.perf_counter() - t0) / K
    mb = B * n * 4 * nops / 1e6
    print(f"  [{B}x{n} ops={nops}] compile {t_comp:6.1f}s  first "
          f"{t_first:6.2f}s  steady {t_run*1e3:8.1f} ms  "
          f"({mb/t_run:8.0f} MB/s operand traffic)", flush=True)
    return max(t_comp, t_first)


for n in cols:
    for B in rows:
        for nops in opss:
            t = step(B, n, nops)
            if t > budget:
                print(f"ladder stop: step took {t:.0f}s > "
                      f"{budget:.0f}s budget", flush=True)
                sys.exit(0)
print("done", flush=True)
