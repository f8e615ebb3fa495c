"""Block-parallel scaling-efficiency harness (BASELINE.md: >= 90 % at
N >= 2 hosts; the reference has nothing to compare — zero parallelism).

Runs the sharded encode over 1 device and over N devices with the same
per-device load (weak scaling — block-parallel compression is
embarrassingly parallel, so efficiency is bounded only by the length-table
all-gather and the host-0 payload exchange), and reports
efficiency = T1 / TN for equal per-device work.

Single-host today: `python tools/scaling_bench.py --processes 1` uses all
local devices (the virtual CPU mesh under JAX_PLATFORMS=cpu, or however
many chips the host has). On a pod: launch one process per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set (or TPU
metadata auto-detect) and the same command line; the harness bootstraps
jax.distributed, shards over the global mesh, and process 0 prints the
report.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=1,
                    help="expected jax.process_count() (sanity check)")
    ap.add_argument("--blocks-per-device", type=int, default=4)
    ap.add_argument("--blk-bits", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the container's sitecustomize forces jax_platforms="axon,cpu";
        # honor an explicit CPU request (virtual-mesh runs) the way
        # tests/conftest.py does — via the config, before backend init
        jax.config.update("jax_platforms", "cpu")

    from sqz_tpu.parallel import multihost
    multihost.bootstrap()
    assert jax.process_count() == args.processes, (
        f"process_count {jax.process_count()} != --processes "
        f"{args.processes}")

    from sqz_tpu.parallel.mesh import make_mesh
    from sqz_tpu.parallel.shard import encode_blocks_sharded
    from sqz_tpu.utils import corpus

    n_dev = len(jax.devices())
    bs = 1 << args.blk_bits

    def run(n_devices: int) -> float:
        mesh = make_mesh(n_devices)
        nb = args.blocks_per_device * n_devices
        blocks = [corpus.texty(bs, seed=i) for i in range(nb)]
        tokens = [[("lit", b) for b in blk] for blk in blocks]
        encode_blocks_sharded(tokens, args.blk_bits, mesh)   # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            encode_blocks_sharded(tokens, args.blk_bits, mesh)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tn = run(n_dev)
    eff = t1 / tn if tn > 0 else 0.0
    if jax.process_index() == 0:
        rec = {
            "metric": "block_parallel_weak_scaling_efficiency",
            "devices": n_dev,
            "processes": jax.process_count(),
            "blk_bits": args.blk_bits,
            "t_1dev_s": round(t1, 4),
            "t_ndev_s": round(tn, 4),
            "value": round(eff, 4),
            "target": 0.9,
        }
        if jax.default_backend() == "cpu":
            rec["caveat"] = ("virtual CPU mesh: all 'devices' share the "
                             "host's cores, so weak-scaling efficiency is "
                             "structurally < 1 here; the number is "
                             "meaningful on real multi-chip hardware")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
