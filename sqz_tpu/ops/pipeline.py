"""Pipelined sqz4 encode: overlap host planning, host->device transfer,
and the Pallas coder kernel (VERDICT r2 #1 / ROADMAP r2 #3).

The serial engine runs plan -> upload -> kernel -> download -> unpack per
call, so the chip idles during the host stages and vice versa. Here the
input is split into GROUPS of ``lanes`` blocks (the kernel's natural batch)
and a planner thread keeps planning group k+1 while the device codes group
k; JAX's async dispatch queues uploads and kernel calls without blocking,
and per-group downloads drain while later groups still compute. On this
sandbox's 1-vCPU host the planner thread overlaps with the main thread's
transfer/fence waits (ctypes releases the GIL around the native planner);
on a many-core host the planner parallelizes internally as well
(sqz4_fast_plan is block-threaded).

Streams are identical to the non-pipelined path with the same ``parse``
mode — grouping only batches kernel dispatches; each block's op stream and
model state are unchanged (blocks are independent, SURVEY §2.6).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import List

import numpy as np


def encode_data_pipelined(data: bytes, blk_bits: int, window: int, lz: bool,
                          cap: int, parse: str = "auto",
                          depth: int = None, lanes: int = None,
                          interpret: bool = False) -> List[bytes]:
    """Whole-buffer sqz4 encode with host/device overlap. Returns per-block
    payloads (same contract as sqz4_pallas.encode_data_full, cold path)."""
    import jax.numpy as jnp
    from sqz_tpu import native
    from sqz_tpu.ops import sqz4_pallas as sp

    if blk_bits > 16:
        raise ValueError("sqz4 TPU kernels support blk_bits <= 16")
    parse = sp.parse_mode(parse)
    if depth is None:
        depth = int(os.environ.get("SQZ_FAST_DEPTH", "32"))
    tc = sp.ENC_TC
    if lanes is None:
        lanes = sp.ENC_LANES
    fused = os.environ.get("SQZ_ENC_FUSED", "1") == "1"
    bs = 1 << blk_bits
    NB = max(1, -(-len(data) // bs))
    G = -(-NB // lanes)
    gbytes = bs * lanes                      # input bytes per group
    tp_cap = -(-(5 * bs // 2 + 64) // (4 * tc)) * 4 * tc
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    wide = blk_bits >= 15

    # ---- stage 1 (planner thread): plan one group at a time; a depth-2
    # queue keeps at most one planned-but-undispatched group in memory
    q: queue.Queue = queue.Queue(maxsize=2)

    def planner():
        try:
            for g in range(G):
                chunk = data[g * gbytes:(g + 1) * gbytes]
                nb = max(1, -(-len(chunk) // bs))
                if parse == "fast":
                    m8, s8, mx = native.sqz4_fast_plan(
                        chunk, window, blk_bits, lz, tp_cap, paired=fused,
                        depth=depth)
                    rows = -(-int(mx) // (4 * tc)) * tc
                    mp = np.full((lanes, rows * 4), 255, np.uint8)
                    s8p = np.zeros((lanes, rows * 4), np.uint8)
                    mp[:nb] = m8[:, :rows * 4]
                    s8p[:nb] = s8[:, :rows * 4]
                    q.put((g, nb, rows, mp, s8p))
                else:
                    mw, sw, mx = native.sqz4_plan_pack(
                        chunk, window, blk_bits, lz, lanes, tp_cap,
                        paired=fused)
                    rows = -(-int(mx) // (4 * tc)) * tc
                    q.put((g, nb, rows,
                           np.ascontiguousarray(mw[:, :rows]),
                           np.ascontiguousarray(sw[:, :rows])))
        except BaseException as e:          # surface planner errors
            q.put(e)
            return
        q.put(None)

    t = threading.Thread(target=planner, daemon=True)
    t.start()

    # ---- stage 2 (main thread): upload + dispatch per group (async), then
    # drain results in order — downloads overlap later groups' compute
    pending = []                             # (g, nb, lens_dev, words_dev)
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        g, nb, rows, ma, sa = item
        if parse == "fast":
            mw_dev = sp._pack_ops_words(jnp.asarray(ma.reshape(1, lanes, -1)))
            sw_dev = sp._pack_ops_words(jnp.asarray(sa.reshape(1, lanes, -1)))
        else:
            mw_dev = jnp.asarray(ma)         # already [1, rows, lanes]
            sw_dev = jnp.asarray(sa)
        words, lens = sp._encode_full_pallas(mw_dev, sw_dev, cap_words, tc,
                                             interpret, wide, fused)
        pending.append((g, nb, words, lens))

    payloads: List[bytes] = []
    for g, nb, words, lens in pending:
        lens_np = np.asarray(lens)
        if int(lens_np[:, 0].max(initial=0)) > cap_words * 4:
            raise ValueError("compressed block exceeded the output capacity")
        payloads.extend(sp.unpack_group_payloads(np.asarray(words), lens_np,
                                                 nb))
    t.join()
    return payloads
