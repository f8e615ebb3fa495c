"""Stage breakdown for device decode: serial vs pipelined (VERDICT r3 #3).

Times each stage of one decode chunk serially (pack / upload / kernel /
download-full / download-trimmed / postprocess), then the serial
decode_groups wall and the pipelined decode_data_pipelined wall on the
same payloads, so the binding constraint and the overlap efficiency are
explicit. Run on the real chip:

    python tools/dec_pipe_lab.py [--mib 32] [--blk-bits 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()


def _t(fn, reps: int = 1):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--blk-bits", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--stages", action="store_true",
                    help="also run the per-stage serial breakdown")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sqz_tpu import native
    from sqz_tpu.ops import sqz4_pallas as sp
    from sqz_tpu.ops.pipeline import decode_data_pipelined

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _input_bytes  # noqa: E402

    blk_bits = args.blk_bits
    bs = 1 << blk_bits
    data = _input_bytes(args.mib << 20)
    NB = -(-len(data) // bs)
    sizes = [min(bs, len(data) - b * bs) for b in range(NB)]
    print(f"devices={jax.devices()}  {args.mib} MiB, {NB} blocks 2^{blk_bits}")

    t0 = time.perf_counter()
    payloads = [native.sqz4_compress_payload(
        data[b * bs:(b + 1) * bs], 1 << 15, lz=True, parse="fast")
        for b in range(NB)]
    print(f"encode (host fast parse): {time.perf_counter()-t0:.1f}s, "
          f"ratio {sum(map(len, payloads))/len(data)*100:.2f}%")

    plan = sp.plan_decode_dispatch(NB, blk_bits)
    lanes, slots, G = plan["lanes"], plan["slots"], plan["G"]
    Pw, lw, tw, mw = plan["Pw"], plan["lw"], plan["tw"], plan["mw"]
    t_max, chunked = plan["t_max"], plan["chunked"]
    per = lanes * slots
    print(f"plan: lanes={lanes} slots={slots} G={G} chunked={chunked} "
          f"Pw={Pw} lw={lw} tw={tw} mw={mw} "
          f"(buf {Pw*4*per/2**20:.1f} MB; lit {lw*4*per/2**20:.1f} + "
          f"tok {tw*4*per/2**20:.1f} + mrec {mw*4*per/2**20:.1f} MB down "
          f"per chunk)")

    order = sorted(range(NB), key=lambda b: len(payloads[b]))
    sp_pl = [payloads[b] for b in order]
    sp_sz = [sizes[b] for b in order]
    nchunks = -(-NB // per)
    wide = blk_bits >= 15

    # --- per-stage serial breakdown on chunk 0 (and totals over chunks)
    stage = {k: 0.0 for k in ("pack", "upload", "kernel", "dl_full",
                              "dl_trim", "post")}
    for c in range(nchunks if args.stages else 0):
        pl_c = sp_pl[c * per:(c + 1) * per]
        sz_c = sp_sz[c * per:(c + 1) * per]
        t0 = time.perf_counter()
        buf, meta = sp.pack_decode_chunk(pl_c, sz_c, lanes, slots, Pw)
        stage["pack"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        bufd, metad = jnp.asarray(buf), jnp.asarray(meta)
        np.asarray(metad[0, 0, 0])
        np.asarray(bufd[0, 0, 0])
        stage["upload"] += time.perf_counter() - t0
        fn = lambda: sp._decode_pallas(bufd, metad, t_max, lw, tw, mw,
                                       False, wide, slots, None, True)
        res = fn()
        np.asarray(res[3][0, 0, 0])          # compile+run fence
        t0 = time.perf_counter()
        res = fn()
        np.asarray(res[3][0, 0, 0])
        stage["kernel"] += time.perf_counter() - t0
        lit, tok, mrec, counts = res
        t0 = time.perf_counter()
        cnt_np = np.asarray(counts)
        l_np, t_np, m_np = map(np.asarray, (lit, tok, mrec))
        stage["dl_full"] += time.perf_counter() - t0
        # trimmed: device-side max over counts rows picks used rows
        t0 = time.perf_counter()
        # counts rows: 0 optr, 1 nlit, 2 ntok, 3 nmatch, 4 err, 5 steps,
        # 6 ovf (decode kernel docstring)
        cnt2 = np.asarray(counts)
        lit_rows = max(32, -(-int(cnt2[:, 1, :].max()) // 128) * 32)
        tok_rows = max(32, -(-(int(cnt2[:, 2, :].max()) // 32 + 1) // 32)
                       * 32)
        mrec_rows = max(32, -(-int(cnt2[:, 3, :].max()) // 32) * 32)
        l2 = np.asarray(lit[:, :min(lit_rows, lw), :])
        t2 = np.asarray(tok[:, :min(tok_rows, tw), :])
        m2 = np.asarray(mrec[:, :min(mrec_rows, mw), :])
        del l2, t2, m2
        stage["dl_trim"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = sp.postprocess_decode(l_np, t_np, m_np, cnt_np, pl_c, sz_c,
                                     bs)
        stage["post"] += time.perf_counter() - t0
        got = b"".join(outs)
        want = b"".join(data[b * bs:b * bs + sz_c[i]]
                        for i, b in enumerate(order[c * per:(c + 1) * per]))
        assert got == want, f"chunk {c} mismatch"
        print(f"  chunk {c}: used rows lit {lit_rows}/{lw}, "
              f"tok {tok_rows}/{tw}, mrec {mrec_rows}/{mw}")
    if args.stages:
        tot = sum(stage.values()) - stage["dl_trim"]
        print("serial stage totals: " + ", ".join(
            f"{k} {v:.2f}s" for k, v in stage.items()) +
            f"  -> serial-sum {tot:.2f}s = {len(data)/tot/1e6:.1f} MB/s")

    # --- serial decode_groups wall
    out = sp.decode_groups(payloads, sizes, blk_bits)   # warm + verify
    assert b"".join(out) == data, "serial round-trip mismatch"
    t_ser = _t(lambda: sp.decode_groups(payloads, sizes, blk_bits),
               args.reps)
    print(f"serial decode_groups wall: {t_ser:.2f}s = "
          f"{len(data)/t_ser/1e6:.1f} MB/s")

    # --- pipelined wall
    out = decode_data_pipelined(payloads, sizes, blk_bits)  # warm + verify
    assert b"".join(out) == data, "pipelined round-trip mismatch"
    t_pipe = _t(lambda: decode_data_pipelined(payloads, sizes, blk_bits),
                args.reps)
    print(f"pipelined wall: {t_pipe:.2f}s = "
          f"{len(data)/t_pipe/1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
