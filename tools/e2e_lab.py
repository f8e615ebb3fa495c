"""Stage breakdown for the pipelined end-to-end encode (PERF.md round 3).

Times each stage of the token-transport path serially on one 512-block
group, then the full pipelined wall on N groups, so overlap efficiency and
the binding constraint (host plan vs tunnel transfer vs kernel) are
explicit. Run on the real chip:

    python tools/e2e_lab.py [--mib 32] [--groups 4]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32, help="bytes per group")
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--blk-bits", type=int, default=16)
    ap.add_argument("--depth", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sqz_tpu import native
    from sqz_tpu.ops import sqz4_pallas as sp
    from sqz_tpu.ops.pipeline import encode_data_pipelined

    blk_bits = args.blk_bits
    bs = 1 << blk_bits
    window = 1 << 15
    lanes = sp.ENC_LANES
    cap = bs + 2048
    cap_words = (-(-(cap + 3) // 4) + 31) // 32 * 32
    wide = blk_bits >= 15

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _input_bytes  # noqa: E402  (repo-root bench helper)

    data = _input_bytes(args.mib << 20)
    nb = -(-len(data) // bs)
    assert nb <= lanes, "one group only for the serial breakdown"
    tok_cap = min(-(-(2 * bs // 3 + 96) // 32) * 32, 1 << 14)
    lit_cap = max(bs, 128)
    bq = 1024

    # --- raw tunnel bandwidth (computed download so the copy is real)
    probe = np.random.randint(0, 254, 8 << 20, np.uint8)
    f_inc = jax.jit(lambda x: x + 1)
    x = f_inc(jax.device_put(probe)); x.block_until_ready()
    t_up = min(_t(lambda: np.asarray(jax.device_put(probe)[:8]))
               for _ in range(3))
    y = f_inc(x); y.block_until_ready()
    t_dn = min(_t(lambda: np.asarray(f_inc(x))) for _ in range(3))
    print(f"tunnel: up {len(probe)/t_up/1e6:.1f} MB/s, "
          f"down {len(probe)/t_dn/1e6:.1f} MB/s")

    # --- stage 1: token plan (host, single core)
    for _ in range(2):
        t0 = time.perf_counter()
        toks, lits, counts, _mx = native.sqz4_tok_plan(
            data, window, blk_bits, True, tok_cap, lit_cap, depth=args.depth)
        t_plan = time.perf_counter() - t0
    print(f"plan: {len(data)/t_plan/1e6:.1f} MB/s ({t_plan:.2f} s)")

    fit = [b for b in range(nb) if counts[b, 2] >= 0]
    fit.sort(key=lambda b: int(counts[b, 2]))
    Tt = max(96, min(-(-int(counts[fit, 0].max()) // bq) * bq, tok_cap))
    lw_ = (int(counts[fit, 1].max()) + 3) // 4
    Lw = max(96, min(-(-lw_ // bq) * bq, lit_cap // 4))
    t_max = -(-int(counts[fit, 2].max()) // bq) * bq
    tarr = np.zeros((1, lanes, Tt), np.uint32)
    larr = np.zeros((1, lanes, Lw * 4), np.uint8)
    tarr[0, :len(fit)] = toks[fit, :Tt]
    larr[0, :len(fit)] = lits[fit, :Lw * 4]
    used_tok = int(counts[fit, 0].sum()) * 4
    used_lit = int(counts[fit, 1].sum())
    up_bytes = tarr.nbytes + larr.nbytes
    print(f"upload slabs: {up_bytes/2**20:.1f} MiB "
          f"({up_bytes/len(data):.2f} B/B; used tok {used_tok/2**20:.1f} + "
          f"lit {used_lit/2**20:.1f} MiB = {(used_tok+used_lit)/len(data):.2f} B/B)")

    # --- stage 2: upload (fenced)
    for _ in range(2):
        t0 = time.perf_counter()
        td = jax.device_put(tarr)
        ld = jax.device_put(larr)
        _ = np.asarray(td[0, 0, :1]); _ = np.asarray(ld[0, 0, :1])
        t_upl = time.perf_counter() - t0
    print(f"upload: {up_bytes/t_upl/1e6:.1f} MB/s of slab "
          f"({len(data)/t_upl/1e6:.1f} MB/s of input, {t_upl:.2f} s)")

    # --- stage 3: kernel (device relayout + coder, fenced)
    def run_kernel():
        tdev = sp._transpose_tok(jnp.asarray(tarr))
        ldev = sp._pack_ops_words(jnp.asarray(larr))
        words, lens = sp._encode_tok_pallas(tdev, ldev, t_max, cap_words,
                                            False, wide)
        lens.block_until_ready()
        return words, lens
    words, lens = run_kernel()           # compile
    t0 = time.perf_counter()
    words, lens = run_kernel()
    t_kern = time.perf_counter() - t0    # includes (re)upload, small vs kernel
    print(f"kernel(+relayout): {len(data)/t_kern/1e6:.1f} MB/s ({t_kern:.2f} s)")

    # --- stage 4: lens + words download
    t0 = time.perf_counter()
    lens_np = np.asarray(lens)
    t_lens = time.perf_counter() - t0
    payload_sum = int(lens_np[:, 0].sum())
    t0 = time.perf_counter()
    trimmed = sp.fetch_words_trimmed(words, lens_np)
    t_dl = time.perf_counter() - t0
    print(f"download: trimmed {trimmed.nbytes/2**20:.1f} MiB vs payload "
          f"{payload_sum/2**20:.1f} MiB ({trimmed.nbytes/len(data):.2f} vs "
          f"{payload_sum/len(data):.2f} B/B) in {t_dl:.2f} s "
          f"(+lens {t_lens:.2f} s) = {trimmed.nbytes/t_dl/1e6:.1f} MB/s")

    # --- stage 5: host unpack
    t0 = time.perf_counter()
    payloads = sp.unpack_group_payloads(trimmed, lens_np, len(fit))
    t_unp = time.perf_counter() - t0
    print(f"unpack: {len(data)/t_unp/1e6:.1f} MB/s ({t_unp:.2f} s)")

    serial = t_plan + t_upl + t_kern + t_lens + t_dl + t_unp
    print(f"serial sum: {serial:.2f} s = {len(data)/serial/1e6:.1f} MB/s")

    # --- full pipelined wall at N groups
    big = _input_bytes(args.groups * args.mib << 20)
    pl = encode_data_pipelined(big, blk_bits, window, True, cap, parse="fast")
    t0 = time.perf_counter()
    pl = encode_data_pipelined(big, blk_bits, window, True, cap, parse="fast")
    t_pipe = time.perf_counter() - t0
    print(f"pipelined ({args.groups} groups, {len(big)>>20} MiB): "
          f"{len(big)/t_pipe/1e6:.1f} MB/s ({t_pipe:.2f} s; "
          f"ratio {sum(len(p) for p in pl)/len(big)*100:.2f}%)")


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
