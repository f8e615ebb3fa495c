#!/usr/bin/env python
"""Price the warm-start anchor generalization (ROADMAP #4) host-side.

Schemes compared at 64 KiB blocks, sqz4, native engine, per-block
both-ways pick (the shipped v2 policy) under each anchor rule:

  v2      anchor = block 0 for every warm block (shipped, FORMAT.md §3.1)
  nearest anchor = nearest PREVIOUS FRESH block (derivable from the fresh
          bitmap; decode = anchors first, then all warm blocks in
          parallel — same 2-round parallelism as v2)
  chain   anchor = immediately previous block, always seeded (upper bound
          on learnable ratio; decode is fully serial — not shippable,
          measured only to bound the gap)
  best2   anchor set = {block 0, nearest previous fresh}; every warm
          block picks the smaller of the two seeded encodings (strict
          superset of v2's choice at +1 bit per warm block; decode
          parallelism unchanged — both anchors are fresh blocks)

Run: python tools/warm_anchor_lab.py [--blk-bits 16] [--mib 1]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

from sqz_tpu import native                                    # noqa: E402
from sqz_tpu.utils import corpus                              # noqa: E402

FILES = ["confucius.txt", "x64.elf", "mandrill.bmp",
         "laozi.txt", "arm64.elf", "mandrill.png"]


def tile(name: str, size: int) -> bytes:
    raw = bytes(corpus.load(name))
    return (raw * (size // len(raw) + 1))[:size]


def split(data: bytes, blk: int):
    return [data[i:i + blk] for i in range(0, len(data), blk)]


def dict_of(block: bytes, window: int) -> bytes:
    return block[-min(window, len(block)):]


def price(blocks, window, scheme: str):
    """Total compressed bytes + fresh count under an anchor scheme."""
    total = 0
    fresh = 0
    anchor_seed = None
    anchor_dict = b""
    seed0 = None
    dict0 = b""
    for i, b in enumerate(blocks):
        cold, state = native.sqz4_compress_payload(
            b, window, lz=True, return_state=True)
        if i == 0:
            total += len(cold)
            fresh += 1
            anchor_seed, anchor_dict = state, dict_of(b, window)
            seed0, dict0 = anchor_seed, anchor_dict
            continue
        if scheme == "chain":
            warm, wstate = native.sqz4_compress_payload(
                b, window, lz=True, seed=anchor_seed, return_state=True,
                dictionary=anchor_dict)
            total += len(warm)
            anchor_seed, anchor_dict = wstate, dict_of(b, window)
            continue
        warm = native.sqz4_compress_payload(
            b, window, lz=True, seed=anchor_seed, dictionary=anchor_dict)
        if scheme == "best2" and anchor_seed is not seed0:
            w0 = native.sqz4_compress_payload(
                b, window, lz=True, seed=seed0, dictionary=dict0)
            if len(w0) < len(warm):
                warm = w0
        if len(cold) < len(warm):
            total += len(cold)
            fresh += 1
            if scheme in ("nearest", "best2"):
                anchor_seed, anchor_dict = state, dict_of(b, window)
        else:
            total += len(warm)
    return total, fresh


def price_beam(blocks, window, beam, prefix=0, parse="exact"):
    """The SHIPPED planner (formats/anchors.py), priced like the schemes.
    ``prefix`` > 0 switches the beam to the prefix-encode cost proxy
    (VERDICT r3 #5): only chosen variants get full encodes."""
    from sqz_tpu.formats.anchors import plan_anchored

    def encode_one(p, seed, dic, want_state):
        return native.sqz4_compress_payload(p, window, lz=True, seed=seed,
                                            return_state=want_state,
                                            dictionary=dic, parse=parse)
    price_one = None
    if prefix:
        def price_one(p, seed, dic):
            return len(encode_one(p[:prefix], seed, dic, False))
    payloads, fresh_mask, _anch = plan_anchored(
        blocks, encode_one, lambda b: dict_of(b, window), beam=beam,
        price_one=price_one)
    return sum(map(len, payloads)), sum(fresh_mask)


def report(tag, data, blk_bits, beams=(2, 12)):
    blocks = split(data, 1 << blk_bits)
    window = 1 << 15
    n = len(data)
    print(f"\n== {tag}: {n/2**20:.1f} MiB, {len(blocks)} blocks "
          f"of 2^{blk_bits} ==", flush=True)
    base = None
    rows = [(s, lambda s=s: price(blocks, window, s))
            for s in ("v2", "nearest", "best2", "chain")]
    rows += [(f"beam-{b}", lambda b=b: price_beam(blocks, window, b))
             for b in beams]
    rows += [(f"beam-{b}-pfx4k",
              lambda b=b: price_beam(blocks, window, b, prefix=4096))
             for b in beams]
    rows += [(f"beam-{b}-pfx4k-fast",
              lambda b=b: price_beam(blocks, window, b, prefix=4096,
                                     parse="fast"))
             for b in beams[:1]]
    for scheme, fn in rows:
        t0 = time.time()
        total, fresh = fn()
        r = 100.0 * total / n
        delta = "" if base is None else f"  ({r - base:+.3f} pp vs v2)"
        base = r if base is None else base
        print(f"  {scheme:8s} ratio {r:6.3f}%  fresh {fresh:3d}/"
              f"{len(blocks)}{delta}  [{time.time()-t0:.0f}s]", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blk-bits", type=int, default=16)
    ap.add_argument("--mib", type=float, default=1.0,
                    help="MiB per corpus file tile")
    args = ap.parse_args()
    assert native.available(), native.build_error()
    per = int(args.mib * 2**20)

    # drifting content: file-type changes every `per` bytes
    drifting = b"".join(tile(f, per) for f in FILES)
    report("drifting (6-file concat)", drifting, args.blk_bits)

    # fast-drifting: interleave 2-block stripes of text and ELF
    blk = 1 << args.blk_bits
    a, b = tile("confucius.txt", per * 3), tile("x64.elf", per * 3)
    stripes = []
    for i in range(0, per * 3, 2 * blk):
        stripes.append(a[i:i + 2 * blk])
        stripes.append(b[i:i + 2 * blk])
    report("striped text/ELF (2-block stripes)", b"".join(stripes),
           args.blk_bits)

    # homogeneous control: warm anchors should not regress
    report("homogeneous text", tile("confucius.txt", per * 4),
           args.blk_bits)


if __name__ == "__main__":
    main()
