"""Parse-quality lab for the bounded DEVICE LZ matcher (VERDICT r3 #1).

Simulates, in numpy with EXACTLY device-feasible semantics, the candidate
scheme planned for the on-device general-content parse:

  - exact 4-gram (and optionally 8-gram) last-occurrence tables of H
    buckets, single entry (optionally +1 shadow entry = depth 2), value
    verified (a bucket collision loses the candidate, never lies);
  - match extension by candidate-agreement chaining on a stride-4
    lattice (cand[p+4] == cand[p]+4 proves 4 more exact bytes — no
    gathers, no byte re-verify needed);
  - segment-greedy parse: independent per S-byte segment, matches clip
    at the segment end, at most K matches per segment (the static token
    slot budget of the device grid).

Every simulated rule maps 1:1 onto shift/compare/scan/one-hot-einsum ops
(no per-element gathers), so a measured ratio here is achievable on the
chip. Prices token streams with the exact sqz4 adaptive-model entropy
(the range coder's cost to within a few bytes per block) and compares
against the exact greedy parse and literal-only on the same data.

    python tools/lz_dev_lab.py [--mib 2] [--sweep]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqz_tpu.utils import devcache  # one persistent XLA cache with bench.py

devcache.enable()

WIN = 1 << 15
MAXLEN = 254          # the format cap (sqz_max_len)


# --------------------------------------------------------- candidate tables

def _grams(b: np.ndarray, k: int) -> np.ndarray:
    """EXACT value of the k bytes at each position as a [n-k+1, ceil(k/8)]
    u64 matrix (the device table stores the same words for its exact
    value verify — a fingerprint-only table could lie, and the encoder
    may never emit an unverified match)."""
    n = len(b)
    m = n - k + 1
    words = -(-k // 8)
    g = np.zeros((m, words), np.uint64)
    for j in range(k):
        w = j // 8
        g[:, w] = (g[:, w] << np.uint64(8)) | b[j:m + j]
    return g


def _last_occurrence(g: np.ndarray, H: int, depth: int = 1):
    """Device-table semantics: for each position p, the last q < p whose
    gram HASH lands in the same of H buckets, value-verified (collision
    -> no candidate; no deeper probe). depth=2 adds the second-last
    entry (a two-entry bucket). Returns [depth, n] candidate positions
    (-1 = none)."""
    n = len(g)
    h = np.zeros(n, np.uint64)
    for w in range(g.shape[1]):
        h = (h ^ g[:, w]) * np.uint64(0x9E3779B97F4A7C15)
    h = (h >> np.uint64(64 - int(math.log2(H)))).astype(np.int64)
    order = np.lexsort((np.arange(n), h))        # by (hash, position)
    hs = h[order]
    cands = np.full((depth, n), -1, np.int64)
    for d in range(1, depth + 1):
        same = np.zeros(n, bool)
        same[d:] = hs[d:] == hs[:-d]             # d-th previous in bucket
        prev = np.full(n, -1, np.int64)
        prev[order[d:]] = np.where(same[d:], order[:-d], -1)
        ok = prev >= 0
        okv = ok & (g[np.maximum(prev, 0)] == g).all(axis=1)  # exact value
        cands[d - 1] = np.where(okv, prev, -1)
    return cands


def _chain_runlen(agree: np.ndarray, cap_links: int,
                  stride: int = 1) -> np.ndarray:
    """Consecutive True of ``agree`` on a stride lattice starting at each
    position (log-doubling with static shifts only)."""
    rl = agree.astype(np.int64)
    s = 1
    while s < cap_links:
        sh = np.zeros_like(rl)
        if len(rl) > stride * s:
            sh[:len(rl) - stride * s] = rl[stride * s:]
        rl = np.where(rl == s, s + sh, rl)
        s *= 2
    return np.minimum(rl, cap_links)


def _table_cand(b: np.ndarray, k: int, H: int, depth: int):
    """Per-position nearest value-verified k-gram candidate DISTANCE
    (0 = none) under device-table semantics."""
    n = len(b)
    g = _grams(b, k)
    cands = _last_occurrence(g, H, depth)
    p = np.arange(len(g), dtype=np.int64)
    chosen = np.full(len(g), -1, np.int64)
    for d in range(depth - 1, -1, -1):           # entry 0 = most recent
        c = cands[d]
        ok = (c >= 0) & (p - c < WIN)
        chosen = np.where(ok, c, chosen)
    dist = np.zeros(n, np.int64)
    dist[:len(g)] = np.where(chosen >= 0, p - chosen, 0)
    return dist


def _lcp_len(b: np.ndarray, dist: np.ndarray, base: int) -> np.ndarray:
    """DIAGNOSTIC ONLY (gathers — not device-feasible): true match
    length at each position's candidate distance, capped at MAXLEN."""
    n = len(b)
    p = np.arange(n)
    ml = np.full(n, base, np.int64)
    alive = dist > 0
    for j in range(base, MAXLEN):
        q = np.minimum(p + j, n - 1)
        ok = alive & (p + j < n)
        src = np.clip(q - dist, 0, n - 1)
        eq = ok & (b[q] == b[src])
        ml = np.where(eq, j + 1, ml)
        alive = eq
    return np.where(dist > 0, np.minimum(ml, n - p), 0)


def device_parse_sim(block: bytes, H: int = 4096, S: int = 64, K: int = 99,
                     depth: int = 1, use_g8: bool = True,
                     use_g16: bool = False, mixed_chain: bool = True,
                     rle_dists: int = 0, true_ext: bool = False,
                     lazy: bool = False, len4_max_bits: int = 15,
                     use_g6: bool = False, use_g12: bool = False):
    """Token triples for one block under the device-feasible parse.

    ``mixed_chain``: the extension chain at distance d accepts evidence
    from ANY table (cand4/cand8/cand16 at p+4 with the same d) — each is
    an exact-equality proof of 4 more bytes at d, all shift/compare ops.
    ``rle_dists``: additionally byte-exact runs at fixed small distances
    1..rle_dists (static shift compares), giving len-2+ short matches.
    ``true_ext``: ablation — replace chaining with true LCP (gathers)."""
    b = np.frombuffer(block, np.uint8).astype(np.uint64)
    n = len(b)
    if n < 8:
        return [("lit", int(x)) for x in b]
    d4 = _table_cand(b, 4, H, depth)
    tabs = [(4, d4)]
    if use_g6:
        tabs.append((6, _table_cand(b, 6, H, depth)))
    if use_g8:
        tabs.append((8, _table_cand(b, 8, H, depth)))
    if use_g12:
        tabs.append((12, _table_cand(b, 12, H, depth)))
    if use_g16:
        tabs.append((16, _table_cand(b, 16, H, depth)))

    if true_ext:
        ml = np.zeros(n, np.int64)
        dist = np.zeros(n, np.int64)
        for base, dd in tabs:
            mlt = _lcp_len(b, dd, base)
            take = (mlt > ml) | ((mlt == ml) & (dd > 0) & (dd < dist))
            take &= dd > 0
            ml = np.where(take, mlt, ml)
            dist = np.where(take, dd, dist)
    else:
        # chained lengths. A chain certifies the START's distance only if
        # the chained value is EQUAL along the chain (transitivity):
        # per-table chains qualify (cand[p+4] == cand[p]+4), and so does
        # the cross-table MIN candidate distance (m[p+4] == m[p] proves
        # some table certifies 4 bytes at exactly m[p]).
        ml = np.zeros(n, np.int64)
        dist = np.zeros(n, np.int64)
        chains = [(base, dd, dd) for base, dd in tabs]
        if mixed_chain and len(tabs) > 1:
            m = np.zeros(n, np.int64)
            for _, de in tabs:
                m = np.where((de > 0) & ((m == 0) | (de < m)), de, m)
            chains.append((4, m, m))
        for base, dd, _ in chains:
            valid = dd > 0
            # stride-1 agreement: the gram at p+1 certifying the SAME
            # distance proves ONE more byte -> byte-granular lengths
            agree = np.zeros(n, bool)
            agree[:n - 1] = valid[:n - 1] & valid[1:] & (dd[1:] == dd[:n - 1])
            cap_links = MAXLEN - base
            rl = _chain_runlen(agree, cap_links, stride=1)
            mlt = np.where(valid, base + rl, 0)
            p = np.arange(n)
            mlt = np.minimum(mlt, n - p)
            take = (mlt > ml) | ((mlt == ml) & (dd > 0) & (dd < dist))
            take &= valid
            ml = np.where(take, mlt, ml)
            dist = np.where(take, dd, dist)

    # fixed small-distance byte runs (len 2+ at d <= 7 passes the reject
    # rule; static shift compares on device)
    for d in range(1, rle_dists + 1):
        eq = np.zeros(n, bool)
        eq[d:] = b[d:] == b[:-d]
        # run length of eq starting at p (byte-granular log-doubling)
        rl = eq.astype(np.int64)
        s = 1
        while s < MAXLEN:
            sh = np.zeros_like(rl)
            sh[:n - s] = rl[s:]
            rl = np.where(rl == s, s + sh, rl)
            s *= 2
        mlr = np.minimum(np.minimum(rl, MAXLEN), n - np.arange(n))
        minl = 2 if d.bit_length() <= 3 else 4
        take = (mlr >= minl) & ((mlr > ml) | ((mlr == ml) & (d < dist)))
        ml = np.where(take, mlr, ml)
        dist = np.where(take, d, dist)

    toks = []
    for s in range(0, n, S):
        e = min(s + S, n)
        c = s
        k_used = 0
        lit_from = s
        while c < e:
            mle = min(int(ml[c]), e - c)         # clip at segment end
            dd = int(dist[c])
            minl = 2 if dd.bit_length() <= 3 else 4   # reject-rule floor
            ok = dd > 0 and mle >= minl and k_used < K
            # marginal-match gate: a len-4 match at a far distance costs
            # about as much as 4 literals — skip it
            if ok and mle == 4 and dd.bit_length() > len4_max_bits:
                ok = False
            # one-step lazy: a strictly longer match starting at c+1 wins
            if ok and lazy and c + 1 < e:
                if min(int(ml[c + 1]), e - c - 1) > mle and int(
                        dist[c + 1]) > 0:
                    ok = False
            if ok:
                if c > lit_from:
                    toks.append(("lit_run", bytes(
                        b[lit_from:c].astype(np.uint8))))
                toks.append(("match", mle, int(dist[c])))
                c += mle
                lit_from = c
                k_used += 1
            else:
                c += 1
        if e > lit_from:
            toks.append(("lit_run", bytes(b[lit_from:e].astype(np.uint8))))
    return toks


# ----------------------------------------------------------- entropy pricer

def verify_tokens(toks, block: bytes) -> None:
    """Decode the token stream (spec semantics: overlapped byte copy)
    and require bit-exact reconstruction — an invalid match means the
    parse lied and any priced ratio is fake."""
    out = bytearray()
    for t in toks:
        if t[0] == "lit":
            out.append(t[1])
        elif t[0] == "lit_run":
            out.extend(t[1])
        else:
            _, ln, d = t
            assert 2 <= ln <= 254 and 1 <= d <= len(out) and d < WIN, (
                "illegal match", ln, d, len(out))
            assert not (ln <= 3 and d.bit_length() > 3), ("reject-rule", ln, d)
            for _ in range(ln):
                out.append(out[-d])
    assert bytes(out) == block, "token stream does not reconstruct the block"


class _PM:
    __slots__ = ("f", "t")

    def __init__(self, n):
        self.f = [1] * n
        self.t = n

    def cost(self, s):
        c = math.log2(self.t / self.f[s])
        self.f[s] += 1
        self.t += 1
        return c


def price_tokens(tok_lists) -> float:
    """Exact sqz4 adaptive-model entropy of the token stream (the range
    coder's output size to within ~1 byte per block). Returns bytes."""
    total_bits = 0.0
    for toks in tok_lists:
        lit, size, byt, bits = _PM(2), _PM(256), _PM(256), _PM(32)
        dist = [_PM(2) for _ in range(32)]
        bsum = 0.0
        for t in toks:
            if t[0] == "lit":
                bsum += lit.cost(1) + byt.cost(t[1])
            elif t[0] == "lit_run":
                for ch in t[1]:
                    bsum += lit.cost(1) + byt.cost(ch)
            else:
                _, ln, d = t
                nb = d.bit_length()
                bsum += lit.cost(0) + size.cost(ln) + bits.cost(nb)
                for i in range(nb - 1):
                    bsum += dist[i].cost((d >> i) & 1)
        bsum += lit.cost(0) + size.cost(255)      # EOS
        total_bits += bsum + 64                   # flush tail
    return total_bits / 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=float, default=2)
    ap.add_argument("--blk-bits", type=int, default=16)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    from bench import _input_bytes
    from sqz_tpu import native

    bs = 1 << args.blk_bits
    data = _input_bytes(int(args.mib * (1 << 20)))
    blocks = [data[o:o + bs] for o in range(0, len(data), bs)]
    n = len(data)
    print(f"{n >> 20} MiB tiled corpus, {len(blocks)} blocks 2^{args.blk_bits}")

    # ground truth: real payload ratios
    t0 = time.perf_counter()
    exact = sum(len(native.sqz4_compress_payload(p, WIN, lz=True))
                for p in blocks)
    fast = sum(len(native.sqz4_compress_payload(p, WIN, lz=True,
                                                parse="fast")) for p in blocks)
    lit = sum(len(native.sqz4_compress_payload(p, WIN, lz=False))
              for p in blocks)
    print(f"real ratios: exact {exact/n*100:.2f}%  fast(d32) "
          f"{fast/n*100:.2f}%  literal-only {lit/n*100:.2f}%  "
          f"({time.perf_counter()-t0:.0f}s)")

    # pricer sanity: exact-parse tokens priced vs real exact payloads
    t0 = time.perf_counter()
    ex_toks = []
    for p in blocks:
        tr = native.tokenize(p, WIN, 2, 254, reject_short_far=True)
        ex_toks.append([("lit", int(a)) if k == 0 else ("match", int(a), int(d))
                        for k, a, d in tr])
    px = price_tokens(ex_toks)
    print(f"pricer sanity: exact tokens -> {px/n*100:.2f}% "
          f"(real {exact/n*100:.2f}%)  ({time.perf_counter()-t0:.0f}s)")

    # H = 2^26 with depth 1 ~= the sort-by-value device structure:
    # collision-free nearest occurrence (no hash table at all)
    base = dict(H=1 << 26, S=256, depth=1, use_g8=True, use_g16=True,
                rle_dists=0, lazy=True)
    configs = [base]
    if args.sweep:
        configs = [
            base,
            dict(base, depth=2),
            dict(base, use_g6=True),
            dict(base, use_g6=True, use_g12=True),
            dict(base, rle_dists=0),
            dict(base, lazy=False),
            # ablation: true-LCP extension (gathers; not device-feasible)
            dict(base, true_ext=True),
        ]
    for cfg in configs:
        t0 = time.perf_counter()
        toks = [device_parse_sim(p, **cfg) for p in blocks]
        t_parse = time.perf_counter() - t0
        for tl, p in zip(toks, blocks):
            verify_tokens(tl, p)
        t0 = time.perf_counter()
        pz = price_tokens(toks)
        nmatch = sum(1 for tl in toks for t in tl if t[0] == "match")
        ntok = max(sum(1 for t in tl if t[0] != "lit") for tl in toks)
        print(f"dev-sim {cfg}: {pz/n*100:.2f}% "
              f"(vs fast {fast/n*100:.2f}%, delta "
              f"{(pz-fast)/n*100:+.2f} pp; {nmatch} matches, "
              f"max tokens/block {ntok}; "
              f"parse {t_parse:.0f}s price {time.perf_counter()-t0:.0f}s)")


if __name__ == "__main__":
    main()
