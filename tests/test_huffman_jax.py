"""Differential test: the batched device Huffman tree must be state-identical
to the scalar oracle tree after every single symbol (SURVEY.md §7.4 —
"differential-test tree state against the oracle after every symbol")."""

import numpy as np
import pytest

from sqz_tpu.oracle.huffman import AdaptiveHuffman
from sqz_tpu.utils import corpus


def _oracle_arrays(t: AdaptiveHuffman):
    return (np.array(t.freq, dtype=np.uint64),
            np.array(t.pix), np.array(t.lix), np.array(t.rix))


def _jax_arrays(tree, b):
    return (np.asarray(tree.freq[b], dtype=np.uint64),
            np.asarray(tree.pix[b]), np.asarray(tree.lix[b]),
            np.asarray(tree.rix[b]))


def _run_differential(seqs, terminals):
    import jax.numpy as jnp
    from sqz_tpu.ops import huffman_jax as hj

    B = len(seqs)
    T = max(len(s) for s in seqs)
    oracles = [AdaptiveHuffman(terminals) for _ in range(B)]
    tree = hj.new_tree(B, terminals)

    for t in range(T):
        syms = np.zeros(B, dtype=np.int32)
        act = np.zeros(B, dtype=bool)
        for b, s in enumerate(seqs):
            if t < len(s):
                syms[b], act[b] = s[t], True
                oracles[b].inc_frequency(int(s[t]))
        tree = hj.inc_frequency_jit(tree, jnp.asarray(syms), jnp.asarray(act))
        for b in range(B):
            if not act[b]:
                continue
            of, op, ol, orr = _oracle_arrays(oracles[b])
            jf, jp, jl, jr = _jax_arrays(tree, b)
            for name, a, c in (("freq", of, jf), ("pix", op, jp),
                               ("lix", ol, jl), ("rix", orr, jr)):
                bad = np.nonzero(a != c)[0]
                assert bad.size == 0, (
                    f"step {t} block {b} {name} diverges at nodes {bad[:8]}: "
                    f"oracle {a[bad[:8]]} vs device {c[bad[:8]]}")


def test_small_alphabet_random():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 8, size=120).tolist() for _ in range(3)]
    _run_differential(seqs, terminals=8)


def test_pos_tree_shape_random():
    rng = np.random.default_rng(1)
    # pos-tree sized alphabet (32 terminals), skewed distribution
    seqs = [np.minimum(rng.geometric(0.3, size=200) - 1, 31).tolist()
            for _ in range(2)]
    _run_differential(seqs, terminals=32)


def test_lit_tree_text():
    data = corpus.texty(400, seed=3)
    seqs = [list(data[:300]), list(data[100:400])]
    _run_differential(seqs, terminals=512)


def test_skewed_run_then_mix():
    # heavy single-symbol runs force move_up cascades
    seq = [1] * 40 + [2] * 30 + [1, 2, 3] * 20 + [4] * 25 + list(range(8)) * 5
    _run_differential([seq], terminals=8)


def test_paths_match_oracle():
    import jax.numpy as jnp
    from sqz_tpu.ops import huffman_jax as hj

    rng = np.random.default_rng(7)
    seq = rng.integers(0, 16, size=300)
    oracle = AdaptiveHuffman(32)
    tree = hj.new_tree(1, 32)
    ones = jnp.ones((1,), bool)
    for s in seq:
        oracle.inc_frequency(int(s))
        tree = hj.inc_frequency_jit(tree, jnp.asarray([int(s)], np.int32), ones)
    for sym in range(16):
        path, nbits = hj.path_of_jit(tree, jnp.asarray([sym], np.int32), ones)
        assert int(nbits[0]) == oracle.bits[sym], f"sym {sym} depth"
        assert int(path[0]) == oracle.path[sym], f"sym {sym} path"
