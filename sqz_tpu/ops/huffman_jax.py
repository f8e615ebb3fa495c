"""Batched adaptive Huffman trees on the device (FORMAT.md §1.6).

The reference restructures an explicit pointer tree per symbol
(attic/map_experiment/huffman.h); here the tree lives in flat per-block node
arrays (freq / parent / left / right, shape ``[B, M]``) and every operation
advances all B blocks in lock-step:

* code paths are never stored — ``path_of`` derives (path, nbits) by walking
  parent pointers, and the decoder walks children bit-by-bit — so the
  reference's ``update_paths`` subtree recursions (huffman.h:41-62) vanish;
* the mutually recursive ``frequency_changed`` / ``move_up`` cascade
  (huffman.h:98-147) is CPS-converted into an explicit per-block frame stack
  driven by one ``lax.while_loop`` — each iteration pops one frame per block
  and performs O(1) gathers/scatters, so divergent restructuring across
  blocks costs only max-stack-depth iterations;
* ``insert`` (huffman.h:149-216) is a bounded left-spine descent plus a
  masked splice.

State-identical to the oracle tree (tests compare freq/pix/lix/rix arrays
after every symbol). The reference's freeze conditions (depth >= 63 /
pool exhaustion / freq overflow, huffman.h:222-234) are unreachable for any
realistic block (they need Fibonacci-like frequency growth ~1e13 symbols) and
are not modeled; the oracle keeps them, and differential tests would surface
any divergence.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Tree(NamedTuple):
    freq: jax.Array   # [B, M] uint32
    pix: jax.Array    # [B, M] int32 parent (-1 none)
    lix: jax.Array    # [B, M] int32 left child
    rix: jax.Array    # [B, M] int32 right child
    nxt: jax.Array    # [B] int32 next internal node id (allocated downward)

    @property
    def n(self) -> int:  # terminals
        return (self.freq.shape[1] + 1) // 2

    @property
    def m(self) -> int:  # total nodes; root = m - 1
        return self.freq.shape[1]


def new_tree(nblocks: int, terminals: int) -> Tree:
    m = 2 * terminals - 1
    return Tree(
        freq=jnp.zeros((nblocks, m), jnp.uint32),
        pix=jnp.full((nblocks, m), -1, jnp.int32),
        lix=jnp.full((nblocks, m), -1, jnp.int32),
        rix=jnp.full((nblocks, m), -1, jnp.int32),
        nxt=jnp.full((nblocks,), m - 1, jnp.int32),
    )


def _gat(arr, idx):
    """arr[b, idx[b]] for every block b (idx clamped to be gather-safe)."""
    safe = jnp.clip(idx, 0, arr.shape[1] - 1)
    return jnp.take_along_axis(arr, safe[:, None], axis=1)[:, 0]


def _sca(arr, idx, val, do):
    """arr[b, idx[b]] = val[b] where do[b] (no-op rewrite elsewhere)."""
    safe = jnp.clip(idx, 0, arr.shape[1] - 1)
    cur = jnp.take_along_axis(arr, safe[:, None], axis=1)[:, 0]
    new = jnp.where(do, val.astype(arr.dtype), cur)
    bidx = jnp.arange(arr.shape[0])
    return arr.at[bidx, safe].set(new)


def path_of(tree: Tree, sym: jax.Array, active: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
    """(path, nbits) of terminal ``sym``: bit k of path = branch at depth k
    (0 = left), matching the reference's stored-path convention."""

    def cond(st):
        cur, _, _, live = st
        return jnp.any(live)

    def body(st):
        cur, path, nbits, live = st
        p = _gat(tree.pix, cur)
        live = live & (p != -1)
        from_right = (_gat(tree.rix, p) == cur)
        path = jnp.where(live,
                         (path << np.uint64(1)) | from_right.astype(jnp.uint64),
                         path)
        nbits = nbits + live.astype(jnp.int32)
        cur = jnp.where(live, p, cur)
        return cur, path, nbits, live

    B = sym.shape[0]
    st = (jnp.where(active, sym, tree.m - 1),
          jnp.zeros((B,), jnp.uint64),
          jnp.zeros((B,), jnp.int32),
          active)
    _, path, nbits, _ = jax.lax.while_loop(cond, body, st)
    return path, nbits


def _swap_siblings(tree: Tree, i: jax.Array, active: jax.Array
                   ) -> Tuple[Tree, jax.Array]:
    """huffman.h:64-86: if left sibling outweighs right, swap; returns the
    node now filling i's former role (the sibling) when a swap happened."""
    not_root = i < tree.m - 1
    p = _gat(tree.pix, i)
    can = active & not_root & (p >= 0)
    l = _gat(tree.lix, p)
    r = _gat(tree.rix, p)
    fl = _gat(tree.freq, jnp.maximum(l, 0))
    fr = _gat(tree.freq, jnp.maximum(r, 0))
    do = can & (l >= 0) & (r >= 0) & (fl > fr)
    tree = tree._replace(
        lix=_sca(tree.lix, p, r, do),
        rix=_sca(tree.rix, p, l, do),
    )
    i_out = jnp.where(do, jnp.where(i == l, r, l), i)
    return tree, i_out


def _update_freq(tree: Tree, i: jax.Array, active: jax.Array) -> Tree:
    """freq[i] = freq[left] + freq[right] (absent children count 0)."""
    l = _gat(tree.lix, i)
    r = _gat(tree.rix, i)
    fl = jnp.where(l >= 0, _gat(tree.freq, jnp.maximum(l, 0)), 0)
    fr = jnp.where(r >= 0, _gat(tree.freq, jnp.maximum(r, 0)), 0)
    return tree._replace(freq=_sca(tree.freq, i, fl + fr, active))


# frame kinds on the restructure stack
_FC, _MU = 0, 1
# bound: the trees freeze at depth 63 (huffman.h:222-234, mirrored by the
# oracle), an FC frame pushes at most one MU continuation per ancestor
# level plus its own resume, so live frames never exceed ~2*63 + 2 << 256
STACK_DEPTH = 256


def _run_stack(tree: Tree, seed_i: jax.Array, seed_active: jax.Array) -> Tree:
    """Drive frequency_changed(seed_i) per block to completion.

    The stack holds (kind, a, b) frames. FC(a): ascending step of
    frequency_changed at node a — update parent freq, swap siblings, schedule
    the move-up check (runs after all ancestors, i.e. pushed first), recurse
    to the parent. MU(a=i', b=captured pix): huffman.h:143-146 check, then
    move_up with a nested FC(grandparent) cascade.
    """
    B = seed_i.shape[0]
    bidx = jnp.arange(B)
    stack = jnp.zeros((B, STACK_DEPTH, 3), jnp.int32)
    sp = seed_active.astype(jnp.int32)
    stack = stack.at[:, 0, 0].set(_FC)
    stack = stack.at[:, 0, 1].set(jnp.where(seed_active, seed_i, 0))

    def push(stack, sp, kind, a, b, do):
        slot = jnp.where(do, jnp.minimum(sp, STACK_DEPTH - 1), STACK_DEPTH - 1)
        vals = jnp.stack([jnp.full_like(a, kind), a, b], axis=1)
        cur = stack[bidx, slot]
        stack = stack.at[bidx, slot].set(
            jnp.where(do[:, None], vals, cur))
        return stack, sp + do.astype(sp.dtype)

    def cond(st):
        return jnp.any(st[2] > 0)   # any frames pending on any lane

    def body(st):
        tree, stack, sp = st
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        frame = stack[bidx, top]
        kind, a, b = frame[:, 0], frame[:, 1], frame[:, 2]
        sp = sp - live.astype(sp.dtype)

        # ---- FC(a): one ascending step of frequency_changed
        fc = live & (kind == _FC)
        i = a
        pix = _gat(tree.pix, i)
        is_root = pix == -1
        target = jnp.where(is_root, i, pix)
        tree = _update_freq(tree, target, fc)
        tree, i2 = _swap_siblings(tree, i, fc)
        # LIFO: push MU first so it runs after the parent's FC chain
        stack, sp = push(stack, sp, _MU, i2, pix, fc)
        stack, sp = push(stack, sp, _FC, pix, jnp.zeros_like(pix),
                         fc & ~is_root)

        # ---- MU(a=i, b=captured pix): move-up check (huffman.h:143-146)
        mu = live & (kind == _MU)
        mi, mpix = a, b
        check = (mu & (mpix != -1)
                 & (_gat(tree.pix, jnp.maximum(mpix, 0)) != -1)
                 & (_gat(tree.rix, jnp.maximum(mpix, 0)) == mi))
        # move_up(mi) — huffman.h:98-128 (re-reads the current parent)
        p = _gat(tree.pix, mi)
        g = _gat(tree.pix, jnp.maximum(p, 0))
        p_is_left = p == _gat(tree.lix, jnp.maximum(g, 0))
        u = jnp.where(p_is_left,
                      _gat(tree.rix, jnp.maximum(g, 0)),
                      _gat(tree.lix, jnp.maximum(g, 0)))
        do_move = (check & (_gat(tree.freq, jnp.maximum(mi, 0))
                            > _gat(tree.freq, jnp.maximum(u, 0))))
        # splice: mi takes the uncle's slot under g; uncle becomes p's right
        tree = tree._replace(pix=_sca(tree.pix, mi, g, do_move))
        tree = tree._replace(
            rix=_sca(tree.rix, g, mi, do_move & p_is_left),
            lix=_sca(tree.lix, g, mi, do_move & ~p_is_left))
        tree = tree._replace(rix=_sca(tree.rix, p, u, do_move))
        tree = tree._replace(pix=_sca(tree.pix, u, p, do_move))
        tree = _update_freq(tree, p, do_move)
        tree = _update_freq(tree, g, do_move)
        tree, _ = _swap_siblings(tree, mi, do_move)
        tree, _ = _swap_siblings(tree, u, do_move)
        tree, _ = _swap_siblings(tree, p, do_move)
        stack, sp = push(stack, sp, _FC, g, jnp.zeros_like(g), do_move)

        return tree, stack, sp

    tree, _, _ = jax.lax.while_loop(cond, body, (tree, stack, sp))
    return tree


def insert(tree: Tree, sym: jax.Array, active: jax.Array) -> Tree:
    """First occurrence of terminal ``sym`` (huffman.h:149-216)."""
    n, m = tree.n, tree.m
    tree = tree._replace(freq=_sca(tree.freq, sym, jnp.ones_like(sym), active))

    # descend the left spine to the attach point
    def cond(st):
        ipx, attached, live = st[0], st[1], st[2]
        return jnp.any(live & ~attached & (ipx >= n))

    def body(st):
        ipx, attached, live = st
        walking = live & ~attached & (ipx >= n)
        r = _gat(tree.rix, ipx)
        l = _gat(tree.lix, ipx)
        slot_free = (r == -1) | (l == -1)
        attached = attached | (walking & slot_free)
        ipx = jnp.where(walking & ~slot_free, l, ipx)
        return ipx, attached, live

    ipx0 = jnp.full_like(sym, m - 1)
    ipx, attached, _ = jax.lax.while_loop(
        cond, body, (ipx0, jnp.zeros_like(active), active))

    at_internal = active & attached & (ipx >= n)
    # attach into the free child slot (rix preferred — huffman.h:156-164)
    r = _gat(tree.rix, ipx)
    use_r = at_internal & (r == -1)
    use_l = at_internal & ~use_r
    tree = tree._replace(
        rix=_sca(tree.rix, ipx, sym, use_r),
        lix=_sca(tree.lix, ipx, sym, use_l))
    tree = tree._replace(pix=_sca(tree.pix, sym, ipx, at_internal))
    tree = tree._replace(freq=_sca(
        tree.freq, ipx, _gat(tree.freq, ipx) + 1, at_internal))
    # the cascade seed is the post-swap node (huffman.h:173, 212)
    tree, swapped = _swap_siblings(tree, sym, at_internal)
    seed = jnp.where(at_internal, swapped, sym)

    # spine ended at a leaf: split it with a fresh internal node
    at_leaf = active & (ipx < n)
    nix = jnp.where(at_leaf, tree.nxt - 1, 0)
    tree = tree._replace(nxt=jnp.where(at_leaf, tree.nxt - 1, tree.nxt))
    opix = _gat(tree.pix, ipx)
    # freq[nix] is fully recomputed by _update_freq below (the oracle's
    # pre-copy only feeds its update_paths, which this port does not keep)
    tree = tree._replace(lix=_sca(tree.lix, nix, ipx, at_leaf))
    tree = tree._replace(pix=_sca(tree.pix, nix, opix, at_leaf))
    # re-point the old parent's child edge at the new internal node
    was_left = _gat(tree.lix, jnp.maximum(opix, 0)) == ipx
    relink = at_leaf & (opix != -1)
    tree = tree._replace(
        lix=_sca(tree.lix, opix, nix, relink & was_left),
        rix=_sca(tree.rix, opix, nix, relink & ~was_left))
    tree = tree._replace(pix=_sca(tree.pix, ipx, nix, at_leaf))
    tree = tree._replace(rix=_sca(tree.rix, nix, sym, at_leaf))
    tree = tree._replace(pix=_sca(tree.pix, sym, nix, at_leaf))
    tree = _update_freq(tree, nix, at_leaf)

    return _run_stack(tree, seed, active)


def inc_frequency(tree: Tree, sym: jax.Array, active: jax.Array) -> Tree:
    """Count one more occurrence (huffman.h:218-235): unseen → insert,
    seen → freq += 1 then the frequency_changed cascade."""
    unseen = active & (_gat(tree.pix, sym) == -1)
    seen = active & ~unseen
    tree = tree._replace(
        freq=_sca(tree.freq, sym, _gat(tree.freq, sym) + 1, seen))
    tree = _run_stack(tree, sym, seen)
    return insert(tree, sym, unseen)


# Standalone (non-fused) callers pay a retrace per eager lax.while_loop
# closure; jit once per (B, terminals) shape instead. The squeeze kernels
# call the raw functions from inside their own jitted scans.
insert_jit = jax.jit(insert)
inc_frequency_jit = jax.jit(inc_frequency)
path_of_jit = jax.jit(path_of)
