"""Batched BPE encoding on device.

Two encoder semantics, both as one jitted while-loop over a padded
word-type tensor (every word of a corpus encodes simultaneously):

- **greedy** (FastBPE, reference: source/bpe.py:205-243): repeatedly merge
  the present pair with the lowest rank, ranks from a dict built over the
  merge list (later duplicates overwrite earlier ones).
- **monotone** (NaiveBPE, reference: source/bpe.py:124-127): the reference
  applies *every* merge once, in order. That is equivalent to repeatedly
  applying the lowest-ranked present pair whose rank is >= a per-word
  cursor that moves past each applied rank (a merged pair cannot re-form
  at the same rank: its output strictly grows). This turns the reference's
  O(#merges × len) scan into O(len) iterations — with identical output.

Rank lookup is a binary search (searchsorted) into the sorted packed pair
keys; everything stays in integer registers, so the loop is dense VPU work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pairstats import SYM_BITS

I32_INF = jnp.int32(2**31 - 1)
PAD = jnp.int32(-1)


def _pack(sym: jax.Array):
    n, L = sym.shape
    a = sym[:, :-1].astype(jnp.int64)
    b = sym[:, 1:].astype(jnp.int64)
    valid = (a >= 0) & (b >= 0)
    keys = jnp.where(valid, (a << SYM_BITS) | b, jnp.int64(-1))
    return keys, valid


def _apply_rows(sym, a_row, b_row, new_row):
    """apply_merge with a distinct (a, b, new_id) per row."""
    n, L = sym.shape
    a = a_row[:, None]
    b = b_row[:, None]
    nxt = jnp.concatenate([sym[:, 1:], jnp.full((n, 1), PAD, jnp.int32)],
                          axis=1)
    match = (sym == a) & (nxt == b)
    js = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    prev = jnp.concatenate([jnp.full((n, 1), jnp.int32(-2)), sym[:, :-1]],
                           axis=1)
    change = sym != prev
    run_start = jax.lax.cummax(jnp.where(change, js, 0), axis=1)
    parity_ok = ((js - run_start) & 1) == 0
    match = match & jnp.where(a == b, parity_ok, True)
    dead = jnp.concatenate([jnp.zeros((n, 1), bool), match[:, :-1]], axis=1)
    keep = (sym >= 0) & ~dead
    newsym = jnp.where(match, new_row[:, None], sym)
    newsym = jnp.where(keep, newsym, PAD)
    sortkey = jnp.where(keep, 0, 1).astype(jnp.int32)
    _, compacted = jax.lax.sort((sortkey, newsym), dimension=1, num_keys=1,
                                is_stable=True)
    return compacted


@partial(jax.jit, static_argnames=("monotone",))
def bpe_encode(sym: jax.Array, merge_keys: jax.Array, merge_ranks: jax.Array,
               merge_out: jax.Array, monotone: bool) -> jax.Array:
    """Encode every row of ``sym`` (i32[W, L] char ids, PAD-filled).

    merge_keys: i64[M] sorted packed pair keys; merge_ranks: i32[M] rank per
    key (greedy: dict rank; monotone: first-occurrence rank); merge_out:
    i32[M] merged symbol id per key. Returns the merged i32[W, L] tensor.
    """
    W, L = sym.shape
    M = merge_keys.shape[0]
    if W == 0 or L < 2 or M == 0:
        return sym

    def body(state):
        cur_sym, cursor, _ = state
        keys, valid = _pack(cur_sym)
        idx = jnp.searchsorted(merge_keys, keys)
        idxc = jnp.minimum(idx, M - 1).astype(jnp.int32)
        found = (merge_keys[idxc] == keys) & valid
        rank = jnp.where(found, merge_ranks[idxc], I32_INF)
        if monotone:
            rank = jnp.where(rank >= cursor[:, None], rank, I32_INF)
        best = jnp.min(rank, axis=1)
        bi = jnp.argmin(rank, axis=1)
        active = best < I32_INF

        rows = jnp.arange(W)
        sel_key = keys[rows, bi]
        sel_idx = idxc[rows, bi]
        a = jnp.where(active, (sel_key >> SYM_BITS).astype(jnp.int32),
                      jnp.int32(-3))
        b = jnp.where(active, (sel_key & ((1 << SYM_BITS) - 1))
                      .astype(jnp.int32), jnp.int32(-3))
        out = merge_out[sel_idx]
        new_sym = _apply_rows(cur_sym, a, b, out)
        new_cursor = jnp.where(active, best + 1, cursor) if monotone \
            else cursor
        return new_sym, new_cursor, jnp.any(active)

    def cond(state):
        return state[2]

    cursor0 = jnp.zeros((W,), dtype=jnp.int32)
    final_sym, _, _ = jax.lax.while_loop(cond, body,
                                         (sym, cursor0, jnp.bool_(True)))
    return final_sym
