"""Vectorized merge application over the padded symbol tensor.

Replicates the reference's left-to-right non-overlapping pair replacement
(`_replace_pair`, source/bpe.py:25-48 / source/wordpiece.py:105-129) across
every word type at once. The only sequential subtlety in the reference's
scan is self-overlap when ``a == b`` (e.g. merging ("a","a") in "aaa" takes
positions 0-1, not 1-2); that is resolved in closed form with run-position
parity, so the whole update is data-parallel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

PAD = jnp.int32(-1)


@jax.jit
def apply_merge(sym: jax.Array, a: jax.Array, b: jax.Array,
                new_id: jax.Array) -> jax.Array:
    """Replace every non-overlapping (a, b) adjacency with ``new_id``.

    ``sym`` is i32[n, L] padded with -1; matched positions keep scan order
    and rows are left-compacted, exactly like rebuilding the Python symbol
    lists (source/bpe.py:40-47).
    """
    n, L = sym.shape
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    new_id = jnp.asarray(new_id, jnp.int32)

    nxt = jnp.concatenate([sym[:, 1:], jnp.full((n, 1), PAD, jnp.int32)],
                          axis=1)
    match = (sym == a) & (nxt == b)

    # Self-overlap (a == b): within each maximal run of equal symbols the
    # reference merges at even offsets from the run start.
    js = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    prev = jnp.concatenate([jnp.full((n, 1), jnp.int32(-2)), sym[:, :-1]],
                           axis=1)
    change = sym != prev
    run_start = jax.lax.cummax(jnp.where(change, js, 0), axis=1)
    parity_ok = ((js - run_start) & 1) == 0
    match = match & jnp.where(a == b, parity_ok, True)

    # Position j merges (j, j+1): j takes the merged id, j+1 dies.
    dead = jnp.concatenate([jnp.zeros((n, 1), bool), match[:, :-1]], axis=1)
    keep = (sym >= 0) & ~dead
    newsym = jnp.where(match, new_id, sym)
    newsym = jnp.where(keep, newsym, PAD)

    # Left-compact each row: stable sort by "is pad", preserving order.
    sortkey = jnp.where(keep, 0, 1).astype(jnp.int32)
    _, compacted = jax.lax.sort((sortkey, newsym), dimension=1, num_keys=1,
                                is_stable=True)
    return compacted
