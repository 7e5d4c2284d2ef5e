"""Sharded (data-parallel) training steps via shard_map.

Word types shard across the ``data`` mesh axis; the per-step reduction
combines every shard's pair statistics into one global, *deterministic*
selection — identical to the single-device result bit-for-bit, because:

- pair counts are integers combined by summation (order-invariant),
- the tie-break key is the global scan position (min-reduced), computed
  from the shard's offset via ``axis_index`` — never from local order,
- WordPiece scores are exact IEEE-double bit patterns (ops/bitmath.py),
  so replicated selection is identical on every shard.

Round-1 reduction strategy: each shard packs its local (key, global_pos,
weight) triples and ``all_gather``s them; selection then runs replicated on
the concatenated array (the same code path as single-device). This is
exact and simple; the bandwidth-lean two-phase top-K scheme (local top-K +
candidate count lookup + Σ-threshold verification) is the planned
optimization and slots in behind the same interface.

The merge *application* is embarrassingly row-parallel and runs entirely
shard-local.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import bitmath
from ..ops.merge import apply_merge
from ..ops.pairstats import (KEY_SENTINEL, SYM_BITS, SYM_SPACE,
                             _run_aggregate, _select)
from .mesh import DATA_AXIS


def _local_pairs(sym, freq):
    """Local (keys, global_pos, weights) with shard-offset positions."""
    n, L = sym.shape
    a = sym[:, :-1].astype(jnp.int64)
    b = sym[:, 1:].astype(jnp.int64)
    valid = (a >= 0) & (b >= 0)
    keys = jnp.where(valid, (a << SYM_BITS) | b, KEY_SENTINEL).reshape(-1)
    shard = jax.lax.axis_index(DATA_AXIS).astype(jnp.int64)
    pos = jnp.arange(n * (L - 1), dtype=jnp.int64) + shard * (n * (L - 1))
    w = jnp.broadcast_to(freq[:, None], (n, L - 1)).reshape(-1)
    return keys, pos, w


@partial(jax.jit, static_argnames=("mesh",))
def sharded_bpe_select(mesh, sym, freq):
    """Global BPE pair selection over a row-sharded corpus.

    Returns replicated (best_key, best_count, best_first_seen)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=(P(), P(), P()), check_vma=False)
    def step(sym_l, freq_l):
        keys, pos, w = _local_pairs(sym_l, freq_l)
        keys_g = jax.lax.all_gather(keys, DATA_AXIS, tiled=True)
        pos_g = jax.lax.all_gather(pos, DATA_AXIS, tiled=True)
        w_g = jax.lax.all_gather(w, DATA_AXIS, tiled=True)
        k_s, p_s, run_total, is_cand = _run_aggregate(keys_g, pos_g, w_g,
                                                      False)
        return _select(k_s, p_s, run_total, is_cand)

    return step(sym, freq)


@partial(jax.jit, static_argnames=("mesh", "sym_cap"))
def sharded_wp_select(mesh, sym, freq, sym_cap):
    """Global WordPiece score selection over a row-sharded corpus.

    Symbol frequencies are psum-combined; scores are exact double bits.
    Returns replicated (best_key, best_bits, best_first_seen, best_count)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=(P(), P(), P(), P()), check_vma=False)
    def step(sym_l, freq_l):
        n, L = sym_l.shape
        keys, pos, w = _local_pairs(sym_l, freq_l)
        # Global per-symbol frequencies: local histogram + psum.
        flat = sym_l.reshape(-1)
        wsym = jnp.broadcast_to(freq_l[:, None], (n, L)).reshape(-1)
        seg = jnp.where(flat >= 0, flat, sym_cap).astype(jnp.int32)
        local_hist = jax.ops.segment_sum(
            jnp.where(flat >= 0, wsym, 0), seg, num_segments=sym_cap + 1)
        sym_freq = jax.lax.psum(local_hist, DATA_AXIS)

        keys_g = jax.lax.all_gather(keys, DATA_AXIS, tiled=True)
        pos_g = jax.lax.all_gather(pos, DATA_AXIS, tiled=True)
        w_g = jax.lax.all_gather(w, DATA_AXIS, tiled=True)
        k_s, p_s, run_total, is_cand = _run_aggregate(keys_g, pos_g, w_g,
                                                      False)

        a = jnp.where(is_cand, (k_s >> SYM_BITS) & (SYM_SPACE - 1),
                      0).astype(jnp.int32)
        b = jnp.where(is_cand, k_s & (SYM_SPACE - 1), 0).astype(jnp.int32)
        denom = sym_freq[a] * sym_freq[b]
        score_bits = bitmath.div_double_bits(jnp.maximum(run_total, 1),
                                             jnp.maximum(denom, 1))
        best_key, best_bits, best_fs = _select(k_s, p_s, score_bits, is_cand)
        count_at = jnp.max(jnp.where((k_s == best_key) & is_cand, run_total,
                                     jnp.int64(-1)))
        return best_key, best_bits, best_fs, count_at

    return step(sym, freq)


@partial(jax.jit, static_argnames=("mesh",))
def sharded_apply_merge(mesh, sym, a, b, new_id):
    """Row-local merge application on every shard."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(), P(), P()),
             out_specs=P(DATA_AXIS), check_vma=False)
    def step(sym_l, a_, b_, n_):
        return apply_merge(sym_l, a_, b_, n_)

    return step(sym, jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32),
                jnp.asarray(new_id, jnp.int32))


def shard_corpus(mesh, sym, freq):
    """Pad rows to a multiple of the mesh size and device_put with
    row sharding. Padding rows are all-PAD with zero frequency — they
    contribute no pairs and no counts."""
    import numpy as np
    n_dev = mesh.devices.size
    n, L = sym.shape
    pad = (-n) % n_dev
    if pad:
        sym = np.concatenate(
            [sym, np.full((pad, L), -1, dtype=sym.dtype)], axis=0)
        freq = np.concatenate(
            [freq, np.zeros(pad, dtype=freq.dtype)], axis=0)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return (jax.device_put(jnp.asarray(sym), sharding),
            jax.device_put(jnp.asarray(freq), sharding))
