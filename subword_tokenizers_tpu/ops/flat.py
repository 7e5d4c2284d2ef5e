"""Flat (non-padded) corpus representation for training.

The padded ``[n_words, max_len]`` tensor is mostly PAD (~70% for typical
corpora: mean word length ~6, max ~22+), and the per-step sort pays for
every slot. Here the corpus is a flat concatenation of word symbol
sequences:

- ``fs``  : i32[F] symbol ids, word-major (PAD -1 suffix),
- ``wid`` : i32[F] word index per slot (large sentinel on padding),
- ``wgt`` : weight per slot (the word's frequency).

The flat index *is* the reference's scan order (word-major, then position),
and the global left-compaction after a merge shifts positions exactly like
rebuilding the reference's Python lists — so first-seen tie-break
comparisons are unchanged. Pair validity additionally requires both slots
to belong to the same word.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pairstats import _consts, _run_aggregate, _wdtype

WID_PAD = np.int32(2**30)


def build_flat(sym2d: np.ndarray, freq: np.ndarray, pad_to: int = 1024,
               w32: bool = False
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a padded host tensor into (fs, wid, wgt) with tail padding.

    ``w32`` stores weights as i32 (valid when the total corpus weight is
    < 2^31) — less sort traffic per step and, with wide keys, the only
    layout whose run aggregation compiles on this TPU (see
    ops/pairstats docstring)."""
    mask = sym2d >= 0
    fs = sym2d[mask].astype(np.int32)
    wid = np.nonzero(mask)[0].astype(np.int32)
    wgt = freq[wid].astype(np.int32 if w32 else np.int64)
    n = fs.size
    F = -(-max(n, 2) // pad_to) * pad_to
    pad = F - n
    if pad:
        fs = np.concatenate([fs, np.full(pad, -1, np.int32)])
        wid = np.concatenate([wid, np.full(pad, WID_PAD, np.int32)])
        wgt = np.concatenate([wgt, np.zeros(pad, wgt.dtype)])
    return fs, wid, wgt


def flat_pairs(fs: jax.Array, wid: jax.Array, narrow: bool):
    """Packed pair keys over flat slots; invalid across word boundaries."""
    dt, bits, _, sentinel, _ = _consts(narrow)
    a = fs[:-1].astype(dt)
    b = fs[1:].astype(dt)
    valid = (a >= 0) & (b >= 0) & (wid[:-1] == wid[1:])
    keys = jnp.where(valid, (a << bits) | b, sentinel)
    pos = jnp.arange(fs.shape[0] - 1, dtype=dt)
    return keys, pos


def flat_aggregate(fs, wid, wgt, narrow: bool, w32: bool = False):
    """(k_s, p_s, run_total, is_cand) over flat pairs."""
    keys, pos = flat_pairs(fs, wid, narrow)
    w = wgt[:-1].astype(_wdtype(narrow, w32))
    return _run_aggregate(keys, pos, w, narrow)


def flat_apply(fs, wid, wgt, a, b, new_id):
    """Merge all non-overlapping (a, b) adjacencies and left-compact.

    Same semantics as ops/merge.apply_merge, on the flat layout; the
    compaction is one stable 4-operand sort by liveness. Additionally
    returns ``n_rep`` — the total corpus *weight* of replacements
    performed (each replacement consumes one ``a`` and one ``b`` token and
    produces one ``new_id`` token, so symbol frequencies update exactly as
    ``freq[a] -= n_rep; freq[b] -= n_rep; freq[new_id] += n_rep`` — the
    incremental equivalent of the reference's per-step recount,
    source/wordpiece.py:78-81).
    """
    F = fs.shape[0]
    a = jnp.asarray(a, jnp.int32)
    b = jnp.asarray(b, jnp.int32)
    new_id = jnp.asarray(new_id, jnp.int32)
    neg1 = jnp.full((1,), -1, jnp.int32)
    neg2 = jnp.full((1,), -2, jnp.int32)
    nxt = jnp.concatenate([fs[1:], neg1])
    wnxt = jnp.concatenate([wid[1:], neg2])
    match = (fs == a) & (nxt == b) & (wid == wnxt)

    # Self-overlap parity within same-symbol runs of one word.
    prev = jnp.concatenate([neg2, fs[:-1]])
    wprev = jnp.concatenate([neg2, wid[:-1]])
    change = (fs != prev) | (wid != wprev)
    js = jnp.arange(F, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(change, js, 0))
    parity_ok = ((js - run_start) & 1) == 0
    match = match & jnp.where(a == b, parity_ok, True)

    dead = jnp.concatenate([jnp.zeros((1,), bool), match[:-1]])
    keep = (fs >= 0) & ~dead
    nfs = jnp.where(match, new_id, fs)
    nfs = jnp.where(keep, nfs, jnp.int32(-1))
    nwid = jnp.where(keep, wid, jnp.int32(WID_PAD))
    nwgt = jnp.where(keep, wgt, 0)
    # Left-compact with the payloads IN the sort: a permutation sort +
    # gathers measures ~4x slower on the TPU (corpus-sized random gathers
    # lose to extra sort operands on this hardware).
    livekey = jnp.where(keep, jnp.int32(0), jnp.int32(1))
    _, cfs, cwid, cwgt = jax.lax.sort((livekey, nfs, nwid, nwgt),
                                      num_keys=1, is_stable=True)
    n_rep = jnp.sum(jnp.where(match, wgt, 0))
    return cfs, cwid, cwgt, n_rep
