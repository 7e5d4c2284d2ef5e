"""Tournament WordPiece selection: exact argmax without compaction.

The per-step cost that keeps WordPiece training above BPE is candidate
*compaction* — a full-width sort whose only job is to move ≤cap run
starts to the front so the exact-double long division prices candidates
instead of positions (ops/pairstats.compact_cands). This module removes
both the compaction sort and the bulk scoring: the winner is found by a
halving tournament over the full-width aggregated runs, comparing scores
``c1/(fa1*fb1)`` vs ``c2/(fa2*fb2)`` by exact 128-bit cross
multiplication (``c1*d2`` vs ``c2*d1`` via :func:`~.bitmath.mul_53x53`),
so no division ever runs in the tree and the only expensive op class
used is elementwise VPU arithmetic on contiguous halves.

Conformance (reference: source/wordpiece.py:84-92 — max over *Python
float* scores, dict-insertion-order tie-break):

- rational order and double order agree whenever two scores differ by
  more than one double-ulp relatively; two distinct positive rationals
  can only round to the same double when their relative gap is
  <= 2**-52;
- exactly equal rationals are exactly equal doubles — the comparator
  tie-breaks them by minimum scan position, which is the insertion
  order (positions are unique per run, so the tournament result is
  deterministic and associative);
- any comparison with ``0 < (u - v)/max(u, v) <= 2**-50`` (a superset
  of all possible distinct-rational double ties, with 4x margin) sets a
  sticky ``risky`` flag; the caller must then redo the step with the
  exact-double path (``lax.cond`` — cost only, never correctness). The
  flag is conservative: a flagged comparison anywhere forces the exact
  path even though only ties on the winner's path could matter.

Domain: the narrow score regime (total corpus occurrences < 2**26, so
``c < 2**26`` and ``d = fa*fb < 2**52`` — both under the 2**53 limb
bound of mul_53x53). Callers must keep ``wide_score`` corpora on the
compaction path.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .bitmath import div_double_bits, mul_53x53


def _cmp128(a_hi, a_lo, b_hi, b_lo):
    """(greater, equal) for base-2**53 limb pairs."""
    eq_hi = a_hi == b_hi
    greater = (a_hi > b_hi) | (eq_hi & (a_lo > b_lo))
    equal = eq_hi & (a_lo == b_lo)
    return greater, equal


def _sub128(a_hi, a_lo, b_hi, b_lo):
    """a - b for limb pairs, assuming a >= b."""
    lo = a_lo - b_lo
    borrow = (lo < 0).astype(jnp.int64)
    lo = lo + (borrow << 53)
    return a_hi - b_hi - borrow, lo


def _combine(x, y):
    """One tournament round: elementwise winner of paired candidates.

    ``x``/``y`` are (c, d, pos, key, risky) tuples; all comparisons are
    exact integer arithmetic (see module docstring)."""
    cx, dx, px, kx, fx = x
    cy, dy, py, ky, fy = y
    u_hi, u_lo = mul_53x53(cx, dy)          # score_x  ~ u / (dx*dy)
    v_hi, v_lo = mul_53x53(cy, dx)          # score_y  ~ v / (dx*dy)
    greater, equal = _cmp128(u_hi, u_lo, v_hi, v_lo)

    # Near-tie flag: 0 < |u - v| <= max(u, v) >> 50  (relative gap
    # <= 2**-50 — covers every possible distinct-rational double tie).
    m_hi = jnp.where(greater, u_hi, v_hi)
    m_lo = jnp.where(greater, u_lo, v_lo)
    s_hi = jnp.where(greater, v_hi, u_hi)
    s_lo = jnp.where(greater, v_lo, u_lo)
    d_hi, d_lo = _sub128(m_hi, m_lo, s_hi, s_lo)
    t_hi = m_hi >> 50
    t_lo = ((m_hi & ((1 << 50) - 1)) << 3) | (m_lo >> 50)
    d_le_t, d_eq_t = _cmp128(t_hi, t_lo, d_hi, d_lo)
    near = (d_le_t | d_eq_t) & ~equal

    take_x = greater | (equal & (px <= py))
    return (jnp.where(take_x, cx, cy),
            jnp.where(take_x, dx, dy),
            jnp.where(take_x, px, py),
            jnp.where(take_x, kx, ky),
            fx | fy | near)


def wp_tournament_select(k_s, p_s, run_total, is_cand, sym_freq,
                         narrow: bool) -> Tuple:
    """Winner over aggregated runs by cross-multiplied exact comparison.

    Same inputs as :func:`~.pairstats.wp_select_core`'s full path.
    Returns (best_key, best_bits, best_fs, best_count, risky); when
    ``risky`` is True the result may mis-order a double tie and the
    caller MUST redo the selection with the exact-double path.
    """
    from .pairstats import _consts

    _, bits, space, sentinel, vmax = _consts(narrow)
    a = jnp.where(is_cand, (k_s >> bits) & (space - 1), 0).astype(jnp.int32)
    b = jnp.where(is_cand, k_s & (space - 1), 0).astype(jnp.int32)
    fa = jnp.maximum(sym_freq[a].astype(jnp.int64), 1)
    fb = jnp.maximum(sym_freq[b].astype(jnp.int64), 1)
    c = jnp.where(is_cand, run_total, 0).astype(jnp.int64)
    d = jnp.where(is_cand, fa * fb, 1)
    pos = jnp.where(is_cand, p_s, jnp.asarray(vmax, p_s.dtype))
    key = jnp.where(is_cand, k_s, sentinel)
    risky = jnp.zeros(k_s.shape, dtype=bool)

    F = k_s.shape[0]
    n = 1
    while n < F:
        n *= 2
    if n != F:  # pad to a power of two with neutral (c=0) lanes
        pad = n - F
        c = jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
        d = jnp.concatenate([d, jnp.ones(pad, d.dtype)])
        pos = jnp.concatenate(
            [pos, jnp.full(pad, jnp.asarray(vmax, pos.dtype))])
        key = jnp.concatenate(
            [key, jnp.full(pad, jnp.asarray(sentinel, key.dtype))])
        risky = jnp.concatenate([risky, jnp.zeros(pad, bool)])

    state = (c, d, pos, key, risky)
    while n > 1:
        h = n // 2
        x = tuple(v[:h] for v in state)
        y = tuple(v[h:n] for v in state)
        state = _combine(x, y)
        n = h

    bc, bd, bf, bk, brisk = (v[0] for v in state)
    bb = div_double_bits(jnp.maximum(bc, 1), bd)
    # Count in the caller's weight dtype (the exact path returns
    # run_total's dtype; lax.cond branches must match).
    return bk, bb, bf, bc.astype(run_total.dtype), brisk
