"""Exact integer bit-math primitives for conformance-critical device code.

The WordPiece trainer must reproduce Python's float semantics for
``score = pair_freq / (freq_a * freq_b)`` (reference: source/wordpiece.py:84-87)
including *which pairs compare equal after rounding to double* — the
tie-break (`max` over dict insertion order, source/wordpiece.py:92) is only
reached on exact double equality, so the selection is wrong unless the
scores are the correctly-rounded IEEE doubles.

This TPU's XLA stack emulates 64-bit floats (X64 rewriting), and its f64
divide is *not* correctly rounded (measured), so we compute the IEEE-754
bit pattern of ``c / d`` directly with exact i64 long division. The bit
pattern of a positive double is monotone in its value, so the result is a
sortable i64 selection key.

Domain (asserted by callers): 1 <= c < 2**33, 1 <= d < 2**53 — covers any
corpus with < ~67M total tokens, which also guarantees Python's own
``c / d`` is the correctly-rounded rational (fa*fb < 2**53 stays exact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bitlen(x: jax.Array) -> jax.Array:
    """floor(log2(x)) + 1 for positive i64 ``x``, elementwise."""
    l = jnp.zeros_like(x)
    v = x
    for sh in (32, 16, 8, 4, 2, 1):
        t = v >> sh
        take = t > 0
        v = jnp.where(take, t, v)
        l = l + jnp.where(take, sh, 0)
    return l + 1


def div_double_bits(c: jax.Array, d: jax.Array) -> jax.Array:
    """IEEE-754 binary64 bit pattern of ``c / d`` as i64, elementwise.

    ``c`` and ``d`` are positive i64 in the documented domain. The result
    equals ``float(c) / float(d)`` as computed by CPython (correctly
    rounded, round-half-to-even), viewed as an i64. Monotone in the value.
    """
    c = c.astype(jnp.int64)
    d = d.astype(jnp.int64)
    e0 = bitlen(c) - bitlen(d)          # c/d in [2^(e0-1), 2^(e0+1))
    s = 55 - e0                          # target: Q = floor(c*2^s/d) in [2^54, 2^56)

    q = c // d
    r = c - q * d
    # Chunked long division: shift the remainder in <=10-bit chunks
    # (r < d < 2^53, so r << 10 cannot overflow i64). s <= 107, so 11
    # chunks always suffice; lanes with smaller s shift by 0 in the tail.
    for j in range(11):
        k = jnp.clip(s - 10 * j, 0, 10)
        r2 = r << k
        qc = r2 // d
        r = r2 - qc * d
        q = (q << k) + qc

    big = q >= (1 << 55)                 # true exponent is e0, not e0-1
    e = e0 - 1 + big.astype(jnp.int64)
    dropped = jnp.where(big, q & 1, 0)
    q2 = q >> big.astype(jnp.int64)      # floor(c * 2^(54-e) / d), 55 bits

    m_floor = q2 >> 2                    # 53-bit mantissa incl. implicit bit
    round_bit = (q2 >> 1) & 1
    sticky = ((q2 & 1) | dropped | (r != 0).astype(jnp.int64)) != 0
    round_up = (round_bit != 0) & (sticky | ((m_floor & 1) != 0))
    m = m_floor + round_up.astype(jnp.int64)

    # Mantissa overflow from rounding: 2^53 -> 2^52 with exponent bump.
    ovf = m == (1 << 53)
    m = jnp.where(ovf, jnp.int64(1) << 52, m)
    e = e + ovf.astype(jnp.int64)

    return ((e + 1023) << 52) | (m & ((jnp.int64(1) << 52) - 1))
