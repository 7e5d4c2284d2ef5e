"""Exact IEEE-double emulation: div_double_bits must equal numpy float64
division bit-for-bit across the documented domain; the 128-bit-denominator
divider must equal CPython's arbitrary-precision int/int division."""
import struct

import jax
import jax.numpy as jnp
import numpy as np

from subword_tokenizers_tpu.ops.bitmath import (bitlen, bitlen128,
                                                div_double_bits,
                                                div_double_bits_wide,
                                                mul_53x53)


def _ref_bits(c, d):
    return (c.astype(np.float64) / d.astype(np.float64)).view(np.int64)


def test_random_domain():
    rng = np.random.default_rng(3)
    c = rng.integers(1, 1 << 33, size=100000)
    d = rng.integers(1, 1 << 26, size=100000) * rng.integers(
        1, 1 << 26, size=100000)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    assert np.array_equal(bits, _ref_bits(c, d))


def test_edges():
    c = np.array([1, 1, 1, 2, 3, (1 << 33) - 1, (1 << 33) - 1, 5, 10,
                  1 << 32, 999999937, 3], dtype=np.int64)
    d = np.array([1, 3, 1 << 52, 1 << 52, (1 << 53) - 1, 1, 3, 7, 3,
                  (1 << 53) - 1, 999999937 * 2, 6], dtype=np.int64)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    assert np.array_equal(bits, _ref_bits(c, d))


def test_dense_small():
    c = np.repeat(np.arange(1, 500, dtype=np.int64), 50)
    d = np.tile(np.arange(1, 51, dtype=np.int64), 499)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    assert np.array_equal(bits, _ref_bits(c, d))


def test_monotone_keys():
    # Bit patterns of positive doubles sort like the values.
    rng = np.random.default_rng(5)
    c = rng.integers(1, 1 << 20, size=1000)
    d = rng.integers(1, 1 << 40, size=1000)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    vals = c.astype(np.float64) / d.astype(np.float64)
    order_bits = np.argsort(bits, kind="stable")
    order_vals = np.argsort(vals[order_bits], kind="stable")
    assert np.array_equal(order_vals, np.arange(len(vals)))


def test_exact_midpoints_round_half_even():
    """c/d landing exactly between two doubles must round to even."""
    cases = []
    # d = 2^j, c = (2m+1) * 2^t: quotient mantissa has exactly 54
    # significant bits ending in 1 -> a rounding midpoint.
    for m_bits in (52,):
        for j in (10, 20, 40):
            m = (1 << 53) + 1  # 54-bit odd
            # c/d = m / 2^j -> exponent chosen so mantissa needs 54 bits
            c = m
            d = 1 << j
            if c < (1 << 33) * 2:  # domain check (c < 2^33 not met: scale)
                pass
            cases.append((m >> 21, d))  # keep c in domain, still odd-ish
    c = np.array([x for x, _ in cases] + [3, 5, (1 << 33) - 1],
                 dtype=np.int64)
    d = np.array([x for _, x in cases] + [1 << 52, 1 << 52, 1 << 34],
                 dtype=np.int64)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    assert np.array_equal(bits, _ref_bits(c, d))


def test_random_power_of_two_denominators():
    """Powers of two make the remainder-sticky logic degenerate; the
    rounding decision comes purely from the guard bit."""
    rng = np.random.default_rng(9)
    c = rng.integers(1, 1 << 33, size=50000)
    d = np.int64(1) << rng.integers(0, 53, size=50000)
    bits = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                               jnp.asarray(d)))
    assert np.array_equal(bits, _ref_bits(c, d))


def test_bitlen():
    x = np.array([1, 2, 3, 4, 255, 256, (1 << 52) + 1, (1 << 62)],
                 dtype=np.int64)
    got = np.asarray(jax.jit(bitlen)(jnp.asarray(x)))
    expect = np.array([int(v).bit_length() for v in x])
    assert np.array_equal(got, expect)


# ------------------------- 128-bit denominator (wide-corpus score domain)

def _wide_expect(cs, ds):
    """CPython's correctly-rounded int/int division, as i64 bit patterns."""
    return np.array([struct.unpack("<q", struct.pack("<d", c / d))[0]
                     for c, d in zip(cs, ds)], dtype=np.int64)


def _run_wide(cs, ds):
    dhi = np.array([d >> 53 for d in ds], dtype=np.int64)
    dlo = np.array([d & ((1 << 53) - 1) for d in ds], dtype=np.int64)
    return np.asarray(jax.jit(div_double_bits_wide)(
        jnp.asarray(np.array(cs, dtype=np.int64)), jnp.asarray(dhi),
        jnp.asarray(dlo)))


def test_mul_53x53_exact():
    rng = np.random.default_rng(11)
    a = rng.integers(1, 1 << 52, size=20000)
    b = rng.integers(1, 1 << 52, size=20000)
    hi, lo = jax.jit(mul_53x53)(jnp.asarray(a), jnp.asarray(b))
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i in range(0, 20000, 97):
        assert (int(hi[i]) << 53) + int(lo[i]) == int(a[i]) * int(b[i])
    # full vectorized check via object ints
    assert all((int(h) << 53) + int(l) == int(x) * int(y)
               for h, l, x, y in zip(hi, lo, a, b))


def test_bitlen128():
    vals = [1, 2, (1 << 53) - 1, 1 << 53, (1 << 53) + 1, 1 << 100,
            (1 << 105) + 12345]
    hi = np.array([v >> 53 for v in vals], dtype=np.int64)
    lo = np.array([v & ((1 << 53) - 1) for v in vals], dtype=np.int64)
    got = np.asarray(jax.jit(bitlen128)(jnp.asarray(hi), jnp.asarray(lo)))
    assert np.array_equal(got, [v.bit_length() for v in vals])


def test_wide_random_vs_cpython():
    rng = np.random.default_rng(17)
    cs, ds = [], []
    for _ in range(50000):
        fa = int(rng.integers(1, 1 << int(rng.integers(1, 53))))
        fb = int(rng.integers(1, 1 << int(rng.integers(1, 53))))
        cs.append(int(rng.integers(1, min(fa, fb) + 1)))
        ds.append(fa * fb)
    assert np.array_equal(_run_wide(cs, ds), _wide_expect(cs, ds))


def test_wide_boundary_and_adversarial():
    cs, ds = [], []
    # across the old 2**53 denominator boundary
    for d in [(1 << 53) - 1, 1 << 53, (1 << 53) + 1, (1 << 54) - 1,
              (1 << 106) - 1, ((1 << 52) - 1) ** 2]:
        for c in [1, 2, 3, (1 << 52) - 1]:
            cs.append(min(c, d))
            ds.append(d)
    # power-of-two denominators (sticky degenerates to the guard bit)
    for k in range(1, 106):
        for c in (1, 3, (1 << min(k, 52)) - 1 or 1):
            cs.append(min(c, 1 << k))
            ds.append(1 << k)
    # exact-tie midpoints around d = c * 2^k
    for k in range(2, 54):
        for c in (3, 5, 101, (1 << 40) + 1):
            for delta in (-1, 0, 1):
                cs.append(c)
                ds.append(c * (1 << k) + delta)
    # c == d exactly -> 1.0
    for d in (1, 7, (1 << 52) - 3):
        cs.append(d)
        ds.append(d)
    assert np.array_equal(_run_wide(cs, ds), _wide_expect(cs, ds))


def test_wide_agrees_with_narrow_in_shared_domain():
    rng = np.random.default_rng(23)
    c = rng.integers(1, 1 << 26, size=20000)
    d = rng.integers(1, 1 << 26, size=20000) * rng.integers(
        1, 1 << 26, size=20000)
    c = np.minimum(c, d)
    narrow = np.asarray(jax.jit(div_double_bits)(jnp.asarray(c),
                                                 jnp.asarray(d)))
    wide = _run_wide([int(x) for x in c], [int(x) for x in d])
    assert np.array_equal(narrow, wide)
