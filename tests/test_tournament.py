"""Tournament WordPiece selection (ops/wp_tournament.py) conformance.

The tournament must be bit-identical to the exact-double selection path
on every input: strict orderings agree by cross-multiplication, exact
rational ties break by position, and any comparison within 2**-50
relative distance raises the sticky ``risky`` flag which redoes the
step through the exact path (wp_select_core's lax.cond).
"""
import json
import os

import numpy as np
import pytest

from subword_tokenizers_tpu.models.wordpiece import NaiveWP


def _train(corpus, vocab, flag):
    old = os.environ.get("SWT_WP_TOURNAMENT")
    os.environ["SWT_WP_TOURNAMENT"] = flag
    try:
        tok = NaiveWP()
        tok.train(corpus, vocab)
        return tok
    finally:
        if old is None:
            del os.environ["SWT_WP_TOURNAMENT"]
        else:
            os.environ["SWT_WP_TOURNAMENT"] = old


def test_train5k_slice_bitexact():
    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)[:400]
    ref = _train(corpus, 420, "0")
    got = _train(corpus, 420, "1")
    assert got.vocab == ref.vocab


def test_pathological_bitexact():
    corpora = [
        ["aaaaaaaaaaaaaaaaaaaaaa", "abababab ababab",
         "aaa aab aba abb baa bab bba bbb", "xy" * 11],
        # heavy exact score ties: every pair count 1, unit freqs
        ["zy xw vu ts rq po nm lk ji hg fe dc ba"],
    ]
    for corpus in corpora:
        ref = _train(corpus, 40, "0")
        got = _train(corpus, 40, "1")
        assert got.vocab == ref.vocab


def test_fuzz_bitexact():
    rng = np.random.default_rng(7)
    letters = "abcdefgh"
    for trial in range(6):
        corpus = [" ".join(
            "".join(rng.choice(list(letters),
                               size=rng.integers(1, 9)))
            for _ in range(rng.integers(3, 30)))
            for _ in range(rng.integers(2, 10))]
        ref = _train(corpus, 64, "0")
        got = _train(corpus, 64, "1")
        assert got.vocab == ref.vocab, corpus


def test_near_tie_sets_risky_and_redo_is_exact():
    """Bezout-constructed scores with relative gap ~2**-51 (c1*d2 and
    c2*d1 differ by exactly d_common): the tournament must flag the
    comparison, and wp_select_core(tournament=True) must still return
    the exact-path result through its redo cond."""
    import jax.numpy as jnp

    from subword_tokenizers_tpu.ops.pairstats import (_consts,
                                                      wp_select_core)
    from subword_tokenizers_tpu.ops.wp_tournament import \
        wp_tournament_select

    narrow = True
    _, bits, space, sentinel, vmax = _consts(narrow)
    q = (1 << 26) - 1
    p = (1 << 26) - 3
    c1 = (1 << 25) - 1                    # c1 * p - c2 * q == 1
    c2 = (c1 * p - 1) // q
    assert c2 * q == c1 * p - 1 and c2 < (1 << 26)
    A = (1 << 20) + 7                     # common fa factor (cancels)

    # symbols: 1 -> A, 2 -> p, 3 -> q (pair1 = (1,3), pair2 = (1,2))
    sym_freq = jnp.asarray(np.array([1, A, p, q, 1], dtype=np.int64))
    k1 = (1 << bits) | 3
    k2 = (1 << bits) | 2
    F = 8
    k_s = np.full(F, int(sentinel), dtype=np.int32)
    p_s = np.full(F, int(vmax), dtype=np.int32)
    rt = np.zeros(F, dtype=np.int32)
    ic = np.zeros(F, dtype=bool)
    k_s[0], p_s[0], rt[0], ic[0] = k1, 5, c1, True   # score c1/(A*q)
    k_s[1], p_s[1], rt[1], ic[1] = k2, 9, c2, True   # score c2/(A*p)
    args = (jnp.asarray(k_s), jnp.asarray(p_s), jnp.asarray(rt),
            jnp.asarray(ic), sym_freq)

    *_, risky = wp_tournament_select(*args, narrow)
    assert bool(risky), "near-tie comparison must set the risky flag"

    exact = wp_select_core(*args, narrow)
    via_tournament = wp_select_core(*args, narrow, tournament=True)
    assert [int(x) for x in exact] == [int(x) for x in via_tournament]


def test_clear_order_not_risky():
    """Well-separated scores: no flag, winner straight from the tree."""
    import jax.numpy as jnp

    from subword_tokenizers_tpu.ops.pairstats import (_consts,
                                                      wp_select_core)
    from subword_tokenizers_tpu.ops.wp_tournament import \
        wp_tournament_select

    narrow = True
    _, bits, space, sentinel, vmax = _consts(narrow)
    sym_freq = jnp.asarray(np.array([1, 10, 20, 30, 1], dtype=np.int64))
    F = 8
    k_s = np.full(F, int(sentinel), dtype=np.int32)
    p_s = np.full(F, int(vmax), dtype=np.int32)
    rt = np.zeros(F, dtype=np.int32)
    ic = np.zeros(F, dtype=bool)
    k_s[0], p_s[0], rt[0], ic[0] = (1 << bits) | 2, 4, 7, True
    k_s[1], p_s[1], rt[1], ic[1] = (2 << bits) | 3, 2, 5, True
    args = (jnp.asarray(k_s), jnp.asarray(p_s), jnp.asarray(rt),
            jnp.asarray(ic), sym_freq)

    bk, bb, bf, bc, risky = wp_tournament_select(*args, narrow)
    assert not bool(risky)
    exact = wp_select_core(*args, narrow)
    assert [int(bk), int(bb), int(bf), int(bc)] == \
        [int(x) for x in exact]


def test_exact_tie_breaks_by_position():
    """Identical rationals on distinct pairs: equal doubles, winner must
    be the earlier position (insertion order), with no risky flag."""
    import jax.numpy as jnp

    from subword_tokenizers_tpu.ops.pairstats import (_consts,
                                                      wp_select_core)
    from subword_tokenizers_tpu.ops.wp_tournament import \
        wp_tournament_select

    narrow = True
    _, bits, space, sentinel, vmax = _consts(narrow)
    # both pairs score 6/(12*18) == 6/(18*12)
    sym_freq = jnp.asarray(np.array([1, 12, 18, 18, 12], dtype=np.int64))
    F = 8
    k_s = np.full(F, int(sentinel), dtype=np.int32)
    p_s = np.full(F, int(vmax), dtype=np.int32)
    rt = np.zeros(F, dtype=np.int32)
    ic = np.zeros(F, dtype=bool)
    k_s[0], p_s[0], rt[0], ic[0] = (1 << bits) | 2, 11, 6, True
    k_s[1], p_s[1], rt[1], ic[1] = (3 << bits) | 4, 3, 6, True
    args = (jnp.asarray(k_s), jnp.asarray(p_s), jnp.asarray(rt),
            jnp.asarray(ic), sym_freq)

    bk, bb, bf, bc, risky = wp_tournament_select(*args, narrow)
    assert not bool(risky)
    assert int(bf) == 3 and int(bk) == (3 << bits) | 4
    exact = wp_select_core(*args, narrow)
    assert [int(bk), int(bb), int(bf), int(bc)] == \
        [int(x) for x in exact]
