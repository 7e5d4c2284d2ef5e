"""Differential fuzzing against the live reference implementation.

Random multilingual corpora through both stacks: training outputs and
token streams must match exactly (inputs are filtered to avoid the
reference's documented non-termination pathologies).
"""
import random

import pytest

from subword_tokenizers_tpu import FastBPE, FastWP, NaiveBPE, NaiveWP

from ref_oracle import make_reference, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")

# Alphabet rich enough for interesting merges, plus punctuation and
# multibyte/lowercase-expanding chars.
ALPHA = "aabbccddeeßİłź .,!-"


def _corpus(rng, n_sent=4, max_len=60):
    return ["".join(rng.choice(ALPHA)
                    for _ in range(rng.randrange(8, max_len)))
            for _ in range(rng.randrange(1, n_sent + 1))]


@needs_ref
@pytest.mark.parametrize("seed", range(4))
def test_bpe_pipeline_fuzz(seed):
    rng = random.Random(seed)
    corpus = _corpus(rng)
    mv = rng.randrange(30, 90)
    ref_n = make_reference("NaiveBPE")
    ref_n.train(corpus, mv)
    mine_n = NaiveBPE()
    mine_n.train(corpus, mv)
    assert mine_n.merges_list == ref_n.merges_list
    assert mine_n.vocab == ref_n.vocab

    mine_f = FastBPE()
    mine_f.train(corpus, mv)
    ref_f = make_reference("FastBPE")
    ref_f.train(corpus, mv)
    eval_sents = corpus + _corpus(rng)
    for s in eval_sents:
        assert mine_n.tokenize(s) == ref_n.tokenize(s), s
        assert mine_f.tokenize(s) == ref_f.tokenize(s), s
    assert mine_n.tokenize_batch(eval_sents) == \
        [ref_n.tokenize(s) for s in eval_sents]
    assert mine_f.tokenize_batch(eval_sents) == \
        [ref_f.tokenize(s) for s in eval_sents]


@needs_ref
@pytest.mark.parametrize("seed", range(4))
def test_wp_pipeline_fuzz(seed):
    rng = random.Random(1000 + seed)
    corpus = _corpus(rng)
    mv = rng.randrange(40, 110)
    ref_n = make_reference("NaiveWordPiece")
    ref_n.train(corpus, mv)
    mine_n = NaiveWP()
    mine_n.train(corpus, mv)
    assert mine_n.vocab == ref_n.vocab

    mine_f = FastWP()
    mine_f.train(corpus, mv)
    ref_f = make_reference("FastWordPiece")
    ref_f.train(corpus, mv)
    # Evaluate only on corpus-drawn sentences: out-of-vocab punctuation
    # makes the *reference* hang (see models/wordpiece.py hang guards).
    for s in corpus:
        assert mine_n.tokenize(s) == ref_n.tokenize(s), s
        assert mine_f.tokenize(s) == ref_f.tokenize(s), s
    assert mine_n.tokenize_batch(corpus) == \
        [ref_n.tokenize(s) for s in corpus]
    assert mine_f.tokenize_batch(corpus) == \
        [ref_f.tokenize(s) for s in corpus]


@pytest.mark.parametrize("seed", range(6))
def test_sharded_tiered_select_fuzz(seed):
    """Mesh-vs-single fuzz on tie-heavy random corpora: the tiered
    reduction (certificate + compacted gather + fallback) must reproduce
    single-device training bit-for-bit regardless of which tier settles
    each step. Small repetitive alphabets maximize count/score ties —
    exactly where a wrong Σ-threshold margin would pick a different
    winner."""
    import jax

    from subword_tokenizers_tpu.parallel.mesh import make_data_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    rng = random.Random(4242 + seed)
    corpus = ["".join(rng.choice("ababcdcd  .") for _ in
                      range(rng.randrange(10, 50)))
              for _ in range(rng.randrange(2, 8))]
    mv = rng.randrange(25, 70)
    mesh = make_data_mesh(8)

    single_b = NaiveBPE()
    single_b.train(corpus, mv)
    mesh_b = NaiveBPE(mesh=mesh)
    mesh_b.train(corpus, mv)
    assert mesh_b.merges_list == single_b.merges_list
    assert mesh_b.corpus_as_symbols == single_b.corpus_as_symbols

    single_w = NaiveWP()
    single_w.train(corpus, mv)
    mesh_w = NaiveWP(mesh=mesh)
    mesh_w.train(corpus, mv)
    assert mesh_w.vocab == single_w.vocab
    assert mesh_w.corpus_as_symbols == single_w.corpus_as_symbols


@needs_ref
@pytest.mark.parametrize("seed", range(3))
def test_shrink_path_fuzz(seed, monkeypatch):
    """Force the between-block flat-array shrink on fuzz-sized corpora
    (drop the floor so every block may halve) and diff full training
    against the live reference — covers shrink x narrow x WP-score
    interactions the unit test can't."""
    from subword_tokenizers_tpu.ops import train_loop
    monkeypatch.setattr(train_loop, "_FLAT_MIN", 2)
    rng = random.Random(7000 + seed)
    corpus = _corpus(rng, n_sent=8, max_len=80)
    mv = rng.randrange(60, 140)

    ref_b = make_reference("NaiveBPE")
    ref_b.train(corpus, mv)
    mine_b = NaiveBPE()
    mine_b.train(corpus, mv)
    assert mine_b.merges_list == ref_b.merges_list

    ref_w = make_reference("NaiveWordPiece")
    ref_w.train(corpus, mv)
    mine_w = NaiveWP()
    mine_w.train(corpus, mv)
    assert mine_w.vocab == ref_w.vocab


@needs_ref
@pytest.mark.slow
@pytest.mark.parametrize("seed", range(12))
def test_wp_tournament_train_fuzz_vs_reference(seed):
    """Deep differential fuzz of the tournament selection path
    (ops/wp_tournament.py, the CPU-backend default) against the LIVE
    reference trainer: larger random corpora than the fast-suite fuzz,
    score-tie-heavy by construction (small alphabet, repeated chars),
    forced through the tournament regardless of backend."""
    import os

    rng = random.Random(7000 + seed)
    corpus = ["".join(rng.choice("aabbccdde f.!")
                      for _ in range(rng.randrange(20, 120)))
              for _ in range(rng.randrange(2, 8))]
    mv = rng.randrange(40, 160)
    ref = make_reference("NaiveWordPiece")
    ref.train(corpus, mv)
    old = os.environ.get("SWT_WP_TOURNAMENT")
    os.environ["SWT_WP_TOURNAMENT"] = "1"
    try:
        mine = NaiveWP()
        mine.train(corpus, mv)
    finally:
        if old is None:
            del os.environ["SWT_WP_TOURNAMENT"]
        else:
            os.environ["SWT_WP_TOURNAMENT"] = old
    assert mine.vocab == ref.vocab, (seed, corpus)
