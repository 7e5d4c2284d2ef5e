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
