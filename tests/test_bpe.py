"""BPE conformance: training fixtures, encoder parity with the live
reference, and the golden token streams."""
import json
import os
import random

import pytest

from subword_tokenizers_tpu import FastBPE, NaiveBPE

from ref_oracle import make_reference, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")

TUTORIAL = ["This is a sentence.", "Another example sentence."]


def test_tutorial_fixture_merges():
    tok = NaiveBPE()
    tok.train(TUTORIAL, max_vocab=25)
    with open("/root/reference/resources/tests/NaiveBPE/merges.json") as f:
        golden = [tuple(p) for p in json.load(f)]
    assert tok.merges_list == golden


def test_fast_tutorial_fixture_merges():
    tok = FastBPE()
    tok.train(TUTORIAL, max_vocab=25)
    with open("/root/reference/resources/tests/FastBPE/merges.json") as f:
        golden = [tuple(p) for p in json.load(f)]
    assert tok.merges_list == golden


@needs_ref
def test_train_fuzz_vs_reference():
    rng = random.Random(7)
    alphabet = "aabbbccß!. "
    for _ in range(5):
        corpus = ["".join(rng.choice(alphabet)
                          for _ in range(rng.randrange(5, 40)))
                  for _ in range(rng.randrange(1, 6))]
        mv = rng.randrange(5, 30)
        ref = make_reference("NaiveBPE")
        ref.train(corpus, mv)
        mine = NaiveBPE()
        mine.train(corpus, mv)
        assert mine.merges_list == ref.merges_list, corpus


@needs_ref
def test_encode_parity_vs_reference():
    corpus = ["aaa aab abab banana bandana!", "ab ab ab cd cd c d aaaa"]
    for cls, name in [(NaiveBPE, "NaiveBPE"), (FastBPE, "FastBPE")]:
        ref = make_reference(name)
        ref.train(corpus, 40)
        mine = cls()
        mine.train(corpus, 40)
        assert mine.merges_list == ref.merges_list
        for w in ["banana", "aaaa", "unknownq", "", "a", "bandana!"]:
            assert mine.encode_word(w) == ref.encode_word(w), w
        for s in corpus + ["a banana sentence", "!!"]:
            assert mine.tokenize(s) == ref.tokenize(s), s


def test_golden_corpus_both_models(pan_tadeusz, pan_tadeusz_golden):
    for cls, name in [(FastBPE, "FastBPE"), (NaiveBPE, "NaiveBPE")]:
        tok = cls()
        tok.load_resources(f"/root/reference/resources/pretrained/{name}")
        out = tok.tokenize_batch(pan_tadeusz)
        assert out == pan_tadeusz_golden[name]
        # host path spot checks
        for i in (0, 123, 988):
            assert tok.tokenize(pan_tadeusz[i]) == pan_tadeusz_golden[name][i]


def test_resources_roundtrip(tmp_path):
    tok = NaiveBPE()
    tok.train(TUTORIAL, max_vocab=25)
    tok.save_resources(str(tmp_path))
    reloaded = FastBPE()
    reloaded.load_resources(str(tmp_path))
    assert reloaded.merges_list == tok.merges_list
    # byte-compatible with the reference writer
    with open(tmp_path / "merges.json", encoding="utf-8") as f:
        assert json.load(f) == [list(p) for p in tok.merges_list]


def test_load_missing_is_noop(tmp_path):
    tok = NaiveBPE()
    tok.merges_list = [("a", "b")]
    tok.load_resources(str(tmp_path / "nope"))
    assert tok.merges_list == [("a", "b")]


def test_type_validation():
    tok = NaiveBPE()
    with pytest.raises(TypeError):
        tok.train("not a list", 10)
    with pytest.raises(TypeError):
        tok.train([1, 2], 10)
    with pytest.raises(TypeError):
        tok.train([], "10")
    with pytest.raises(TypeError):
        tok.tokenize(42)


def test_train_counts_and_vocab(train_5k):
    """BASELINE config[0] shape check: base chars and merge count on
    train-5K at max_vocab=1000 (926 merges from 78 base chars would be
    922+78=1000)."""
    tok = NaiveBPE()
    tok.train(train_5k[:300], max_vocab=400)
    assert len(tok.vocab) == 400
    assert len(tok.merges_list) >= 400 - 120
