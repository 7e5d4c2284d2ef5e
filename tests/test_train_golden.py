"""Training conformance against reference-generated golden fixtures
(tests/golden/*, produced by running /root/reference once — see
tests/ref_oracle.py). Covers BASELINE config[0]-style runs."""
import json

import pytest

from subword_tokenizers_tpu import NaiveBPE, NaiveWP


def test_bpe_sub200_v600(train_5k):
    tok = NaiveBPE()
    tok.train(train_5k[:200], max_vocab=600)
    with open("tests/golden/sub200_v600_merges.json") as f:
        golden = [tuple(p) for p in json.load(f)]
    assert tok.merges_list == golden


def test_wp_sub200_v600(train_5k):
    tok = NaiveWP()
    tok.train(train_5k[:200], max_vocab=600)
    with open("tests/golden/sub200_v600_wp_vocab.json") as f:
        golden = set(json.load(f))
    assert tok.vocab == golden


@pytest.mark.slow
def test_bpe_train5k_v1000(train_5k):
    """BASELINE config[0]: NaiveBPE on train-5K at max_vocab=1000."""
    tok = NaiveBPE()
    tok.train(train_5k, max_vocab=1000)
    with open("tests/golden/train5k_v1000_merges.json") as f:
        golden = [tuple(p) for p in json.load(f)]
    assert tok.merges_list == golden


@pytest.mark.slow
def test_wp_train5k_v1000(train_5k):
    tok = NaiveWP()
    tok.train(train_5k, max_vocab=1000)
    with open("tests/golden/train5k_v1000_wp_vocab.json") as f:
        golden = set(json.load(f))
    assert tok.vocab == golden
