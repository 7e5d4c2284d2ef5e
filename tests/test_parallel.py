"""Sharded training must be bit-identical to single-device training.

Runs on 8 fake CPU devices (conftest sets
--xla_force_host_platform_device_count=8), the same harness the driver's
``dryrun_multichip`` uses.
"""
import jax
import pytest

from subword_tokenizers_tpu import FastBPE, NaiveBPE, NaiveWP
from subword_tokenizers_tpu.parallel.mesh import make_data_mesh

CORPUS = [
    "Litwo! Ojczyzno moja! ty jesteś jak zdrowie.",
    "Ile cię trzeba cenić, ten tylko się dowie,",
    "Kto cię stracił. Dziś piękność twą w całej ozdobie",
    "Widzę i opisuję, bo tęsknię po tobie.",
    "aaa aab abab banana bandana!",
    "ab ab ab cd cd c d aaaa",
]


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_data_mesh(8)


def test_bpe_sharded_equals_single(mesh8):
    single = NaiveBPE()
    single.train(CORPUS, 120)
    sharded = NaiveBPE(mesh=mesh8)
    sharded.train(CORPUS, 120)
    assert sharded.merges_list == single.merges_list
    assert sharded.vocab == single.vocab
    assert sharded.corpus_as_symbols == single.corpus_as_symbols


def test_wp_sharded_equals_single(mesh8):
    single = NaiveWP()
    single.train(CORPUS, 140)
    sharded = NaiveWP(mesh=mesh8)
    sharded.train(CORPUS, 140)
    assert sharded.vocab == single.vocab
    assert sharded.corpus_as_symbols == single.corpus_as_symbols


def test_sharded_uneven_rows(mesh8):
    # word-type count not divisible by the mesh size
    corpus = CORPUS[:3]
    single = FastBPE()
    single.train(corpus, 80)
    sharded = FastBPE(mesh=mesh8)
    sharded.train(corpus, 80)
    assert sharded.merges_list == single.merges_list
    for s in corpus:
        assert sharded.tokenize(s) == single.tokenize(s)


def test_sharded_encode_matches(mesh8, pan_tadeusz, pan_tadeusz_golden):
    from subword_tokenizers_tpu import FastWP
    tok = FastWP(mesh=mesh8)
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    sub = pan_tadeusz[:120]
    assert tok.tokenize_batch(sub) == \
        pan_tadeusz_golden["FastWordPiece"][:120]


def test_mesh_sizes():
    for n in (1, 2, 4):
        if len(jax.devices()) < n:
            continue
        mesh = make_data_mesh(n)
        tok = NaiveBPE(mesh=mesh)
        tok.train(CORPUS[:2], 60)
        ref = NaiveBPE()
        ref.train(CORPUS[:2], 60)
        assert tok.merges_list == ref.merges_list
