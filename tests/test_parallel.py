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


def test_bpe_sharded_scale_topk(mesh8, pan_tadeusz):
    """Two-phase top-K selection at realistic scale (300 sentences,
    vocab 600, narrow path active under the mesh): bit-identical to
    single-device, with the certificate proving most steps (no silent
    always-fallback)."""
    corpus = pan_tadeusz[:300]
    single = NaiveBPE()
    single.train(corpus, 600)
    sharded = NaiveBPE(mesh=mesh8)
    sharded.train(corpus, 600)
    assert sharded.merges_list == single.merges_list
    assert sharded.vocab == single.vocab
    steps = len(sharded.merges_list)
    assert steps > 400
    # Every step must settle at a bandwidth-lean tier: certificate-proven
    # top-K (O(K*D) comm) or exact compacted-runs gather (O(distinct*D));
    # the full position gather must never fire at this scale.
    assert sharded._sel_stats["proven"] > 0, sharded._sel_stats
    assert sharded._sel_stats["full"] == 0, sharded._sel_stats


def test_wp_sharded_scale_topk(mesh8, pan_tadeusz):
    corpus = pan_tadeusz[:300]
    single = NaiveWP()
    single.train(corpus, 700)
    sharded = NaiveWP(mesh=mesh8)
    sharded.train(corpus, 700)
    assert sharded.vocab == single.vocab
    assert sharded.corpus_as_symbols == single.corpus_as_symbols


def test_sharded_uniform_counts_fallback(mesh8):
    """All pair counts equal: the winner is decided purely by first-seen
    position, the Σ-threshold can never prove it, and every step must
    fall back to the exact path — and still match single-device. This is
    the case a wrong threshold would get wrong."""
    corpus = ["zyx wvu tsr qpo nml kji hgf edc ba"]
    single = NaiveBPE()
    single.train(corpus, 40)
    sharded = NaiveBPE(mesh=mesh8)
    sharded.train(corpus, 40)
    assert sharded.merges_list == single.merges_list
    assert sharded._topk_fallbacks > 0


def test_wp_sharded_tie_margin_fallback(mesh8):
    """Score-tie-heavy WordPiece corpus: >TOPK distinct pairs per shard,
    every pair scoring exactly 1.0 (count 1, unit symbol freqs), so the
    winner is decided purely by insertion order. The scaled-integer
    certificate's rounding margin (parallel/train.py) must refuse every
    step — best score equals each shard's K-th-best bound, and a
    non-nominated pair could tie the winning double and win the
    insertion-order tie-break — and the exact fallback tier must still
    match single-device training. This pins the margin path that r4
    shipped without ever executing."""
    from subword_tokenizers_tpu.parallel.train import TOPK
    n = 8 * (TOPK + 8)  # every shard's local run count overflows top-K
    corpus = [" ".join(chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1)
                       for i in range(n))]
    vocab_target = 2 * n + 1  # exactly one merge step
    single = NaiveWP()
    single.train(corpus, vocab_target)
    sharded = NaiveWP(mesh=mesh8)
    sharded.train(corpus, vocab_target)
    assert sharded.vocab == single.vocab
    assert sharded._topk_fallbacks > 0, sharded._sel_stats
    assert sharded._sel_stats["proven"] == 0, sharded._sel_stats


def test_wp_forced_tiers(mesh8):
    """Pinning each WP fallback tier must reproduce single-device
    training without touching the certificate (mirrors the BPE
    forced-tier dryrun leg)."""
    single = NaiveWP()
    single.train(CORPUS, 120)
    for tier in ("compact", "full"):
        forced = NaiveWP(mesh=mesh8)
        forced._force_tier = tier
        forced.train(CORPUS, 120)
        assert forced.vocab == single.vocab, tier
        assert forced._sel_stats["proven"] == 0, (tier, forced._sel_stats)
        if tier == "full":
            assert forced._sel_stats["compact"] == 0, forced._sel_stats


def test_sharded_wide_path(mesh8, pan_tadeusz):
    """Force the wide (i64) key path under the mesh by a large max_vocab
    bound; results must still match the single-device narrow path."""
    corpus = pan_tadeusz[:40]
    single = NaiveBPE()
    single.train(corpus, 200)
    sharded = NaiveBPE(mesh=mesh8)
    sharded.train(corpus, (1 << 16) + 200)  # narrow precondition fails
    assert sharded.merges_list[:len(single.merges_list)][:180] == \
        single.merges_list[:180]


def test_topk_comm_is_small(mesh8):
    """The compiled two-phase step must move candidate-sized arrays, not
    corpus-sized ones: no all-gather result larger than K*D elements."""
    import re

    import jax.numpy as jnp
    import numpy as np

    from subword_tokenizers_tpu.parallel.train import (
        TOPK, sharded_bpe_select_topk, shard_corpus)

    n, L = 512, 12  # 5632 pair slots per shard >> K*D = 512
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 50, size=(n, L)).astype(np.int32)
    freq = np.ones(n, dtype=np.int64)
    sym_d, freq_d = shard_corpus(mesh8, sym, freq)
    lowered = sharded_bpe_select_topk.lower(mesh8, sym_d, freq_d, True)
    hlo = lowered.compile().as_text()
    cap = TOPK * 8
    for m in re.finditer(r"all-gather[^=]*=?\s*\w*\[(\d+)", hlo):
        assert int(m.group(1)) <= 4 * cap, m.group(0)
