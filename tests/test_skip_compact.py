"""Deferred-compaction (skip-window) training path conformance.

The skip path (ops/flat.skip_next / flat_skip_aggregate / flat_skip_apply,
wired via flat_train_steps(skip=N)) must produce BIT-IDENTICAL merge
streams and vocabularies to the compact-every-step path at ANY window
size: positions come from a liveness cumsum (exactly the compacted
index), and window overflow triggers an in-step exact compaction. A tiny
window (skip=2/3) forces frequent overflow, exercising the lax.cond
fallback; pathological equal-symbol corpora force the cpos-based
self-overlap parity through dead-slot runs.
"""
import json
import os

import pytest

from subword_tokenizers_tpu.models.bpe import NaiveBPE
from subword_tokenizers_tpu.models.wordpiece import NaiveWP


def _train(cls, corpus, vocab, skip):
    old = os.environ.get("SWT_SKIP_COMPACT")
    os.environ["SWT_SKIP_COMPACT"] = str(skip)
    try:
        tok = cls()
        tok.train(corpus, vocab)
        return tok
    finally:
        if old is None:
            del os.environ["SWT_SKIP_COMPACT"]
        else:
            os.environ["SWT_SKIP_COMPACT"] = old


PATHOLOGICAL = [
    "aaaaaaaaaaaaaaaaaaaaaa",
    "abababababababab ababab",
    "aaa aab aba abb baa bab bba bbb",
    "zzzz zzzz zzzzz zzzzzz zzz",
    "the quick brown fox jumps over the lazy dog",
    "aaaa " * 12,
    "xy" * 11,
]


@pytest.mark.parametrize("skip", [2, 3, 8])
def test_bpe_pathological_bitexact(skip):
    ref = _train(NaiveBPE, PATHOLOGICAL, 40, 0)
    got = _train(NaiveBPE, PATHOLOGICAL, 40, skip)
    assert got.merges_list == ref.merges_list
    assert got.vocab == ref.vocab


@pytest.mark.parametrize("skip", [2, 8])
def test_wp_pathological_bitexact(skip):
    ref = _train(NaiveWP, PATHOLOGICAL, 40, 0)
    got = _train(NaiveWP, PATHOLOGICAL, 40, skip)
    assert got.vocab == ref.vocab


@pytest.mark.parametrize("cls", [NaiveBPE, NaiveWP])
def test_train5k_slice_bitexact(cls):
    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)[:400]
    ref = _train(cls, corpus, 420, 0)
    got = _train(cls, corpus, 420, 3)   # tiny window: overflow-heavy
    if cls is NaiveBPE:
        assert got.merges_list == ref.merges_list
    assert got.vocab == ref.vocab


@pytest.mark.slow
@pytest.mark.parametrize("cls", [NaiveBPE, NaiveWP])
def test_train5k_slice_bitexact_production_window(cls):
    """The production window (skip=12) on the same slice — slow-marked:
    skip=3 above already exercises the overflow path, this pins the
    default configuration (ADVICE r4: keep the fast suite lean on the
    2-core host)."""
    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)[:400]
    ref = _train(cls, corpus, 420, 0)
    big = _train(cls, corpus, 420, 12)
    if cls is NaiveBPE:
        assert big.merges_list == ref.merges_list
    assert big.vocab == ref.vocab


def test_wp_cand_cap_gate_bitexact():
    """Forced compaction on vs off (the CPU-backend gate's two sides)
    must produce identical vocabularies — wp_select_core shares one body
    and the cap is a cost trade only."""
    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)[:400]
    old = os.environ.get("SWT_WP_CAND_CAP")
    try:
        os.environ["SWT_WP_CAND_CAP"] = "1"
        on = NaiveWP()
        on.train(corpus, 420)
        os.environ["SWT_WP_CAND_CAP"] = "0"
        off = NaiveWP()
        off.train(corpus, 420)
    finally:
        if old is None:
            del os.environ["SWT_WP_CAND_CAP"]
        else:
            os.environ["SWT_WP_CAND_CAP"] = old
    assert on.vocab == off.vocab
