"""Benchmark metric formulas must match the reference suite numerically."""
import math
import sys

import pytest

from subword_tokenizers_tpu import FastBPE, NaiveBPE
from subword_tokenizers_tpu.benchmarks import metrics as M
from subword_tokenizers_tpu.benchmarks.suite import benchmarks

from ref_oracle import REFERENCE_PATH, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")


def _ref_metrics():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import source.benchmarks as rb
    return rb


TOKENIZED = [["li", "##two", "!"], ["oj", "##czy", "##zno", "mo", "##ja"],
             ["ty"], []]
WORDS = {"litwo": ["li", "##two"], "ty": ["ty"], "x": ["[UNK]"],
         "ab": ["a", "##b"]}


@needs_ref
def test_pure_metrics_match_reference():
    rb = _ref_metrics()
    assert M.avg_tokens_per_sentence(TOKENIZED) == \
        rb.avg_tokens_per_sentence(TOKENIZED)
    assert M.avg_tokens_per_word(WORDS) == rb.avg_tokens_per_word(WORDS)
    assert M.normalized_sequence_length(10, 40) == \
        rb.normalized_sequence_length(10, 40)
    assert M.normalized_sequence_length(10, 0) == \
        rb.normalized_sequence_length(10, 0)
    assert M.subword_fragmentation_rate(WORDS) == \
        rb.subword_fragmentation_rate(WORDS)
    assert M.vocabulary_coverage_rate(WORDS) == \
        rb.vocabulary_coverage_rate(WORDS)
    assert M.compression_rate(100, TOKENIZED) == \
        rb.compression_rate(100, TOKENIZED)
    z1 = M.zipf_distribution(TOKENIZED)
    z2 = rb.zipf_distribution(TOKENIZED)
    for k in ("slope", "intercept", "correlation"):
        assert math.isclose(z1[k], z2[k], rel_tol=0, abs_tol=0), k


@needs_ref
def test_equivalence_matches_reference():
    rb = _ref_metrics()
    corpus = ["aaa aab abab banana bandana!", "ab ab ab cd cd c d aaaa"]
    a = NaiveBPE()
    a.train(corpus, 40)
    b = FastBPE()
    b.train(corpus, 40)
    mine = M.token_sequence_equivalence(a, b, corpus)
    ref = rb.token_sequence_equivalence(a, b, corpus)
    assert mine == ref


class _SpyTok:
    """Counts batch vs per-sentence calls to pin the latency semantics."""

    def __init__(self):
        self.batch_calls = 0
        self.single_calls = 0

    def tokenize_batch(self, sents):
        self.batch_calls += 1
        return [[s] for s in sents]

    def tokenize(self, s):
        self.single_calls += 1
        return [s]


def test_tokenization_performance_semantics():
    # avg_latency_s = the reference's per-sentence tokenize latency
    # (source/benchmarks.py:187-218); avg_batch_latency_s = the
    # batch-amortized figure. Both must be present and measured from the
    # right call path.
    spy = _SpyTok()
    sents = [f"s{i}" for i in range(10)]
    perf = M.tokenization_performance(spy, sents)
    assert spy.batch_calls == 1
    assert spy.single_calls == len(sents)  # <= latency_sample: full sweep
    for key in ("total_time_s", "throughput_tokens_per_s",
                "avg_latency_s", "avg_batch_latency_s"):
        assert key in perf and perf[key] >= 0

    # Large input: the per-sentence sweep is strided to latency_sample.
    spy = _SpyTok()
    perf = M.tokenization_performance(spy, [f"s{i}" for i in range(1000)],
                                      latency_sample=16)
    assert spy.batch_calls == 1
    assert spy.single_calls == 16

    # No batch path: both figures come from per-sentence calls.
    class _Plain:
        def __init__(self):
            self.single_calls = 0

        def tokenize(self, s):
            self.single_calls += 1
            return [s]

    p = _Plain()
    perf = M.tokenization_performance(p, sents)
    assert p.single_calls == 2 * len(sents)  # timed batch-fallback + sweep
    assert perf["avg_latency_s"] >= 0


def test_suite_modes(capsys):
    corpus = ["aaa aab abab banana bandana!", "ab ab ab cd cd"]
    a = NaiveBPE()
    a.train(corpus, 30)
    b = FastBPE()
    b.train(corpus, 30)

    res = benchmarks(a, 30, corpus, pretrained=True, pretrained_path="",
                     reference_tokenizers=[b], compare_only=True)
    out = capsys.readouterr().out
    assert "Token Sequence Equivalence" in out
    assert res["equivalence"]["FastBPE"]["positional_rate"] == 100.0

    res = benchmarks(a, 30, corpus, pretrained=True, pretrained_path="",
                     reference_tokenizers=[b])
    out = capsys.readouterr().out
    assert "Tokenization Metrics for NaiveBPE" in out
    assert "Zipf Distribution Fit" in out
    assert "NaiveBPE" in res and "FastBPE" in res

    res = benchmarks(a, 30, [], train_corpus=corpus)
    out = capsys.readouterr().out
    assert "Training Performance for NaiveBPE" in out
    assert res["NaiveBPE"]["train_time_s"] > 0

    with pytest.raises(ValueError):
        benchmarks(a, 30, [], train_corpus=[])
