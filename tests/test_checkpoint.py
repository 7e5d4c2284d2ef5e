"""Mid-training checkpoint/resume must reproduce an uninterrupted run
bit-for-bit (SURVEY.md §5: checkpoint/resume subsystem)."""
import pytest

from subword_tokenizers_tpu import FastWP, NaiveBPE, NaiveWP

CORPUS = [
    "Litwo! Ojczyzno moja! ty jesteś jak zdrowie.",
    "Ile cię trzeba cenić, ten tylko się dowie,",
    "aaa aab abab banana bandana!",
]


def test_bpe_resume_matches_full_run(tmp_path):
    full = NaiveBPE()
    full.train(CORPUS, 120)

    # Phase 1: interrupted run to a smaller budget, checkpointing.
    part = NaiveBPE()
    part.train(CORPUS, 80, checkpoint_dir=str(tmp_path),
               checkpoint_every=10)
    assert (tmp_path / "merges.json").exists()

    # Phase 2: resume to the full budget.
    resumed = NaiveBPE()
    resumed.train(CORPUS, 120, checkpoint_dir=str(tmp_path), resume=True)
    assert resumed.merges_list == full.merges_list
    assert resumed.vocab == full.vocab
    assert resumed.corpus_as_symbols == full.corpus_as_symbols


def test_wp_resume_matches_full_run(tmp_path):
    full = NaiveWP()
    full.train(CORPUS, 130)

    part = NaiveWP()
    part.train(CORPUS, 100, checkpoint_dir=str(tmp_path),
               checkpoint_every=7)
    assert (tmp_path / "wp_state.json").exists()
    assert (tmp_path / "vocab.json").exists()

    resumed = NaiveWP()
    resumed.train(CORPUS, 130, checkpoint_dir=str(tmp_path), resume=True)
    assert resumed.vocab == full.vocab
    assert resumed.corpus_as_symbols == full.corpus_as_symbols


def test_fastwp_resume_builds_trie(tmp_path):
    part = FastWP()
    part.train(CORPUS, 100, checkpoint_dir=str(tmp_path))
    resumed = FastWP()
    resumed.train(CORPUS, 110, checkpoint_dir=str(tmp_path), resume=True)
    full = FastWP()
    full.train(CORPUS, 110)
    assert resumed.vocab == full.vocab
    assert resumed.tokenize(CORPUS[0]) == full.tokenize(CORPUS[0])


def test_strict_resources(tmp_path):
    tok = NaiveBPE()
    tok.load_resources(str(tmp_path / "nope"))  # quirk: silent no-op
    with pytest.raises(FileNotFoundError):
        tok.load_resources(str(tmp_path / "nope"), strict=True)
    wp = NaiveWP()
    with pytest.raises(FileNotFoundError):
        wp.load_resources(str(tmp_path / "nope"), strict=True)


def test_resume_mismatched_corpus(tmp_path):
    part = NaiveBPE()
    part.train(CORPUS, 80, checkpoint_dir=str(tmp_path))
    bad = NaiveBPE()
    with pytest.raises(ValueError):
        bad.train(["zzz qqq vvv"], 80, checkpoint_dir=str(tmp_path),
                  resume=True)
