"""CLI surface parity: flags, resource layout, tokenize output schema."""
import json
import os

import pytest

from subword_tokenizers_tpu.cli import build_parser, main


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    corpus = ["aaa aab abab banana bandana!", "ab ab ab cd cd"]
    with open("train.json", "w") as f:
        json.dump(corpus, f)
    return tmp_path


def test_flag_surface():
    parser = build_parser()
    args = parser.parse_args(["--model", "NaiveBPE", "FastBPE",
                              "--train", "t.json", "--max_vocab", "50",
                              "--save", "out", "--compare"])
    assert args.model == ["NaiveBPE", "FastBPE"]
    assert args.max_vocab == 50
    assert args.normalize_with == "bert-base-uncased"
    with pytest.raises(SystemExit):
        parser.parse_args(["--model", "NotAModel"])
    with pytest.raises(SystemExit):
        parser.parse_args([])  # --model required


def test_train_save_load_reset(workdir, capsys):
    main(["--model", "NaiveBPE", "--train", "train.json",
          "--max_vocab", "30", "--save", "mydir"])
    out = capsys.readouterr().out
    assert os.path.isfile("resources/mydir/NaiveBPE/merges.json")
    assert "Saved merges and vocab for NaiveBPE" in out

    main(["--model", "NaiveBPE", "--pretrained", "mydir",
          "--tokenize", "banana"])
    out = capsys.readouterr().out
    assert "[NaiveBPE]" in out

    main(["--model", "NaiveBPE", "--reset", "mydir"])
    assert not os.path.isdir("resources/mydir/NaiveBPE")
    main(["--model", "NaiveBPE", "--reset", "mydir"])
    out = capsys.readouterr().out
    assert "No resources to reset" in out


def test_tokenize_file_output_schema(workdir, capsys):
    main(["--model", "NaiveBPE", "FastBPE", "--train", "train.json",
          "--max_vocab", "30", "--tokenize", "train.json"])
    capsys.readouterr()
    with open("train.tokens.json") as f:
        out = json.load(f)
    assert set(out) == {"NaiveBPE", "FastBPE"}
    assert len(out["NaiveBPE"]) == 2
    assert out["NaiveBPE"] == out["FastBPE"]


def test_benchmark_modes(workdir, capsys):
    main(["--model", "NaiveBPE", "--train", "train.json", "--max_vocab",
          "30", "--save", "bm"])
    capsys.readouterr()
    main(["--model", "NaiveBPE", "FastBPE", "--pretrained", "bm",
          "--benchmark", "train.json", "--compare"])
    out = capsys.readouterr().out
    assert "Token Sequence Equivalence" in out
    main(["--model", "NaiveBPE", "--benchmark", "train.json",
          "--max_vocab", "30"])
    out = capsys.readouterr().out
    assert "Training Performance" in out


def test_benchmark_flag_validation(workdir):
    with pytest.raises(SystemExit):
        main(["--model", "NaiveBPE", "FastBPE", "--benchmark",
              "train.json", "--compare"])  # --compare needs --pretrained
    with pytest.raises(SystemExit):
        main(["--model", "NaiveBPE", "--pretrained", "x",
              "--benchmark", "train.json", "--compare"])  # needs 2 models
    with pytest.raises(SystemExit):
        main(["--model", "NaiveBPE", "--benchmark", "nope.txt"])


def test_build_dataset_matches_reference():
    """build_dataset vs the live reference (source/data.py:12-39),
    including the cap-checked-after-append quirk at num_examples <= 0."""
    import sys

    from ref_oracle import REFERENCE_PATH, reference_available
    if not reference_available():
        import pytest
        pytest.skip("reference repo not mounted")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import source.data as ref_data

    from subword_tokenizers_tpu.data.build import build_dataset

    splits = {
        "train": [{"text": "a"}, {"other": 1}, {"text": None},
                  {"text": "b"}],
        "test": [{"text": "c"}],
        "validation": [{"text": "d"}, {"text": "e"}],
    }
    for cap in (None, 0, 1, 3, 4, 99):
        assert build_dataset(splits, "text", cap) == \
            ref_data.build_dataset(splits, "text", cap), cap
    assert build_dataset({}, "text") == ref_data.build_dataset({}, "text")
