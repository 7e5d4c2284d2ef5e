"""WordPiece conformance: training fixtures, both encoders vs the live
reference, golden streams, and the preserved reference quirks."""
import json

import pytest

from subword_tokenizers_tpu import FastWP, NaiveWP

from ref_oracle import make_reference, reference_available

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")

TUTORIAL = ["This is a sentence.", "Another example sentence."]
C2 = ["aaa aab abab banana bandana!", "ab ab ab cd cd c d aaaa",
      "ßß İİ ss aßa xx ee"]
SENTS = C2 + ["a banana!! sentence", "band", "  spaces  here ", "!!!",
              "aß!xa", "ab", "", " ", "banda band ##a", "e!e", "xx!xx",
              "b!an!"]


def test_tutorial_fixture_vocab():
    tok = NaiveWP()
    tok.train(TUTORIAL, max_vocab=25)
    with open("/root/reference/resources/tests/NaiveWordPiece/"
              "vocab.json") as f:
        assert tok.vocab == set(json.load(f))


@needs_ref
def test_train_vs_reference():
    ref = make_reference("NaiveWordPiece")
    ref.train(C2, 45)
    mine = NaiveWP()
    mine.train(C2, 45)
    assert mine.vocab == ref.vocab


@needs_ref
def test_naive_encode_parity():
    ref = make_reference("NaiveWordPiece")
    ref.train(C2, 45)
    mine = NaiveWP()
    mine.train(C2, 45)
    for w in ["banana", "aaaa", "x", "unknownq", "", "aßa", "bandana", "!"]:
        assert mine.encode_word(w) == ref.encode_word(w), w
    for s in C2:
        assert mine.tokenize(s) == ref.tokenize(s), s
    batch = mine.tokenize_batch(SENTS)
    for s, got in zip(SENTS, batch):
        assert got == ref.tokenize(s), s


@needs_ref
def test_fastwp_parity_host_and_batch():
    ref = make_reference("FastWordPiece")
    ref.train(C2, 45)
    mine = FastWP()
    mine.train(C2, 45)
    for s in SENTS:
        assert mine.tokenize(s) == ref.tokenize(s), s
    batch = mine.tokenize_batch(SENTS)
    for s, got in zip(SENTS, batch):
        assert got == ref.tokenize(s), s


def test_golden_corpus_both_models(pan_tadeusz, pan_tadeusz_golden):
    for cls, name in [(NaiveWP, "NaiveWordPiece"),
                      (FastWP, "FastWordPiece")]:
        tok = cls()
        tok.load_resources(f"/root/reference/resources/pretrained/{name}")
        out = tok.tokenize_batch(pan_tadeusz)
        assert out == pan_tadeusz_golden[name]
        for i in (0, 123, 988):
            assert tok.tokenize(pan_tadeusz[i]) == pan_tadeusz_golden[name][i]


def test_chunked_equals_sentence_path(pan_tadeusz, pan_tadeusz_golden):
    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    sub = pan_tadeusz[:60]
    golden = pan_tadeusz_golden["FastWordPiece"][:60]
    assert tok._tokenize_batch_chunked(sub) == golden
    assert tok._tokenize_batch_sentences(sub) == golden


def test_unk_quirks():
    """NaiveWP's '[UNK]' and FastWP's literal \"['UNK']\" differ
    (reference: source/wordpiece.py:148-149 vs :257)."""
    n = NaiveWP()
    n.vocab = {"a", "##b"}
    assert n.encode_word("zzz") == ["[UNK]"]
    f = FastWP()
    f.vocab = {"a", "##b"}
    f.load_resources("/nonexistent")  # triggers trie rebuild, no-op load
    assert f.tokenize("zzz a") == ["['UNK']", "a"]


def test_hang_guards():
    """Inputs on which the *reference* would loop forever must raise."""
    n = NaiveWP()
    n.vocab = {"#", "s"}
    with pytest.raises(RuntimeError):
        n.encode_word("sqq")
    f = FastWP()
    f.vocab = {"a"}
    f.load_resources("/nonexistent")
    with pytest.raises(RuntimeError):
        f.tokenize("¤")


def test_resources_roundtrip(tmp_path):
    tok = NaiveWP()
    tok.train(TUTORIAL, max_vocab=25)
    tok.save_resources(str(tmp_path))
    reloaded = FastWP()
    reloaded.load_resources(str(tmp_path))
    assert reloaded.vocab == tok.vocab
    with open(tmp_path / "vocab.json", encoding="utf-8") as f:
        assert set(json.load(f)) == tok.vocab


def test_type_validation():
    tok = NaiveWP()
    with pytest.raises(TypeError):
        tok.train("x", 10)
    with pytest.raises(TypeError):
        tok.train([], None)
    with pytest.raises(TypeError):
        tok.tokenize(1.5)
    with pytest.raises(TypeError):
        FastWP().tokenize(None)


def test_sliced_scan_matches_monolithic():
    """sliced_e2e_scan (length-sorted slices, u16 wire, front padding)
    must reproduce the monolithic i32 scan exactly, across slice
    boundaries and row-count quanta."""
    import jax.numpy as jnp
    import numpy as np
    from subword_tokenizers_tpu.frontend.charclass import (PUNC_PY, WS_PY,
                                                           codepoints)
    from subword_tokenizers_tpu.models.wordpiece import FastWP
    from subword_tokenizers_tpu.ops import wp_encode_e2e as e2e

    tok = FastWP()
    tok.vocab = {"a", "##b", "ab", "b", "##a", "x", "!", "##!", "abx"}
    trie, _ = tok._trie()
    info = e2e.pack_node_info(trie.fail, trie.pops_off, trie.pops_flat,
                              max(trie.max_pops, 1))
    info_d = jnp.asarray(info)
    goto_d = jnp.asarray(trie.goto)
    sharp = tok._sharp_seq if tok._sharp_seq is not None else (-2,)

    rng = np.random.default_rng(3)
    chunks = ["a", "ab", "abx", "b!", "x" * 9, "ab" * 5, "!", "q",
              "ba", "abab!x"]
    rows = [chunks[i] for i in rng.integers(0, len(chunks), size=70)]
    T = max(len(c) for c in rows) + 2
    S = len(rows)
    cps = np.full((S, T), 32, dtype=np.uint32)
    slen = np.zeros(S, dtype=np.int32)
    for i, c in enumerate(rows):
        arr = codepoints(c + " ")
        cps[i, :len(arr)] = arr
        slen[i] = len(arr)
    pchar = e2e.pack_chars(trie.alpha[cps], WS_PY[cps], PUNC_PY[cps])

    want = [np.asarray(x) for x in e2e.wp_e2e_scan(
        jnp.asarray(pchar), jnp.asarray(slen), goto_d, info_d,
        trie.root_p, trie.root_sharp, tok._unk_id, tuple(sharp),
        max(trie.max_pops, 1))]

    # Force multiple tiny slices to cross slice boundaries.
    from subword_tokenizers_tpu.core import batching
    old_q, old_s = batching.ROW_QUANTA, batching.SLICE_ROWS
    try:
        batching.ROW_QUANTA, batching.SLICE_ROWS = (16, 32), 32
        got = e2e.sliced_e2e_scan(pchar, slen, goto_d, info_d,
                                  trie.root_p, trie.root_sharp,
                                  tok._unk_id, tuple(sharp),
                                  max(trie.max_pops, 1), trie.n_alpha)
    finally:
        batching.ROW_QUANTA, batching.SLICE_ROWS = old_q, old_s
    for w, g in zip(want, got):
        assert np.array_equal(np.asarray(w), np.asarray(g))

    # u16 wire roundtrip is exact for every representable aid/flag combo.
    aid = rng.integers(0, 1 << 13, size=(4, 64)).astype(np.int32)
    fl = rng.integers(0, 2, size=(3, 4, 64)).astype(np.int32)
    pc32 = aid | (fl[0] << 22) | (fl[1] << 23) | (fl[2] << 24)
    w16 = e2e.pack_u16(pc32)
    assert w16.dtype == np.uint16
    back = (w16.astype(np.int32) & e2e.U16_AID_MASK) \
        | ((w16.astype(np.int32) & 0xE000) << 9)
    assert np.array_equal(back, pc32)


def test_fused_native_path_equivalence(pan_tadeusz, pan_tadeusz_golden):
    """The fused native front end (_native/encode_prep.cpp) must match the
    pure-Python chunked path input-for-input — including raising the same
    hang/crash guards — and specials must fall back cleanly."""
    pytest.importorskip("subword_tokenizers_tpu._native.binding")
    from subword_tokenizers_tpu._native import binding
    try:
        binding._load()
    except Exception:
        pytest.skip("no C++ toolchain")
    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    assert tok._try_fused_chunked(pan_tadeusz[:5]) == \
        pan_tadeusz_golden["FastWordPiece"][:5]
    # LOWER_SPECIAL codepoints (İ / Σ) must route to the Python fallback.
    assert tok._try_fused_chunked(["İstanbul ΣΣ"]) is None

    plain = FastWP.__dict__["_try_fused_chunked"]
    tricky = ["", "   ", "a", "zażółć gęślą jaźń!!!", "ab,cd--ef",
              "x" * 50, "a b  c\t\nd", "mixed 123, punct... (p) [b]",
              "\x1c odd ws", "##", "dup dup dup", "don't stop-me",
              "1234567890", "ęĄŁÓŹŻĆŃŚ"]
    for s in tricky:
        batch = [s, s + " tail", "pad word"]

        def run(use_fused):
            FastWP._try_fused_chunked = plain if use_fused else \
                (lambda self, c: None)
            try:
                return ("ok", tok.tokenize_batch(batch))
            except RuntimeError as e:
                return ("err", str(e).split(" on input")[0])
            finally:
                FastWP._try_fused_chunked = plain

        assert run(True) == run(False), s


@needs_ref
def test_deep_vocab_encode_parity():
    """Encode-side deep-vocab check: both WP encoders on the 8k-vocab
    golden (tests/golden/t5k2500_v8000_wp_vocab.json — a trie an order
    of magnitude deeper than the tutorial fixtures) must match the live
    reference stream-for-stream."""
    with open("tests/golden/t5k2500_v8000_wp_vocab.json") as f:
        vocab = json.load(f)
    with open("/root/reference/data/train-5K.json") as f:
        sents = json.load(f)[2500:2700]  # held-out slice

    mine = FastWP()
    mine.vocab = set(vocab)
    mine.load_resources("/nonexistent")  # no-op load rebuilds the trie
    # The reference builds its trie only in train/load_resources: round-trip
    # the vocab through our (reference-format) save.
    ref = make_reference("FastWordPiece")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        mine.save_resources(td)
        ref.load_resources(td)
    got = mine.tokenize_batch(sents)
    for i, s in enumerate(sents):
        assert got[i] == ref.tokenize(s), s

    refn = make_reference("NaiveWordPiece")
    refn.vocab = set(vocab)
    minen = NaiveWP()
    minen.vocab = set(vocab)
    gotn = minen.tokenize_batch(sents)
    for i, s in enumerate(sents):
        assert gotn[i] == refn.tokenize(s), s


# ---------------------------------------- wide-score domain (>= 2**26 tokens)

def _mini_reference_wp(words, freqs, max_vocab):
    """The reference trainer's exact semantics (source/wordpiece.py:44-103)
    applied directly to a (word-type, frequency) list — Python floats,
    dict-insertion-order tie-break — usable with synthetic frequencies far
    beyond what a materialized corpus could reach."""
    corpus = []
    vocab = set()
    for w, f in zip(words, freqs):
        syms = [w[0]] + [f"##{c}" for c in w[1:]]
        vocab.update(syms)
        corpus.append((syms, int(f)))
    while len(vocab) < max_vocab:
        pair_freqs = {}
        sym_freqs = {}
        for syms, f in corpus:
            for s in syms:
                sym_freqs[s] = sym_freqs.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pair_freqs[(a, b)] = pair_freqs.get((a, b), 0) + f
        if not pair_freqs:
            break
        scores = {p: c / (sym_freqs[p[0]] * sym_freqs[p[1]])
                  for p, c in pair_freqs.items()}
        best = max(scores, key=scores.get)
        merged = best[0] + best[1][2:]
        vocab.add(merged)
        new_corpus = []
        for syms, f in corpus:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_corpus.append((out, f))
        corpus = new_corpus
    return vocab


def _train_with_freqs(words, freqs, max_vocab, monkeypatch, **kw):
    """Train NaiveWP with an injected (word, freq) table (frequencies too
    large to materialize as a real corpus)."""
    import numpy as np

    from subword_tokenizers_tpu.models import wordpiece as wp_mod

    def fake_unique_words(wb):
        return (list(words), np.asarray(freqs, dtype=np.int64),
                np.zeros(1, dtype=np.int32))

    monkeypatch.setattr(wp_mod, "unique_words", fake_unique_words)
    tok = NaiveWP(**kw)
    tok.train([""], max_vocab)
    return tok.vocab


@pytest.mark.parametrize("scale", [1, 1 << 22, (1 << 24) + 12345])
def test_wide_score_synthetic_frequencies(monkeypatch, scale):
    """Training with total occurrences pushed past 2**26 (the old hard
    cap, VERDICT r2 missing #1) must match the reference algorithm
    bit-for-bit. scale=1 stays in the narrow-score domain and pins the
    mini-reference itself against the normal path; the larger scales put
    fa*fb far beyond 2**53 (128-bit scorer) while leaving tie patterns
    intact (score ratios are scale-invariant: c/(fa*fb) ~ 1/scale)."""
    words = ["abcab", "bca", "cab", "aab", "bb", "abab", "ccc", "ba"]
    base = [31, 17, 13, 11, 7, 5, 3, 2]
    freqs = [b * scale for b in base]
    got = _train_with_freqs(words, freqs, 40, monkeypatch)
    want = _mini_reference_wp(words, freqs, 40)
    assert got == want


def test_wide_score_tie_heavy(monkeypatch):
    """Equal frequencies everywhere -> every step is a pure
    insertion-order tie-break, with the scores crossing the double
    rounding boundary in the wide domain."""
    words = ["aaaa", "aaab", "baaa", "abab"]
    freqs = [1 << 24, 1 << 24, 1 << 24, 1 << 24]  # total ~2**26.6
    got = _train_with_freqs(words, freqs, 24, monkeypatch)
    want = _mini_reference_wp(words, freqs, 24)
    assert got == want


def test_wide_score_just_over_boundary(monkeypatch):
    """total_tokens exactly at/over 2**26 flips wide_score on; the result
    must be identical to the mathematically-equal narrow computation."""
    words = ["abcd", "bcda", "dab"]
    total = sum(len(w) for w in words)
    # choose freqs so the weighted total lands just past 2**26
    f0 = (1 << 26) // total + 1
    freqs = [f0, f0, f0]
    got = _train_with_freqs(words, freqs, 20, monkeypatch)
    want = _mini_reference_wp(words, freqs, 20)
    assert got == want


def test_cap_is_2_52(monkeypatch):
    import numpy as np

    from subword_tokenizers_tpu.models import wordpiece as wp_mod

    def fake_unique_words(wb):
        return (["ab"], np.asarray([1 << 51], dtype=np.int64),
                np.zeros(1, dtype=np.int32))

    monkeypatch.setattr(wp_mod, "unique_words", fake_unique_words)
    tok = NaiveWP()
    with pytest.raises(ValueError, match="2\\*\\*52"):
        tok.train([""], 10)


def test_wide_score_sharded(monkeypatch):
    """The tiered sharded reduction in the wide-score regime (128-bit
    scorer + certificate denominator-overflow veto) must match the
    reference algorithm."""
    from subword_tokenizers_tpu.parallel.mesh import make_data_mesh

    words = ["abcab", "bca", "cab", "aab", "bb", "abab", "ccc", "ba",
             "cba", "bac"]
    freqs = [b * (1 << 23) for b in [31, 17, 13, 11, 7, 5, 3, 2, 19, 23]]
    mesh = make_data_mesh(8)
    got = _train_with_freqs(words, freqs, 40, monkeypatch, mesh=mesh)
    want = _mini_reference_wp(words, freqs, 40)
    assert got == want
