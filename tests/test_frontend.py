"""Front-end conformance: lower + BERT pre-split must match
``str.lower()`` + the HF Rust BertPreTokenizer bit-for-bit."""
import random

import numpy as np
import pytest

from subword_tokenizers_tpu.frontend import pretokenize as P
from subword_tokenizers_tpu.frontend.charclass import codepoints

try:
    from tokenizers.pre_tokenizers import BertPreTokenizer
    HAVE_HF = True
except ImportError:
    HAVE_HF = False

needs_hf = pytest.mark.skipif(not HAVE_HF, reason="tokenizers not installed")


@needs_hf
def test_golden_corpus_exact(pan_tadeusz):
    pt = BertPreTokenizer()
    for s in pan_tadeusz:
        assert P.pre_tokenize_str(s) == pt.pre_tokenize_str(s.lower())


@needs_hf
def test_random_unicode_exact():
    pt = BertPreTokenizer()
    rng = random.Random(0)
    pools = [list(range(32, 127)), list(range(0xA0, 0x500)),
             list(range(0x2000, 0x2070)), list(range(0x4E00, 0x4E40)),
             [0x1C, 0x1D, 9, 10, 13, 32, 0x85, 0x3000, 0x1F600, 0x5F, 0xB2]]
    for _ in range(500):
        n = rng.randrange(0, 40)
        s = "".join(chr(rng.choice(rng.choice(pools))) for _ in range(n))
        assert P.pre_tokenize_str(s) == pt.pre_tokenize_str(s.lower()), repr(s)


def test_numpy_native_agree(pan_tadeusz):
    native = P._get_native_split()
    if native is None:
        pytest.skip("native kernel unavailable")
    for s in pan_tadeusz[:200]:
        cps = codepoints(s.lower())
        ns, ne = native(cps)
        ps, pe = P._split_bounds_numpy(cps)
        assert np.array_equal(ns, ps) and np.array_equal(ne, pe)


def test_batch_matches_single(pan_tadeusz):
    sub = pan_tadeusz[:100]
    wb = P.pretokenize_batch(sub)
    per_sentence = wb.sentence_tokens()
    for i, s in enumerate(sub):
        assert per_sentence[i] == P.pre_tokenize_str(s)


def test_empty_and_whitespace():
    assert P.pre_tokenize_str("") == []
    assert P.pre_tokenize_str(" \t\n ") == []
    wb = P.pretokenize_batch(["", "  ", "a"])
    assert wb.n_words == 1 and wb.word(0) == "a"


@needs_hf
def test_foreign_frontend_injection(pan_tadeusz, pan_tadeusz_golden):
    """--normalize_with path: an HF-style tokenizer object injected into
    the models must route preprocessing through its pre_tokenizer
    (models/base.py:31-35; reference cli.py:163) with identical output on
    both the host and the batched device paths."""
    from ref_oracle import HFShim

    from subword_tokenizers_tpu import FastBPE, NaiveWP

    sub = pan_tadeusz[:60]
    for cls, key in ((FastBPE, "FastBPE"), (NaiveWP, "NaiveWordPiece")):
        tok = cls(HFShim())
        tok.load_resources(f"/root/reference/resources/pretrained/{key}")
        golden = pan_tadeusz_golden[key][:60]
        assert [tok.tokenize(s) for s in sub] == golden
        assert tok.tokenize_batch(sub) == golden


def test_vectorized_lower_exact():
    """LUT lower == str.lower() for LUT-eligible text; specials (U+0130,
    final sigma) force the exact fallback and must round-trip through the
    batch front end identically."""
    import numpy as np
    from subword_tokenizers_tpu.frontend.charclass import (LOWER,
                                                           LOWER_SPECIAL,
                                                           lower_codepoints,
                                                           to_text)
    from subword_tokenizers_tpu.frontend.pretokenize import \
        pretokenize_batch

    # Exhaustive over the BMP + spot planes: LUT equals str.lower() for
    # every non-special codepoint.
    cps = np.arange(0x110000, dtype=np.uint32)
    ok = ~LOWER_SPECIAL
    # surrogates cannot travel through utf-32 (codepoints() rejects them
    # upstream too) — excluded from the exhaustive sweep
    ok[0xD800:0xE000] = False
    # build in chunks to keep memory sane
    for lo in range(0, 0x110000, 0x20000):
        hi = min(lo + 0x20000, 0x110000)
        seg = cps[lo:hi][ok[lo:hi]]
        want = "".join(chr(c) for c in seg).lower()
        got = to_text(LOWER[seg])
        assert got == want, f"LUT lower diverges in [{lo:#x}, {hi:#x})"

    assert lower_codepoints("İstanbul") is None
    assert lower_codepoints("ΑΣ") is None
    got = lower_codepoints("Litwo! OJCZYZNO")
    assert got is not None and to_text(got) == "litwo! ojczyzno"

    # Batch front end: specials route through the exact path.
    corpus = ["İstanbul ΑΣ test", "Zwykłe ZDANIE", "ΣΑΛΑΤΑ ΑΣ"]
    wb = pretokenize_batch(corpus)
    lowered = [s.lower() for s in corpus]
    txt = to_text(wb.cps)
    assert txt == "".join(lowered)
