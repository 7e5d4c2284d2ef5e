"""Generate Unicode classification bitmaps for the pre-tokenization front end.

The front end must reproduce, bit-for-bit, the behavior of the HuggingFace
`tokenizers` Rust crate's `BertPreTokenizer` (reference: source/utils.py:26-29)
composed with Python's `str.lower()`, plus the Python-level char classes used
by the FastWP end-to-end scanner (reference: source/wordpiece.py:287-288,
:268 — `str.isalnum` / `str.isspace`).

Four packed bitmaps over the full codepoint space [0, 0x110000):

- ``ws_hf``     : Rust ``char::is_whitespace`` = Unicode White_Space property.
                  (NOT the same as Python ``str.isspace`` — e.g. U+001C-001F
                  are Python-space but not White_Space.)
- ``punct_hf``  : BertPreTokenizer punctuation = ASCII punctuation ranges
                  (!-/ :-@ [-` {-~) OR Unicode general category P*.
- ``ws_py``     : Python ``str.isspace``  (FastWP scanner semantics).
- ``alnum_py``  : Python ``str.isalnum``  (FastWP scanner semantics).

Plus the case tables for a vectorized ``str.lower()``:

- ``lower``     : i32 1:1 lowercase mapping (identity where unchanged).
- ``lower_special``: mask of the two codepoints a LUT cannot handle —
  U+0130 (lowers to 2 codepoints) and U+03A3 (CPython applies the
  Final_Sigma context rule) — callers fall back to ``str.lower()`` when
  present (verified exhaustively: every other codepoint lowers 1:1 and
  context-free in CPython).

These are *generated from this environment's* unicodedata / str methods, so
they are exact by construction for the Python classes; the HF classes are
validated empirically against the installed `tokenizers` crate by the test
suite (tests/test_frontend.py).

Run:  python tools/gen_unicode_tables.py
Writes: subword_tokenizers_tpu/frontend/unicode_tables.npz
"""
import sys
import unicodedata

import numpy as np

N = 0x110000

WHITE_SPACE_PROPERTY = (
    list(range(0x0009, 0x000E))  # tab, LF, VT, FF, CR
    + [0x0020, 0x0085, 0x00A0, 0x1680]
    + list(range(0x2000, 0x200B))  # en quad .. hair space
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)

ASCII_PUNCT = (
    list(range(0x21, 0x30))    # ! .. /
    + list(range(0x3A, 0x41))  # : .. @
    + list(range(0x5B, 0x61))  # [ .. `
    + list(range(0x7B, 0x7F))  # { .. ~
)


def main(out_path: str) -> None:
    ws_hf = np.zeros(N, dtype=bool)
    ws_hf[WHITE_SPACE_PROPERTY] = True

    punct_hf = np.zeros(N, dtype=bool)
    punct_hf[ASCII_PUNCT] = True

    ws_py = np.zeros(N, dtype=bool)
    alnum_py = np.zeros(N, dtype=bool)
    lower = np.arange(N, dtype=np.int32)
    lower_special = np.zeros(N, dtype=bool)

    for cp in range(N):
        c = chr(cp)
        if unicodedata.category(c).startswith("P"):
            punct_hf[cp] = True
        if c.isspace():
            ws_py[cp] = True
        if c.isalnum():
            alnum_py[cp] = True
        low = c.lower()
        if len(low) != 1:
            lower_special[cp] = True
        else:
            lower[cp] = ord(low)
    lower_special[0x03A3] = True  # Final_Sigma context rule

    np.savez_compressed(
        out_path,
        ws_hf=np.packbits(ws_hf),
        punct_hf=np.packbits(punct_hf),
        ws_py=np.packbits(ws_py),
        alnum_py=np.packbits(alnum_py),
        lower_delta=(lower - np.arange(N, dtype=np.int32)),
        lower_special=np.packbits(lower_special),
        n_codepoints=np.int64(N),
    )
    print(f"wrote {out_path}: ws_hf={ws_hf.sum()} punct_hf={punct_hf.sum()} "
          f"ws_py={ws_py.sum()} alnum_py={alnum_py.sum()} "
          f"lower_changed={(lower != np.arange(N, dtype=np.int32)).sum()} "
          f"lower_special={lower_special.sum()}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "subword_tokenizers_tpu/frontend/unicode_tables.npz"
    main(out)
