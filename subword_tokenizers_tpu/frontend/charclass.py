"""Unicode character classification tables for the pre-tokenization front end.

Loads the packed bitmaps produced by ``tools/gen_unicode_tables.py`` and
exposes them as flat boolean lookup arrays indexed by codepoint.

Four classes (see the generator docstring for exact definitions):

- ``WS_HF``    — Rust ``char::is_whitespace`` (Unicode White_Space), the
                 whitespace class of HF's BertPreTokenizer
                 (reference behavior: source/utils.py:26-29).
- ``PUNCT_HF`` — BertPreTokenizer punctuation: ASCII punct ranges OR Unicode
                 general category P*.
- ``WS_PY``    — Python ``str.isspace`` (FastWP E2E scanner,
                 reference: source/wordpiece.py:268).
- ``ALNUM_PY`` — Python ``str.isalnum`` (FastWP E2E scanner punct class,
                 reference: source/wordpiece.py:287-288).
"""
from __future__ import annotations

import os

import numpy as np

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "unicode_tables.npz")

_N = 0x110000


def _load():
    with np.load(_TABLE_PATH) as z:
        n = int(z["n_codepoints"])
        assert n == _N, f"table codepoint space {n} != {_N}"
        ws_hf = np.unpackbits(z["ws_hf"])[:n].astype(bool)
        punct_hf = np.unpackbits(z["punct_hf"])[:n].astype(bool)
        ws_py = np.unpackbits(z["ws_py"])[:n].astype(bool)
        alnum_py = np.unpackbits(z["alnum_py"])[:n].astype(bool)
        lower = (z["lower_delta"].astype(np.int32)
                 + np.arange(n, dtype=np.int32)).astype(np.uint32)
        lower_special = np.unpackbits(z["lower_special"])[:n].astype(bool)
    return ws_hf, punct_hf, ws_py, alnum_py, lower, lower_special


WS_HF, PUNCT_HF, WS_PY, ALNUM_PY, LOWER, LOWER_SPECIAL = _load()

# FastWP's `ispunc` = not alnum and not space (Python semantics),
# reference: source/wordpiece.py:287-288.
PUNC_PY = ~(ALNUM_PY | WS_PY)


def codepoints(text: str) -> np.ndarray:
    """Codepoint array (uint32) of ``text`` — the canonical host representation."""
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def to_text(cps: np.ndarray) -> str:
    return cps.astype("<u4").tobytes().decode("utf-32-le")


def lower_codepoints(text: str):
    """Vectorized ``str.lower()`` over the codepoint array.

    Returns the lowered uint32 array (same length — the mapping is 1:1),
    or None when ``text`` contains a case special the LUT cannot express:
    U+0130 (lowers to two codepoints) or U+03A3 (CPython applies the
    Final_Sigma context rule). Callers fall back to ``str.lower()`` then
    — exhaustively verified equal for every other codepoint
    (tools/gen_unicode_tables.py, tests/test_frontend.py).
    """
    cps = codepoints(text)
    if cps.size and LOWER_SPECIAL[cps].any():
        return None
    return LOWER[cps]
