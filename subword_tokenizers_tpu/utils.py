"""Small host-side utilities (reference parity: source/utils.py:141-153)."""
from __future__ import annotations

import re
from typing import List

# Best-effort detokenizer. Whitespace is not recoverable from a token
# stream; this mirrors the reference's common-sense punctuation handling
# (source/utils.py:141-153 — dead code there, provided for API parity).
_JOIN_SHARP = re.compile(r"\s##(\S)")
_LEFT_PUNCT = re.compile(r"\s(\.|,|\)|\]|\\|’|-|\'|\\|/)")
_RIGHT_PUNCT = re.compile(r"(\(|\[|\\|’|-|\'|\\|/)\s")


def recover_sentence(tokens: List[str]) -> str:
    """Join tokens into a readable sentence (not a faithful inverse)."""
    out = " ".join(tokens)
    out = _JOIN_SHARP.sub(r"\g<1>", out)
    out = _LEFT_PUNCT.sub(r"\g<1>", out)
    out = _RIGHT_PUNCT.sub(r"\g<1>", out)
    return out
