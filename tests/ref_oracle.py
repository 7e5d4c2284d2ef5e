"""Test-only oracle: runs the *reference implementation* from /root/reference
to generate expected outputs for conformance checks.

The reference normally builds its front end from a HuggingFace hub
tokenizer (unreachable here); empirically its pipeline is exactly
``str.lower()`` + ``BertPreTokenizer`` (see SURVEY.md), so a tiny shim
object supplies just that. Nothing from the reference is imported into the
framework itself — this module exists purely so tests can diff against the
genuine article on arbitrary inputs.
"""
from __future__ import annotations

import os
import sys

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "source"))


class _Backend:
    def __init__(self):
        from tokenizers.pre_tokenizers import BertPreTokenizer
        self.pre_tokenizer = BertPreTokenizer()


class HFShim:
    """Duck-typed stand-in for an AutoTokenizer: only the attribute chain
    ``backend_tokenizer.pre_tokenizer.pre_tokenize_str`` is used by the
    reference (source/utils.py:26-29)."""

    def __init__(self):
        self.backend_tokenizer = _Backend()


def _import_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import source.bpe as ref_bpe          # noqa: F401
    import source.wordpiece as ref_wp     # noqa: F401
    import source.utils as ref_utils      # noqa: F401
    return ref_bpe, ref_wp, ref_utils


def make_reference(name: str):
    """Instantiate a reference tokenizer by CLI name."""
    ref_bpe, ref_wp, _ = _import_reference()
    classes = {
        "NaiveBPE": ref_bpe.NaiveBPE,
        "FastBPE": ref_bpe.FastBPE,
        "NaiveWordPiece": ref_wp.NaiveWP,
        "FastWordPiece": ref_wp.FastWP,
    }
    return classes[name](HFShim())
