"""Model base class: the normalization front end every tokenizer shares.

Mirrors the reference's ``SubwordTokenizer`` (source/utils.py:5-41) but is
self-contained: by default the built-in exact front end (frontend/) replaces
the HuggingFace dependency. An HF-style tokenizer object can still be
injected for compatibility with the reference constructor signature — any
object exposing ``backend_tokenizer.pre_tokenizer.pre_tokenize_str``.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from ..frontend.pretokenize import WordBatch, pre_tokenize_str, \
    pretokenize_batch

Token = Tuple[str, Tuple[int, int]]


class SubwordTokenizer:
    """Parent class for all subword tokenizers."""

    def __init__(self, tokenizer: Optional[object] = None) -> None:
        """``tokenizer``: optional HF-style tokenizer used only for
        pre-tokenization; defaults to the built-in exact front end."""
        self.tokenizer = tokenizer

    def preprocessing(self, corpus: List[str]) -> List[List[Token]]:
        """Lower + BERT pre-split each sentence; reference schema
        (source/utils.py:15-29): per sentence, [(word, (start, end)), ...]."""
        if self.tokenizer is not None:
            pt = self.tokenizer.backend_tokenizer.pre_tokenizer
            return [pt.pre_tokenize_str(example.lower())
                    for example in corpus]
        return [pre_tokenize_str(example) for example in corpus]

    def preprocessing_batch(self, corpus: List[str]) -> WordBatch:
        """Array-form front end output (the device pipeline's input)."""
        if self.tokenizer is not None:
            # Foreign front end: route through the reference schema.
            import numpy as np
            toks = self.preprocessing(corpus)
            lowered = [s.lower() for s in corpus]
            joined = "".join(lowered)
            from ..frontend.charclass import codepoints
            cps = codepoints(joined)
            sent_off = np.zeros(len(corpus) + 1, dtype=np.int64)
            np.cumsum([len(s) for s in lowered], out=sent_off[1:])
            ws, we, sid = [], [], []
            for i, sent in enumerate(toks):
                for _, (s, e) in sent:
                    ws.append(s + sent_off[i])
                    we.append(e + sent_off[i])
                    sid.append(i)
            return WordBatch(
                cps=cps,
                word_start=np.asarray(ws, dtype=np.int64),
                word_end=np.asarray(we, dtype=np.int64),
                sent_id=np.asarray(sid, dtype=np.int32),
                sent_cp_off=sent_off)
        return pretokenize_batch(corpus)

    def vocab_length(self, corpus: List[str]) -> int:
        """Number of unique characters in the corpus
        (reference: source/utils.py:31-41)."""
        return len({symbol for example in corpus for symbol in example})

    def tokenize_stream(self, sentences, batch_sentences: int = 8192):
        """Bounded-memory streaming encode: consume any iterable of
        sentences, yield one token list per sentence, in order.

        Internally batches ``batch_sentences`` at a time through
        ``tokenize_batch`` (all dedup/device batching applies per block),
        so arbitrarily large corpora encode in constant memory. A
        capability the reference lacks; batch size trades peak memory
        against device-batch efficiency.
        """
        if batch_sentences < 1:
            raise ValueError("batch_sentences must be >= 1")
        block: List[str] = []
        for s in sentences:
            block.append(s)
            if len(block) >= batch_sentences:
                yield from self.tokenize_batch(block)
                block = []
        if block:
            yield from self.tokenize_batch(block)
