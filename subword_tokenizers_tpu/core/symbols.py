"""Deterministic string↔id interning for the device pipeline.

The reference operates on Python strings (symbols such as ``"a"``, ``"ab"``,
``"##xyz"``); the device operates on i32 ids. This table is the bridge. It
must evolve identically on every host: ids are assigned in first-intern
order, and the trainers intern in an order derived only from reduction
results (never from local shard order), so the mapping is reproducible.

A subtle conformance point it handles (reference: source/bpe.py:103,
source/wordpiece.py:96): the reference's ``vocab`` is a *set of strings*, so
two different merges producing the same string do not grow the vocabulary,
and the merged symbol is *identical* to the existing one for all later pair
counting. Interning by string reproduces that unification exactly.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional


class SymbolTable:
    """Append-only intern table mapping symbol strings to dense i32 ids."""

    __slots__ = ("_ids", "_strings")

    def __init__(self, strings: Optional[Iterable[str]] = None) -> None:
        self._ids: Dict[str, int] = {}
        self._strings: List[str] = []
        if strings is not None:
            for s in strings:
                self.intern(s)

    def intern(self, s: str) -> int:
        """Return the id of ``s``, assigning the next id if unseen."""
        sid = self._ids.get(s)
        if sid is None:
            sid = len(self._strings)
            self._ids[s] = sid
            self._strings.append(s)
        return sid

    def get(self, s: str) -> Optional[int]:
        return self._ids.get(s)

    def __contains__(self, s: str) -> bool:
        return s in self._ids

    def __len__(self) -> int:
        return len(self._strings)

    def string(self, sid: int) -> str:
        return self._strings[sid]

    def strings(self) -> List[str]:
        return list(self._strings)
