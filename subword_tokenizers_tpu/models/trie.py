"""Array-form vocabulary tries for the device WordPiece encoders.

Two structures, both built on the host as flat integer arrays and shipped
to the device (replicated — they are the "model state" of WordPiece
inference):

- :class:`MatchTrie` — plain prefix trie over the vocabulary, used by the
  batched greedy longest-match encoder (NaiveWP semantics, reference:
  source/wordpiece.py:131-158).
- :class:`E2ETrie` — the LinMaxMatch end-to-end trie with failure links and
  failure pops (FastWP semantics). The construction mirrors the observable
  behavior of the reference's ``WPTrie_E2E.precompute``
  (source/utils.py:66-139): level-order processing, is_end nodes fail to
  the "##" node with a single pop, other nodes accumulate pops along the
  parent's failure chain, and — the E2E twist — any node whose character
  is non-alphanumeric (Python ``isalnum``) has its failure link overridden
  to a dedicated punctuation root.

Transitions are stored as a sorted i64 key array ``(node << 21) | codepoint``
with parallel child array — device lookup is one ``searchsorted`` per step.
Codepoints fit 21 bits (max 0x10FFFF).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Tuple

import numpy as np

from ..frontend.charclass import ALNUM_PY

CP_BITS = 21

NO_NODE = -1

MAX_CP = 0x110000


def _dense_tables(children: List[Dict[int, int]]
                  ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Dense transition table + codepoint→alphabet-id map.

    The trie's edge alphabet is small (the distinct characters of the
    vocabulary), so transitions become a single gather
    ``goto[node, alpha[cp]]`` on device — the per-step cost that dominates
    the scan automatons. Column ``A`` (the OOV class) is all -1.

    Returns (goto i32[n_nodes, A+1], alpha i32[MAX_CP], A).
    """
    alphabet = sorted({cp for ch in children for cp in ch})
    A = len(alphabet)
    alpha = np.full(MAX_CP, A, dtype=np.int32)
    for i, cp in enumerate(alphabet):
        alpha[cp] = i
    goto = np.full((len(children), A + 1), NO_NODE, dtype=np.int32)
    for node, ch in enumerate(children):
        for cp, child in ch.items():
            goto[node, alpha[cp]] = child
    return goto, alpha, A


def _pack_edges(children: List[Dict[int, int]]) -> Tuple[np.ndarray, np.ndarray]:
    keys, vals = [], []
    for node, ch in enumerate(children):
        for cp, child in ch.items():
            keys.append((node << CP_BITS) | cp)
            vals.append(child)
    keys = np.asarray(keys, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.int32)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


@dataclass
class MatchTrie:
    """Prefix trie: greedy longest-match state machine data."""

    edge_keys: np.ndarray   # i64[n_edges], sorted (node<<21)|cp
    edge_vals: np.ndarray   # i32[n_edges]
    accept: np.ndarray      # i32[n_nodes], output token id or -1
    n_nodes: int
    goto: np.ndarray        # i32[n_nodes, n_alpha+1] dense transitions
    alpha: np.ndarray       # i32[MAX_CP] codepoint -> alphabet id (OOV=A)
    n_alpha: int

    @classmethod
    def build(cls, vocab: Iterable[str], out_table) -> "MatchTrie":
        """``out_table``: SymbolTable interning output token strings."""
        children: List[Dict[int, int]] = [{}]
        accept: List[int] = [NO_NODE]
        for tok in vocab:
            node = 0
            for c in tok:
                cp = ord(c)
                nxt = children[node].get(cp)
                if nxt is None:
                    nxt = len(children)
                    children[node][cp] = nxt
                    children.append({})
                    accept.append(NO_NODE)
                node = nxt
            accept[node] = out_table.intern(tok)
        keys, vals = _pack_edges(children)
        goto, alpha, n_alpha = _dense_tables(children)
        return cls(edge_keys=keys, edge_vals=vals,
                   accept=np.asarray(accept, dtype=np.int32),
                   n_nodes=len(children), goto=goto, alpha=alpha,
                   n_alpha=n_alpha)


@dataclass
class E2ETrie:
    """LinMaxMatch trie with failure links/pops (FastWP, E2E semantics)."""

    edge_keys: np.ndarray    # i64[n_edges], sorted
    edge_vals: np.ndarray    # i32[n_edges]
    fail: np.ndarray         # i32[n_nodes], NO_NODE = no failure link
    pops_off: np.ndarray     # i32[n_nodes+1] CSR offsets into pops_flat
    pops_flat: np.ndarray    # i32[total_pops] output token ids
    root: int                # = 0
    root_p: int
    root_sharp: int
    n_nodes: int
    goto: np.ndarray         # i32[n_nodes, n_alpha+1] dense transitions
    alpha: np.ndarray        # i32[MAX_CP] codepoint -> alphabet id (OOV=A)
    n_alpha: int
    has_ws_token: bool       # any vocab token contains a whitespace char
                             # (breaks whitespace-chunk decomposition)

    @classmethod
    def build(cls, vocab: Iterable[str], out_table) -> "E2ETrie":
        # Node 0 = root. root_p is a standalone node with no edges.
        children: List[Dict[int, int]] = [{}]
        parent: List[int] = [NO_NODE]
        char: List[int] = [NO_NODE]
        is_end: List[bool] = [False]
        strings: List[str] = [""]

        def insert(word: str) -> int:
            node = 0
            for c in word:
                cp = ord(c)
                nxt = children[node].get(cp)
                if nxt is None:
                    nxt = len(children)
                    children[node][cp] = nxt
                    children.append({})
                    parent.append(node)
                    char.append(cp)
                    is_end.append(False)
                    strings.append(strings[node] + c)
                node = nxt
            is_end[node] = True
            return node

        root_sharp = insert("##")
        for tok in vocab:
            insert(tok)
        root_p = len(children)
        children.append({})
        parent.append(NO_NODE)
        char.append(NO_NODE)
        is_end.append(False)
        strings.append("")

        n = len(children)
        fail = np.full(n, NO_NODE, dtype=np.int32)
        pops: List[List[int]] = [[] for _ in range(n)]

        # Level-order failure computation (parents strictly before children;
        # sibling order is immaterial to the result).
        queue = [0, root_sharp]
        head = 0
        while head < len(queue):
            cur = queue[head]
            head += 1
            for cp, child in children[cur].items():
                if child == root_sharp:
                    continue
                if is_end[child]:
                    fail[child] = root_sharp
                    pops[child] = [out_table.intern(strings[child])]
                else:
                    f = fail[cur]
                    acc: List[int] = []
                    while f != NO_NODE and cp not in children[f]:
                        acc.extend(pops[f])
                        f = fail[f]
                    if f != NO_NODE:
                        fail[child] = children[f][cp]
                        pops[child] = list(pops[cur]) + acc
                # E2E override: punctuation-char nodes fail to root_p
                # (reference: source/utils.py:134-138); pops are kept.
                if not ALNUM_PY[char[child]]:
                    fail[child] = root_p
                queue.append(child)

        keys, vals = _pack_edges(children)
        goto, alpha, n_alpha = _dense_tables(children)
        pops_off = np.zeros(n + 1, dtype=np.int32)
        flat: List[int] = []
        for i in range(n):
            flat.extend(pops[i])
            pops_off[i + 1] = len(flat)
        from ..frontend.charclass import WS_PY
        has_ws = any(WS_PY[cp] for ch in children for cp in ch)
        return cls(edge_keys=keys, edge_vals=vals, fail=fail,
                   pops_off=pops_off,
                   pops_flat=np.asarray(flat, dtype=np.int32),
                   root=0, root_p=root_p, root_sharp=root_sharp, n_nodes=n,
                   goto=goto, alpha=alpha, n_alpha=n_alpha,
                   has_ws_token=has_ws)

    @property
    def max_pops(self) -> int:
        if self.n_nodes == 0:
            return 0
        return int(np.max(self.pops_off[1:] - self.pops_off[:-1]))
