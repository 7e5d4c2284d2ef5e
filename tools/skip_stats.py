#!/usr/bin/env python3
"""Overflow-trigger statistics for the deferred-compaction window.

Runs train-5K@1000 as flat_train_steps blocks with ``count_ovf=True``
(CPU) and reports how many steps had to compact in-step because a live
gap outgrew the window — the trigger rate decides the window size /
scheduled-compaction trade. Usage: skip_stats.py [skip [K]]
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from subword_tokenizers_tpu.core.corpus import (build_bpe_corpus,  # noqa: E402
                                                unique_words)
from subword_tokenizers_tpu.core.symbols import SymbolTable  # noqa: E402
from subword_tokenizers_tpu.models.bpe import NaiveBPE  # noqa: E402
from subword_tokenizers_tpu.ops.flat import build_flat  # noqa: E402
from subword_tokenizers_tpu.ops.train_loop import (flat_train_steps,  # noqa: E402
                                                   pow_tables, str_hashes)

skip = int(sys.argv[1]) if len(sys.argv) > 1 else 12
K = int(sys.argv[2]) if len(sys.argv) > 2 else 128

with open("/root/reference/data/train-5K.json") as f:
    corpus = json.load(f)
tok = NaiveBPE()
wb = tok.preprocessing_batch(corpus)
words, freq, _ = unique_words(wb)
table = SymbolTable()
arrs = build_bpe_corpus(words, freq, table)
fs0, wid0, wgt0 = build_flat(np.asarray(arrs.sym), np.asarray(arrs.freq),
                             w32=True)
n0 = len(table)
sym_cap = 1000 + 8
h1 = np.zeros(sym_cap, dtype=np.int64)
h2 = np.zeros(sym_cap, dtype=np.int64)
sl = np.zeros(sym_cap, dtype=np.int64)
for i, s in enumerate(table.strings()):
    h1[i], h2[i] = str_hashes(s)
    sl[i] = len(s)
pw1, pw2 = pow_tables(64)
sh1, sh2 = str_hashes("##")

carry = (jnp.asarray(fs0), jnp.asarray(wid0), jnp.asarray(wgt0),
         jnp.zeros(sym_cap + 1, dtype=jnp.int32),
         jnp.asarray(h1), jnp.asarray(h2), jnp.asarray(sl),
         jnp.int32(n0), jnp.int32(n0))
total = {"steps": 0, "ovf": 0}
blocks = []
while total["steps"] < 1000:
    st, recs = flat_train_steps(
        *carry, jnp.asarray(pw1), jnp.asarray(pw2), sh1, sh2,
        jnp.int32(1000), K=K, narrow=True, sym_cap=sym_cap,
        wordpiece=False, w32=True, skip=skip, count_ovf=True)
    recs = jax.device_get(recs)
    active = recs["active"]
    n = int(active.sum())
    o = int(recs["ovf"][: n].sum()) if skip else 0
    blocks.append({"steps": n, "ovf": o})
    total["steps"] += n
    total["ovf"] += o
    carry = st[:9]
    if n < K:
        break
print(json.dumps({"skip": skip, "K": K, "total": total,
                  "blocks": blocks}))
