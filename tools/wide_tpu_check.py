#!/usr/bin/env python3
"""Wide-path (>=2^16-symbol-id keys) training on the TPU itself.

VERDICT r2 #6: the i64 wide path used to fail to *compile* on this TPU
(emulated i64 cumsum, scoped-VMEM OOM at corpus sizes) and was routed to
the CPU backend. With the weight dtype decoupled (w32: i32 weights under
i64 keys — ops/pairstats docstring) the wide step should compile and run
on-chip. This tool executes K fused WordPiece merge steps at train-5K
scale with narrow=False, w32=True on the default backend and prints the
per-step merge records; run it once under JAX_PLATFORMS=cpu and once on
the TPU and diff the outputs (they must be bit-identical).

Usage: python tools/wide_tpu_check.py [K] [--bpe]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from subword_tokenizers_tpu import NaiveWP
    from subword_tokenizers_tpu.core.corpus import (build_wp_corpus,
                                                    unique_words)
    from subword_tokenizers_tpu.core.symbols import SymbolTable
    from subword_tokenizers_tpu.ops.flat import build_flat
    from subword_tokenizers_tpu.ops.train_loop import (_cand_cap,
                                                       flat_train_steps,
                                                       pow_tables,
                                                       str_hashes)

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    wordpiece = "--bpe" not in sys.argv

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr, flush=True)

    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)
    tok = NaiveWP()
    wb = tok.preprocessing_batch(corpus)
    words, freq, _ = unique_words(wb)
    table = SymbolTable()
    arrays = build_wp_corpus(words, freq, table)

    narrow = False          # forced wide keys
    w32 = True              # i32 weights (total-5K ~ 4.4e5 << 2^31)
    sym_cap = 1 << 17       # force a >=2^16 symbol-id space
    n0 = len(table)

    fs, wid, wgt = build_flat(arrays.sym, arrays.freq, w32=True)
    sfreq = np.zeros(sym_cap + 1, dtype=np.int32)
    np.add.at(sfreq, np.where(fs >= 0, fs, sym_cap),
              np.where(fs >= 0, wgt, 0).astype(np.int32))

    h1 = np.zeros(sym_cap, dtype=np.int64)
    h2 = np.zeros(sym_cap, dtype=np.int64)
    sl = np.zeros(sym_cap, dtype=np.int64)
    for i, s in enumerate(table.strings()):
        h1[i], h2[i] = str_hashes(s)
        sl[i] = len(s)
    pw1, pw2 = pow_tables(arrays.sym.shape[1] + 4)
    sh1, sh2 = str_hashes("##")
    cand_cap = _cand_cap(fs.size - 1)

    t0 = time.perf_counter()
    state, recs = flat_train_steps(
        jnp.asarray(fs), jnp.asarray(wid), jnp.asarray(wgt),
        jnp.asarray(sfreq), jnp.asarray(h1), jnp.asarray(h2),
        jnp.asarray(sl), jnp.int32(n0), jnp.int32(n0),
        jnp.asarray(pw1), jnp.asarray(pw2), sh1, sh2,
        jnp.int32(n0 + K + 8), K, narrow, sym_cap, wordpiece, cand_cap,
        False, w32)
    recs = jax.device_get(recs)
    t1 = time.perf_counter()
    # warm second block timing
    state2, recs2 = flat_train_steps(
        jnp.asarray(fs), jnp.asarray(wid), jnp.asarray(wgt),
        jnp.asarray(sfreq), jnp.asarray(h1), jnp.asarray(h2),
        jnp.asarray(sl), jnp.int32(n0), jnp.int32(n0),
        jnp.asarray(pw1), jnp.asarray(pw2), sh1, sh2,
        jnp.int32(n0 + K + 8), K, narrow, sym_cap, wordpiece, cand_cap,
        False, w32)
    recs2 = jax.device_get(recs2)
    t2 = time.perf_counter()
    assert all(np.array_equal(recs[k], recs2[k]) for k in recs), \
        "nondeterministic records"

    out = [{k: int(recs[k][i]) for k in ("a", "b", "new_id", "matched",
                                         "active")} for i in range(K)]
    print(json.dumps({"backend": jax.default_backend(), "K": K,
                      "wordpiece": wordpiece,
                      "cold_s": round(t1 - t0, 3),
                      "warm_s": round(t2 - t1, 3),
                      "records": out}))


if __name__ == "__main__":
    main()
