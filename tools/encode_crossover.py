#!/usr/bin/env python3
"""Encode-executor crossover study (VERDICT r2 next #1).

Measures, on the CURRENT backend, everything needed to decide whether the
TPU can win the FastWP batched encode or the remote link is binding:

1. loop-overhead anatomy: trivial-body while_loop vs fori_loop vs
   deeper-unrolled while (per-trip ms) — the scan is suspected to be
   bound by a fixed per-trip cost, not per-element work;
2. the REAL e2e scan (wp_e2e_scan_u16) on pretrained-20k trie over the
   85k corpus' unique chunks: per-slice wall at 8192/32768/65536 rows
   (row-amortization of the per-trip cost), plus the host<->device
   transfer costs (device_put of a slice, device_get of its outputs);
3. end-to-end tokenize_batch wall on the 85k corpus with the executor
   pinned via SWT_CPU_DISPATCH_SLOTS.

Run once with JAX_PLATFORMS=cpu and once with the TPU
(env -u JAX_PLATFORMS, PYTHONPATH incl. /root/.axon_site); each prints
one JSON dict. Compare side by side.

Usage: python tools/encode_crossover.py [--quick]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def _bench(fn, reps=5):
    import jax
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def loop_anatomy(res):
    import jax
    import jax.numpy as jnp

    N = 256
    x0 = jnp.zeros((8192,), jnp.int32)

    @jax.jit
    def wl(x):
        def b(st):
            c, x = st
            return c + 1, x + c
        return jax.lax.while_loop(lambda st: st[0] < N, b, (0, x))

    @jax.jit
    def fl(x):
        def b(c, x):
            return x + c
        return jax.lax.fori_loop(0, N, b, x)

    @jax.jit
    def wl_u16(x):
        def b(st):
            c, x = st
            for _ in range(16):
                c, x = c + 1, x + c
            return c, x
        return jax.lax.while_loop(lambda st: st[0] < N, b, (0, x))

    res["while_256trips_ms"] = _bench(lambda: wl(x0)) * 1e3
    res["fori_256trips_ms"] = _bench(lambda: fl(x0)) * 1e3
    res["while_unroll16_256trips_ms"] = _bench(lambda: wl_u16(x0)) * 1e3


def real_scan(res, quick=False):
    import jax
    import jax.numpy as jnp

    from subword_tokenizers_tpu import FastWP
    from subword_tokenizers_tpu._native import binding
    from subword_tokenizers_tpu.ops.wp_encode_e2e import (pack_node_info,
                                                          wp_e2e_scan_u16)

    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    trie, _ = tok._trie()
    n_pops = max(trie.max_pops, 1)
    sharp_seq = tok._sharp_seq if tok._sharp_seq is not None else (-2,)

    with open(os.path.join(os.path.dirname(__file__), "..",
                           "data/train-85k.json")) as f:
        corpus = json.load(f)
    binding._load()
    prep = binding.encode_prep(corpus)
    inverse, bounds, uniq_buf, uniq_off, uniq_len = prep
    Lc = -(-(int(uniq_len.max()) + 2) // 8) * 8
    mat16 = binding.pack_u16_rows(uniq_buf, uniq_off, uniq_len, Lc,
                                  trie.alpha)
    uslen = (uniq_len + 1).astype(np.int32)
    res["n_uniq_chunks"] = int(uslen.size)
    res["Lc"] = Lc

    order = np.argsort(uslen, kind="stable")
    mat_s = mat16[order]
    len_s = uslen[order]

    node_info = pack_node_info(trie.fail, trie.pops_off, trie.pops_flat,
                               n_pops)
    info_d = jnp.asarray(node_info)
    goto_d = jnp.asarray(trie.goto)
    jax.block_until_ready((info_d, goto_d))

    rows_list = [8192] if quick else [8192, 32768, 65536]
    for R in rows_list:
        if R > len_s.size:
            continue
        # middle-of-distribution slice (median lengths)
        s0 = (len_s.size // 2 // R) * R
        sl_mat = mat_s[s0:s0 + R]
        sl_len = len_s[s0:s0 + R]
        # column-trim to the slice's own max length + 2
        w = -(-(int(sl_len.max()) + 2) // 8) * 8
        sl_mat = np.ascontiguousarray(sl_mat[:, :min(w, sl_mat.shape[1])])

        put = _bench(lambda: jnp.asarray(sl_mat))
        md = jnp.asarray(sl_mat)
        ld = jnp.asarray(sl_len)
        jax.block_until_ready((md, ld))

        def scan():
            return wp_e2e_scan_u16(md, ld, goto_d, info_d, trie.root_p,
                                   trie.root_sharp, tok._unk_id,
                                   sharp_seq, n_pops)
        t_scan = _bench(scan, reps=3 if quick else 5)
        out = scan()
        jax.block_until_ready(out)
        t_get = _bench(lambda: jax.device_get(out), reps=3)
        res[f"slice{R}_put_ms"] = put * 1e3
        res[f"slice{R}_scan_ms"] = t_scan * 1e3
        res[f"slice{R}_get_ms"] = t_get * 1e3
        res[f"slice{R}_maxlen"] = int(sl_len.max())

    # end-to-end wall with the executor pinned to THIS backend
    nbytes = sum(len(s.encode("utf-8")) for s in corpus)
    tok.tokenize_batch(corpus[:2000])  # warm shapes
    tok.tokenize_batch(corpus)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        tok.tokenize_batch(corpus)
        best = min(best, time.perf_counter() - t0)
    res["e2e_85k_s"] = best
    res["e2e_85k_MBps"] = nbytes / best / 1e6


def main():
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    quick = "--quick" in sys.argv
    res = {"backend": jax.default_backend(),
           "dispatch_slots": os.environ.get("SWT_CPU_DISPATCH_SLOTS")}
    print(f"backend: {jax.default_backend()} {jax.devices()}",
          file=sys.stderr, flush=True)
    loop_anatomy(res)
    print(f"loop anatomy done: {res}", file=sys.stderr, flush=True)
    real_scan(res, quick)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
