"""Phase breakdown of the FastWP batched encode path.

Times each stage of FastWP._tokenize_batch_chunked separately on the
bench corpus (pan_tadeusz x16 with marker words) so host/device balance
is visible per backend. Usage:

    python tools/profile_encode.py [--corpus 85k] [--replicas N]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from subword_tokenizers_tpu import FastWP
    from subword_tokenizers_tpu.frontend.charclass import (PUNC_PY, WS_PY,
                                                           codepoints)
    from subword_tokenizers_tpu.ops.wp_encode_e2e import pack_chars

    replicas = 16
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])
    if "--corpus" in sys.argv and \
            sys.argv[sys.argv.index("--corpus") + 1] == "85k":
        with open("data/train-85k.json") as f:
            corpus = json.load(f)
        replicas = 1
    else:
        with open("/root/reference/data/pan_tadeusz.json") as f:
            corpus = json.load(f)
    big = [f"w{k} {s}" for k in range(replicas) for s in corpus]
    nbytes = sum(len(s.encode("utf-8")) for s in big)

    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    tok.tokenize_batch(big)  # warm compile + caches

    import jax
    print(f"backend: {jax.default_backend()}  bytes: {nbytes}")

    def t(label, fn, n=3):
        best = float("inf")
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:28s} {best*1e3:9.1f} ms")
        return out, best

    total0 = time.perf_counter()
    tok.tokenize_batch(big)
    total = time.perf_counter() - total0
    print(f"  {'TOTAL tokenize_batch':28s} {total*1e3:9.1f} ms "
          f"({nbytes/total/1e6:.2f} MB/s)")

    # --- stage by stage (mirrors _tokenize_batch_chunked) ---
    S = len(big)
    (lowered, _) = t("lower", lambda: [s.lower() for s in big])
    (joined, _) = t("join", lambda: " ".join(lowered))
    (flat, _) = t("codepoints", lambda: codepoints(joined))
    sent_start = np.zeros(S, dtype=np.int64)
    lens = np.fromiter((len(s) for s in lowered), dtype=np.int64, count=S)
    np.cumsum(lens[:-1] + 1, out=sent_start[1:])

    from subword_tokenizers_tpu._native import binding
    binding._load()
    (res, _) = t("native chunk_unique",
                 lambda: binding.chunk_unique(flat))
    inverse, chunk_start, uniq_start, uniq_len = res
    print(f"  chunks={chunk_start.size} unique={uniq_start.size}")

    def build_umat():
        Lc = int(uniq_len.max()) + 2
        flatp = np.concatenate([flat, np.full(Lc, 32, np.uint32)])
        take = uniq_start[:, None] + np.arange(Lc, dtype=np.int64)[None, :]
        umask = (np.arange(Lc, dtype=np.int32)[None, :]
                 < uniq_len[:, None])
        return np.where(umask, flatp[take], np.uint32(32))
    (umat, _) = t("pad unique matrix", build_umat)
    uslen = uniq_len + 1

    sid = np.searchsorted(sent_start, chunk_start, side="right") - 1
    trie, out_table = tok._trie()
    (pchar, _) = t("pack_chars", lambda: pack_chars(
        trie.alpha[umat], WS_PY[umat], PUNC_PY[umat]))

    import jax.numpy as jnp
    from subword_tokenizers_tpu.ops.wp_encode_e2e import wp_e2e_scan
    node_info, goto_dev = tok._packed_cache[1].get(None)
    sharp_seq = tok._sharp_seq if tok._sharp_seq is not None else (-2,)
    n_pops = max(trie.max_pops, 1)
    slen32 = uslen.astype(np.int32)

    def scan():
        out = wp_e2e_scan(jnp.asarray(pchar), jnp.asarray(slen32),
                          goto_dev, node_info, trie.root_p,
                          trie.root_sharp, tok._unk_id,
                          tuple(sharp_seq), n_pops)
        jax.block_until_ready(out)
        return out
    (scanout, _) = t("device scan (blocking)", scan)

    (fetched, _) = t("device_get", lambda: jax.device_get(scanout))
    out, out_n, ovf, stuck, crash = fetched

    def stitch():
        width = max(int(out_n.max()), 1)
        o = out[:, :width]
        strs = np.asarray(out_table.strings(), dtype=object)
        toks = strs[o]
        counts = out_n.tolist()
        tok_rows = [toks[i, :counts[i]].tolist()
                    for i in range(len(counts))]
        from itertools import chain
        bounds = np.searchsorted(sid, np.arange(S + 1, dtype=sid.dtype))
        invs = inverse.tolist()
        getter = tok_rows.__getitem__
        return [list(chain.from_iterable(
            map(getter, invs[bounds[i]:bounds[i + 1]])))
            for i in range(S)]
    t("stitch (strings+concat)", stitch)

    # --- fused native path stages (the actual default path) ---
    try:
        from subword_tokenizers_tpu._native import binding
        binding._load()
    except Exception:
        return
    print("  --- fused native path ---")
    (prep, _) = t("native encode_prep", lambda: binding.encode_prep(big))
    if prep is None:
        print("  (case special present: fused path not applicable)")
        return
    finverse, fbounds, uniq_buf2, uniq_off2, uniq_len2 = prep
    Lc2 = -(-(int(uniq_len2.max()) + 2) // 8) * 8
    (mat16, _) = t("native pack_u16", lambda: binding.pack_u16_rows(
        uniq_buf2, uniq_off2, uniq_len2, Lc2, trie.alpha))
    uslen2 = (uniq_len2 + 1).astype(np.int32)

    def scan_fused():
        r = tok._run_e2e_prepacked(mat16, uslen2)
        return r
    (raw, _) = t("sliced scan (prepacked)", scan_fused)
    out_ids, out_ns, out_tab = raw
    strs2 = out_tab.strings()
    t("native stitch", lambda: binding.stitch(strs2, out_ids, out_ns,
                                              finverse, fbounds))


if __name__ == "__main__":
    main()
