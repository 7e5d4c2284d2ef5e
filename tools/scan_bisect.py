"""Bisect the TPU cost of the wp_e2e_scan automaton: time stripped
variants of the loop body to find which op class dominates.

Variants:
  full      — the real scan
  noscatter — emission scatter removed (out unchanged)
  nogoto    — goto-table gather replaced by a constant transition
  noinfo    — node_info gather replaced by constants
  empty     — body keeps only i/mode updates (floor: loop overhead)
  it        — report the actual iteration count the loop runs
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def build_inputs():
    from subword_tokenizers_tpu import FastWP
    from subword_tokenizers_tpu.frontend.charclass import PUNC_PY, WS_PY, \
        codepoints
    from subword_tokenizers_tpu.ops.wp_encode_e2e import pack_chars

    with open("/root/reference/data/pan_tadeusz.json") as f:
        corpus = json.load(f)
    big = [f"w{k} {s}" for k in range(16) for s in corpus]
    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")
    tok.tokenize_batch(big)  # warm + caches
    trie, _ = tok._trie()

    lowered = [s.lower() for s in big]
    joined = " ".join(lowered)
    flat = codepoints(joined)
    from subword_tokenizers_tpu._native import binding
    binding._load()
    inverse, chunk_start, uniq_start, uniq_len = binding.chunk_unique(flat)
    Lc = int(uniq_len.max()) + 2
    flatp = np.concatenate([flat, np.full(Lc, 32, np.uint32)])
    take = uniq_start[:, None] + np.arange(Lc, dtype=np.int64)[None, :]
    umask = np.arange(Lc, dtype=np.int32)[None, :] < uniq_len[:, None]
    umat = np.where(umask, flatp[take], np.uint32(32))
    pchar = pack_chars(trie.alpha[umat], WS_PY[umat], PUNC_PY[umat])
    slen = (uniq_len + 1).astype(np.int32)
    node_info, goto_dev = tok._packed_cache[1].get(None)
    sharp = tuple(tok._sharp_seq) if tok._sharp_seq else (-2,)
    return (tok, trie, jnp.asarray(pchar), jnp.asarray(slen), goto_dev,
            node_info, sharp)


def make_variant(which, root_p, root_sharp, unk_id, sharp_seq, n_pops):
    from subword_tokenizers_tpu.ops.wp_encode_e2e import (AID_MASK, PC_BIT,
                                                          PREV_PC_BIT,
                                                          SP_BIT,
                                                          NODE_INFO_POPS)

    @partial(jax.jit, static_argnames=())
    def scan(pchar, slen, goto_table, node_info):
        S, T = pchar.shape
        CAP = T + 4
        MAXITER = 6 * T + 64
        K = max(n_pops, len(sharp_seq), 1)
        MATCH, VALIDATE, SKIP1, SKIP2, DONE = (
            jnp.int32(i) for i in range(5))
        rows = jnp.arange(S, dtype=jnp.int32)
        sharp = jnp.asarray(sharp_seq + (0,) * (K - len(sharp_seq)),
                            jnp.int32)
        OUTW = CAP + 1

        def bnd_of(cw, i, sl):
            in_rng = i < sl
            cur = in_rng & (((cw & (SP_BIT | PC_BIT))) != 0)
            prev = (i > 0) & ((cw & PREV_PC_BIT) != 0)
            return prev | cur

        def cond(st):
            return jnp.any(st["mode"] != DONE) & (st["it"] < MAXITER)

        def body(st):
            i, node, mode = st["i"], st["node"], st["mode"]
            ptr, seg_ptr, ovf = st["ptr"], st["seg_ptr"], st["ovf"]
            cw = pchar[rows, jnp.minimum(i, T - 1)]
            aid = cw & AID_MASK
            if which == "noinfo":
                f = jnp.zeros_like(node) - 1
                cnt = jnp.zeros_like(node)
                info = None
            else:
                info = node_info[node]
                f = info[:, 0]
                cnt = info[:, 1]
            if which == "nogoto":
                child = jnp.where(aid < 40, node + 1, -1)
            else:
                child = goto_table[node, aid]

            m_act = mode == MATCH
            at_end = i >= slen
            step = m_act & ~at_end & (child >= 0)
            climb = m_act & ~at_end & (child < 0) & (f >= 0)
            to_val = m_act & (at_end | ((child < 0) & (f < 0)))

            v_act = mode == VALIDATE
            bnd = bnd_of(cw, i, slen)
            inval = v_act & ~bnd
            corner = v_act & ~inval & (node == root_sharp) & (ptr == seg_ptr)

            if which in ("noscatter", "empty"):
                out = st["out"]
                ptr_eff = ptr
                emit_cnt = jnp.where(climb, cnt, 0)
            else:
                ptr_eff = jnp.where(inval, seg_ptr, ptr)
                emit_cnt = jnp.where(climb, cnt,
                                     jnp.where(inval, 1,
                                               jnp.where(corner,
                                                         len(sharp_seq),
                                                         0)))
                cols = ptr_eff[:, None] + jnp.arange(K, jnp.int32)[None, :]
                jmask = (jnp.arange(K, jnp.int32)[None, :]
                         < emit_cnt[:, None])
                vals = jnp.where(
                    climb[:, None],
                    info[:, NODE_INFO_POPS:NODE_INFO_POPS + K],
                    jnp.where(inval[:, None], unk_id, sharp[None, :]))
                flat_idx = jnp.where(jmask & (cols < CAP),
                                     rows[:, None] * OUTW + cols, S * OUTW)
                out = st["out"].at[flat_idx.reshape(-1)].set(
                    jnp.where(jmask, vals, 0).reshape(-1), mode="drop")
                ovf = ovf | (jmask & (cols >= CAP)).any(axis=1)
            n_ptr = ptr_eff + emit_cnt

            n_node = jnp.where(step, child, jnp.where(climb, f, node))
            n_i = jnp.where(step, i + 1, i)
            n_mode = jnp.where(to_val, VALIDATE, mode)
            n_mode = jnp.where(v_act, SKIP1, n_mode)
            s1 = mode == SKIP1
            adv1 = s1 & (i < slen) & ~bnd
            n_i = jnp.where(adv1, i + 1, n_i)
            n_mode = jnp.where(s1 & ~adv1, SKIP2, n_mode)
            s2 = mode == SKIP2
            sp = (cw & SP_BIT) != 0
            adv2 = s2 & (i < slen) & sp
            n_i = jnp.where(adv2, i + 1, n_i)
            s2_done = s2 & ~adv2
            restart = s2_done & (i < slen)
            finish = s2_done & (i >= slen)
            n_node = jnp.where(restart, 0, n_node)
            n_seg = jnp.where(restart, n_ptr, seg_ptr)
            n_mode = jnp.where(restart, MATCH,
                               jnp.where(finish, DONE, n_mode))
            return {"i": n_i, "node": n_node, "mode": n_mode,
                    "ptr": n_ptr, "seg_ptr": n_seg, "out": out,
                    "ovf": ovf, "it": st["it"] + 1}

        zeros = jnp.zeros((S,), jnp.int32)
        init = {"i": zeros, "node": zeros,
                "mode": jnp.where(slen > 0, MATCH, DONE),
                "ptr": zeros, "seg_ptr": zeros,
                "out": jnp.zeros((S * OUTW,), jnp.int32),
                "ovf": jnp.zeros((S,), bool),
                "it": jnp.int32(0)}
        st = jax.lax.while_loop(cond, body, init)
        return st["ptr"], st["it"]

    return scan


def main():
    tok, trie, pchar, slen, goto_dev, node_info, sharp = build_inputs()
    n_pops = max(trie.max_pops, 1)
    print(f"backend={jax.default_backend()} S={pchar.shape[0]} "
          f"T={pchar.shape[1]} nodes={trie.goto.shape[0]}", flush=True)
    for which in ("full", "noscatter", "nogoto", "noinfo", "empty"):
        fn = make_variant(which, trie.root_p, trie.root_sharp,
                          tok._unk_id, sharp, n_pops)
        out = fn(pchar, slen, goto_dev, node_info)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(pchar, slen, goto_dev, node_info)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"  {which:10s} {best*1e3:8.2f} ms   iters={int(out[1])}",
              flush=True)


if __name__ == "__main__":
    main()
