"""Bisect the compact-fetch encode path on the pure-CPU backend.

r3 CPU-child numbers regressed after compact fetch landed for all three
batched encoders (fastbpe 9.60 -> 5.75 MB/s, naivewp 17.3 -> 15.3; VERDICT
r3 weak #3). Hypothesis: the on-device stream compaction (scatter+cumsum)
+ single stacked program only pays where a high-latency transfer link
exists; on the local CPU backend it is pure overhead versus the legacy
sliced path.

Times FastBPE / NaiveWP / FastWP tokenize_batch on the bench corpus
(pan_tadeusz x16) with the compact path enabled vs force-disabled.

    JAX_PLATFORMS=cpu python tools/compact_bisect.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from subword_tokenizers_tpu import FastBPE, FastWP, NaiveWP  # noqa: E402

REPLICAS = 16


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    with open("/root/reference/data/pan_tadeusz.json") as f:
        corpus = json.load(f)
    big = [f"w{k} {s}" for k in range(REPLICAS) for s in corpus]
    nbytes = sum(len(s.encode()) for s in big)

    for cls, res in ((FastBPE, "FastBPE"), (NaiveWP, "NaiveWordPiece"),
                     (FastWP, "FastWordPiece")):
        tok = cls()
        tok.load_resources(f"/root/reference/resources/pretrained/{res}")
        want = tok.tokenize_batch(big)  # warm (compact on)
        t_on = best_of(lambda: tok.tokenize_batch(big))

        tok2 = cls()
        tok2.load_resources(f"/root/reference/resources/pretrained/{res}")
        if cls is FastWP:
            tok2._run_e2e_compact = lambda *a, **k: None
        else:
            tok2._encode_unique_compact = lambda *a, **k: None
        got = tok2.tokenize_batch(big)
        assert got == want, f"{res}: legacy path diverged"
        t_off = best_of(lambda: tok2.tokenize_batch(big))
        print(f"{res}: compact {nbytes/t_on/1e6:6.2f} MB/s  "
              f"legacy {nbytes/t_off/1e6:6.2f} MB/s  "
              f"(compact/legacy {t_off/t_on:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
