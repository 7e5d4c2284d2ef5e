#!/usr/bin/env python3
"""Append the reference NaiveWordPiece train-5K[:2500]@8000 baseline to
tools/baseline_host2.jsonl (the WP scale config; VERDICT r4 ask #4).

Same methodology as tools/rebaseline.py (reference wall time of train(),
source/benchmarks.py:221-237), run standalone because this single config
costs ~tens of minutes of reference CPU time. Also verifies the produced
vocabulary against the checked-in golden so a silently-divergent baseline
can never be recorded.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
from ref_oracle import make_reference  # noqa: E402

OUT = os.path.join(ROOT, "tools", "baseline_host2.jsonl")


def main():
    with open("/root/reference/data/train-5K.json") as f:
        t5k = json.load(f)
    t25 = t5k[:2500]
    nbytes = sum(len(s.encode("utf-8")) for s in t25)
    with open(os.path.join(ROOT,
                           "tests/golden/t5k2500_v8000_wp_vocab.json")) as f:
        gold = set(json.load(f))

    tok = make_reference("NaiveWordPiece")
    t0 = time.perf_counter()
    tok.train(t25, 8000)
    dt = time.perf_counter() - t0
    assert set(tok.vocab) == gold, "reference vocab != checked-in golden"
    rec = {"metric": "ref_NaiveWordPiece_train_8000_t5k2500",
           "seconds": round(dt, 2), "bytes": nbytes,
           "MBps": round(nbytes / dt / 1e6, 6),
           "result_size": len(tok.vocab)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
