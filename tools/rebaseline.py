#!/usr/bin/env python3
"""Re-measure the reference implementation on the CURRENT host.

BASELINE.md was measured on the container's original host; the container
was rescheduled onto different hardware during round 2 (PERF.md "host
variance note"), so every `vs_baseline` ratio divided new-host numbers by
old-host baselines. This script re-runs the reference code at
/root/reference with its own benchmark methodology
(source/benchmarks.py:187-218 for tokenize, :221-237 for train) on
whatever host executes it, and appends results incrementally to a JSON
lines file so a timeout keeps completed metrics.

Usage:
    python tools/rebaseline.py [--out tools/baseline_host2.jsonl]
                               [--skip-train]

The companion `tools/render_baseline.py` turns the JSONL into
BASELINE.host2.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from ref_oracle import make_reference  # noqa: E402

REF = "/root/reference"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(out_path: str, name: str, **fields):
    rec = {"metric": name, **fields}
    with open(out_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"[rebaseline] {rec}")


def bench_encode(out_path, cli_name, corpus, nbytes, subset=None, tag=""):
    """Reference methodology: wall time over per-sentence tokenize calls
    (source/benchmarks.py:187-218)."""
    tok = make_reference(cli_name)
    tok.load_resources(os.path.join(REF, "resources/pretrained", cli_name))
    sents = corpus if subset is None else corpus[:subset]
    if subset is not None:
        nbytes = sum(len(s.encode("utf-8")) for s in sents)
    # one untimed pass (page-cache/alloc warmup; the reference is pure
    # Python, no JIT — this only removes cold-start noise)
    n_tokens = 0
    for s in sents[: min(50, len(sents))]:
        n_tokens += len(tok.tokenize(s))
    t0 = time.perf_counter()
    n_tokens = 0
    for s in sents:
        n_tokens += len(tok.tokenize(s))
    dt = time.perf_counter() - t0
    emit(out_path, f"ref_{cli_name}_encode{tag}",
         seconds=round(dt, 4), tokens=n_tokens, bytes=nbytes,
         tokens_per_s=round(n_tokens / dt, 1),
         MBps=round(nbytes / dt / 1e6, 6),
         sentences=len(sents))


def bench_train(out_path, cli_name, corpus, nbytes, max_vocab=1000):
    """Reference methodology: wall time of train()
    (source/benchmarks.py:221-237)."""
    tok = make_reference(cli_name)
    t0 = time.perf_counter()
    tok.train(corpus, max_vocab)
    dt = time.perf_counter() - t0
    n_items = (len(tok.merges_list) if hasattr(tok, "merges_list")
               else len(tok.vocab))
    emit(out_path, f"ref_{cli_name}_train_{max_vocab}",
         seconds=round(dt, 2), bytes=nbytes,
         MBps=round(nbytes / dt / 1e6, 6), result_size=n_items)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "baseline_host2.jsonl"))
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    if os.path.exists(args.out):
        os.rename(args.out, args.out + ".bak")

    with open(os.path.join(REF, "data/pan_tadeusz.json")) as f:
        pt = json.load(f)
    pt_bytes = sum(len(s.encode("utf-8")) for s in pt)
    emit(args.out, "host_info", cpu_count=os.cpu_count(),
         ts=time.strftime("%Y-%m-%d %H:%M:%S"))

    # Encoders (pretrained 20k vocab, conformance corpus).
    bench_encode(args.out, "FastWordPiece", pt, pt_bytes)
    bench_encode(args.out, "NaiveWordPiece", pt, pt_bytes)
    bench_encode(args.out, "FastBPE", pt, pt_bytes)
    bench_encode(args.out, "NaiveBPE", pt, pt_bytes, subset=100)

    # 85k corpus (7.4 MB) FastWP encode — the scale-encode baseline.
    big_path = os.path.join(os.path.dirname(__file__), "..",
                            "data/train-85k.json")
    if os.path.isfile(big_path):
        with open(big_path) as f:
            big = json.load(f)
        big_bytes = sum(len(s.encode("utf-8")) for s in big)
        bench_encode(args.out, "FastWordPiece", big, big_bytes, tag="_85k")

    if not args.skip_train:
        with open(os.path.join(REF, "data/train-5K.json")) as f:
            t5k = json.load(f)
        t5k_bytes = os.path.getsize(os.path.join(REF, "data/train-5K.json"))
        bench_train(args.out, "NaiveBPE", t5k, t5k_bytes)
        bench_train(args.out, "NaiveWordPiece", t5k, t5k_bytes)
    log("[rebaseline] done")


if __name__ == "__main__":
    main()
