#!/usr/bin/env python3
"""Headline benchmark: FastWP end-to-end encode throughput (MB/s).

Measures the batched device path (front end + unique-chunk dedup +
trie-scan automaton) over the conformance corpus, replicated with unique
markers (so sentence caching cannot fire) to amortize dispatch, after a
warmup run that triggers compilation. Verifies bit-exactness against the
golden token streams before timing — a wrong tokenizer is not a fast
tokenizer.

The default TPU backend's remote XLA compiles occasionally take tens of
minutes; the driver wrapper (`main`) runs the measurement in a subprocess
with a watchdog and falls back to the CPU jax backend (still measured
against the same 1-CPU-core reference baseline) rather than hang.

Prints ONE JSON line:
  {"metric": "fastwp_encode_MBps", "value": N, "unit": "MB/s",
   "vs_baseline": N}

Baseline: reference FastWP on 1 CPU core = 1.463 MB/s (BASELINE.md).
"""
import json
import os
import subprocess
import sys
import time

BASELINE_MBPS = 1.463
REPLICAS = 16
TPU_TIMEOUT_S = 1800
CPU_TIMEOUT_S = 600


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure():
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)

    from subword_tokenizers_tpu import FastWP

    with open("/root/reference/data/pan_tadeusz.json") as f:
        corpus = json.load(f)
    with open("/root/reference/data/pan_tadeusz.tokens.json") as f:
        golden = json.load(f)["FastWordPiece"]

    tok = FastWP()
    tok.load_resources("/root/reference/resources/pretrained/FastWordPiece")

    log(f"devices: {jax.devices()}")

    # Conformance gate + compile warmup.
    t0 = time.perf_counter()
    out = tok.tokenize_batch(corpus)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.2f}s")
    exact = sum(1 for a, b in zip(out, golden) if a == b)
    log(f"conformance: {exact}/{len(corpus)} sentences exact")
    assert exact == len(corpus), "conformance failure — refusing to bench"

    # Replicate with a per-replica marker word so every sentence is
    # unique — sentence-level caching must not fire; word-level Zipf
    # repetition (which dedup legitimately exploits) is preserved.
    big = [f"w{k} {s}" for k in range(REPLICAS) for s in corpus]
    nbytes = sum(len(s.encode("utf-8")) for s in big)
    tok.tokenize_batch(big)  # second warmup at the benchmark shape

    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        tok.tokenize_batch(big)
        dt = time.perf_counter() - t0
        log(f"trial {trial}: {dt:.3f}s  ({nbytes / dt / 1e6:.2f} MB/s)")
        best = min(best, dt)

    mbps = nbytes / best / 1e6
    print(json.dumps({
        "metric": "fastwp_encode_MBps",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 2),
    }))


def _run_child(backend: str, timeout_s: int):
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            env=env, timeout=timeout_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        log(f"[bench] {backend} measurement timed out after {timeout_s}s")
        return None
    sys.stderr.write(proc.stderr)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return line
    log(f"[bench] {backend} measurement failed "
        f"(exit {proc.returncode})")
    return None


def main():
    if "--measure" in sys.argv:
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
        measure()
        return
    line = _run_child("default", TPU_TIMEOUT_S)
    if line is None:
        log("[bench] falling back to the CPU jax backend")
        line = _run_child("cpu", CPU_TIMEOUT_S)
    if line is None:
        raise SystemExit("benchmark failed on every backend")
    print(line)


if __name__ == "__main__":
    main()
