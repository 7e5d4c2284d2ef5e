#!/usr/bin/env python3
"""Driver benchmark: encode + training throughput vs the reference.

Emits one JSON line per metric, each conformance-gated before timing (a
wrong tokenizer is not a fast tokenizer); the headline FastWP encode line
prints LAST:

  {"metric": "<name>", "value": N, "unit": "MB/s", "vs_baseline": N}

Baselines are SAME-HOST: tools/baseline_host2.jsonl holds the reference
implementation re-measured on this host by tools/rebaseline.py (the
container was rescheduled onto slower hardware in round 2, so the
original BASELINE.md numbers — kept as fallback constants — would
overstate vs_baseline for train and understate it for encode).

Metrics (reference baselines on the current host, BASELINE.host2.md):
  fastbpe_encode_MBps      vs 0.273   (pan_tadeusz x16, pretrained 20k)
  naivebpe_encode_MBps     vs 0.000479
  naivewp_encode_MBps      vs 0.627
  fastwp_encode_85k_MBps   vs 1.398   (7.4 MB corpus — device-bound regime)
  naivebpe_train_MBps      vs 0.002808 (train-5K @ vocab 1000, 183.5 s)
  naivewp_train_MBps       vs 0.002096 (train-5K @ vocab 1000, 246.0 s)
  naivebpe_train_8k_MBps   vs 0.000362 (train-5K[:2500] @ vocab 8000,
                                        647.4 s — the scale config)
  fastwp_encode_MBps       vs 1.154   (headline)

The default TPU backend's remote XLA compiles can take minutes per
program; the child process appends each finished metric to a results file
so a watchdog timeout keeps completed TPU numbers, and a CPU-backend
child fills in whatever is missing.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

# Original-host fallbacks (BASELINE.md) — overridden below by the
# same-host measurements when tools/baseline_host2.jsonl exists.
BASELINES = {
    "fastwp_encode_MBps": 1.463,
    "fastwp_encode_85k_MBps": 1.463,
    "fastbpe_encode_MBps": 0.569,
    "naivebpe_encode_MBps": 0.001,
    "naivewp_encode_MBps": 1.249,
    "naivebpe_train_MBps": 484493 / 120.65 / 1e6,
    "naivewp_train_MBps": 484493 / 179.01 / 1e6,
    "naivebpe_train_8k_MBps": 0.000362,  # measured on host2 only
}

_REBASE_MAP = {
    "ref_FastWordPiece_encode": "fastwp_encode_MBps",
    "ref_FastWordPiece_encode_85k": "fastwp_encode_85k_MBps",
    "ref_FastBPE_encode": "fastbpe_encode_MBps",
    "ref_NaiveBPE_encode": "naivebpe_encode_MBps",
    "ref_NaiveWordPiece_encode": "naivewp_encode_MBps",
    "ref_NaiveBPE_train_1000": "naivebpe_train_MBps",
    "ref_NaiveWordPiece_train_1000": "naivewp_train_MBps",
    "ref_NaiveBPE_train_8000_t5k2500": "naivebpe_train_8k_MBps",
}


def _load_same_host_baselines():
    path = os.path.join(ROOT, "tools/baseline_host2.jsonl")
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                name = _REBASE_MAP.get(rec.get("metric"))
                if name and rec.get("MBps"):
                    BASELINES[name] = rec["MBps"]
    except OSError:
        pass


_load_same_host_baselines()

# Emission order; the headline must be the last line on stdout.
ORDER = ["fastbpe_encode_MBps", "naivebpe_encode_MBps",
         "naivewp_encode_MBps", "naivebpe_train_MBps",
         "naivewp_train_MBps", "naivebpe_train_8k_MBps",
         "fastwp_encode_85k_MBps", "fastwp_encode_MBps"]
REPLICAS = 16
TPU_TIMEOUT_S = 3000
CPU_TIMEOUT_S = 1500


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _emit(results_path, name, mbps):
    rec = {"metric": name, "value": round(mbps, 3 if mbps >= 0.01 else 6),
           "unit": "MB/s",
           "vs_baseline": round(mbps / BASELINES[name], 2)}
    with open(results_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"[bench] {rec}")


def _time_best(fn, trials):
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _bench_encode(results_path, name, tok_cls, res_name, corpus, golden,
                  trials=3):
    from subword_tokenizers_tpu import TOKENIZERS  # noqa: F401
    tok = tok_cls()
    tok.load_resources(
        f"/root/reference/resources/pretrained/{res_name}")
    out = tok.tokenize_batch(corpus)  # warmup + conformance
    exact = sum(1 for a, b in zip(out, golden) if a == b)
    assert exact == len(corpus), \
        f"{name}: conformance {exact}/{len(corpus)} — refusing to bench"
    big = [f"w{k} {s}" for k in range(REPLICAS) for s in corpus]
    nbytes = sum(len(s.encode("utf-8")) for s in big)
    tok.tokenize_batch(big)  # warmup at benchmark shape
    best = _time_best(lambda: tok.tokenize_batch(big), trials)
    _emit(results_path, name, nbytes / best / 1e6)


def _bench_train(results_path, name, tok_cls, corpus, nbytes, check,
                 warm):
    tok = tok_cls()
    if warm:
        tok.train(corpus, 1000)  # compile warmup (same shapes)
        check(tok)
    t0 = time.perf_counter()
    tok.train(corpus, 1000)
    dt = time.perf_counter() - t0
    check(tok)
    _emit(results_path, name, nbytes / dt / 1e6)


def measure(results_path):
    import jax
    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)

    from subword_tokenizers_tpu import FastBPE, FastWP, NaiveBPE, NaiveWP
    from subword_tokenizers_tpu.benchmarks import profiling

    # SWT_PROFILE=1: per-phase wall-clock report (front end / pack / scan /
    # stitch, device block / record fetch / shrink) to stderr after each
    # metric. SWT_TRACE=<dir>: jax.profiler trace of the headline encode.
    def phase_report(tag):
        if profiling.enabled():
            log(f"[bench] phases after {tag}:\n" + profiling.report_str())
            profiling.reset()

    with open("/root/reference/data/pan_tadeusz.json") as f:
        corpus = json.load(f)
    with open("/root/reference/data/pan_tadeusz.tokens.json") as f:
        golden = json.load(f)

    on_cpu = jax.default_backend() == "cpu"
    log(f"devices: {jax.devices()}")

    # Headline first so a watchdog timeout still captures it.
    import contextlib
    trace_dir = os.environ.get("SWT_TRACE")
    with (profiling.trace(trace_dir) if trace_dir
          else contextlib.nullcontext()):
        _bench_encode(results_path, "fastwp_encode_MBps", FastWP,
                      "FastWordPiece", corpus, golden["FastWordPiece"])
    phase_report("fastwp_encode")

    # Training (train-5K @ vocab 1000, golden-fixture-gated).  On the TPU
    # backend a warmup run absorbs compilation (the reference pays no
    # compiles); on CPU compilation is a negligible fraction and one run
    # suffices within the watchdog budget.
    with open("/root/reference/data/train-5K.json") as f:
        train5k = json.load(f)
    t5k_bytes = os.path.getsize("/root/reference/data/train-5K.json")
    with open(os.path.join(ROOT, "tests/golden/"
                           "train5k_v1000_merges.json")) as f:
        gold_merges = [tuple(p) for p in json.load(f)]
    with open(os.path.join(ROOT, "tests/golden/"
                           "train5k_v1000_wp_vocab.json")) as f:
        gold_vocab = set(json.load(f))

    def check_bpe(tok):
        assert tok.merges_list == gold_merges, \
            "naivebpe_train: merges diverge from golden — refusing"

    def check_wp(tok):
        assert tok.vocab == gold_vocab, \
            "naivewp_train: vocab diverges from golden — refusing"

    _bench_train(results_path, "naivebpe_train_MBps", NaiveBPE, train5k,
                 t5k_bytes, check_bpe, warm=not on_cpu)
    phase_report("naivebpe_train")
    _bench_train(results_path, "naivewp_train_MBps", NaiveWP, train5k,
                 t5k_bytes, check_wp, warm=not on_cpu)
    phase_report("naivewp_train")

    # Remaining encoders on the conformance corpus.
    _bench_encode(results_path, "fastbpe_encode_MBps", FastBPE,
                  "FastBPE", corpus, golden["FastBPE"])
    _bench_encode(results_path, "naivewp_encode_MBps", NaiveWP,
                  "NaiveWordPiece", corpus, golden["NaiveWordPiece"])
    _bench_encode(results_path, "naivebpe_encode_MBps", NaiveBPE,
                  "NaiveBPE", corpus, golden["NaiveBPE"])

    # Large-corpus FastWP encode: 7.4 MB — the device-bound regime.
    # Conformance: batch output spot-checked against the host scan.
    big_path = os.path.join(ROOT, "data/train-85k.json")
    if os.path.isfile(big_path):
        with open(big_path) as f:
            big = json.load(f)
        tok = FastWP()
        tok.load_resources(
            "/root/reference/resources/pretrained/FastWordPiece")
        out = tok.tokenize_batch(big[:2000])  # warmup shape subset
        import random
        idx = random.Random(0).sample(range(2000), 50)
        for i in idx:
            assert out[i] == tok.tokenize(big[i]), \
                "fastwp_85k: batch/host divergence — refusing to bench"
        nbytes = sum(len(s.encode("utf-8")) for s in big)
        tok.tokenize_batch(big)  # full-shape warmup
        best = _time_best(lambda: tok.tokenize_batch(big), 2)
        _emit(results_path, "fastwp_encode_85k_MBps", nbytes / best / 1e6)

    # Scale training: train-5K[:2500] @ vocab 8000 (the deep-vocab golden
    # config, tests/golden/t5k2500_v8000_merges.json). Runs LAST so a
    # watchdog timeout keeps every other metric; the reference takes
    # 647 s at this config on this host (BASELINE.host2.md).
    with open(os.path.join(ROOT, "tests/golden/"
                           "t5k2500_v8000_merges.json")) as f:
        gold_8k = [tuple(p) for p in json.load(f)]
    t25 = train5k[:2500]
    t25_bytes = sum(len(s.encode("utf-8")) for s in t25)

    def check_8k(tok):
        assert tok.merges_list == gold_8k, \
            "naivebpe_train_8k: merges diverge from golden — refusing"

    tok = NaiveBPE()
    if not on_cpu:
        tok.train(t25, 8000)  # compile warmup (same shapes)
        check_8k(tok)
    t0 = time.perf_counter()
    tok.train(t25, 8000)
    dt = time.perf_counter() - t0
    check_8k(tok)
    _emit(results_path, "naivebpe_train_8k_MBps", t25_bytes / dt / 1e6)
    phase_report("naivebpe_train_8k")


def _read_results(path):
    out = {}
    if os.path.isfile(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    out[rec["metric"]] = rec
    return out


def _run_child(backend: str, timeout_s: int, results_path: str):
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    elif env.get("JAX_PLATFORMS") == "axon":
        # The shell profile exports JAX_PLATFORMS=axon, but the axon
        # plugin registers its platform as 'tpu' (observed after the r3
        # host/plugin update) — the stale name makes jax fail at backend
        # init. Unset and let jax auto-pick the TPU.
        del env["JAX_PLATFORMS"]
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure",
             results_path],
            env=env, timeout=timeout_s, capture_output=True, text=True,
            cwd=ROOT)
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            log(f"[bench] {backend} child exited {proc.returncode}")
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else \
                e.stderr.decode(errors="replace")
            sys.stderr.write(err[-4000:])
        log(f"[bench] {backend} measurement timed out after {timeout_s}s "
            f"(keeping completed metrics)")
    return _read_results(results_path)


def main():
    if "--measure" in sys.argv:
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
        measure(sys.argv[sys.argv.index("--measure") + 1])
        return
    with tempfile.TemporaryDirectory() as td:
        # Both executors measure every metric (each conformance-gated);
        # the best wins per metric. Training wins on the TPU (~70x the
        # reference); the encode scan is latency-bound and wins on the
        # host cores — and the default (axon) process AOT-compiles even
        # its CPU executables with mismatched machine features, so the
        # pure-CPU child is the honest host number. CPU runs FIRST: it
        # always completes, so a full metric set exists even if the
        # caller's budget expires while the TPU child is absorbing cold
        # remote compiles (~6 min/program when the persistent cache was
        # lost, e.g. after a container reschedule).
        cpu_res = _run_child("cpu", CPU_TIMEOUT_S,
                             os.path.join(td, "cpu.jsonl"))
        tpu_res = _run_child("default", TPU_TIMEOUT_S,
                             os.path.join(td, "tpu.jsonl"))
        results = dict(cpu_res)
        for m, rec in tpu_res.items():
            if m not in results or rec["value"] > results[m]["value"]:
                results[m] = rec
    if "fastwp_encode_MBps" not in results:
        raise SystemExit("benchmark failed on every backend")
    for m in ORDER:
        if m in results:
            print(json.dumps(results[m]))


if __name__ == "__main__":
    main()
