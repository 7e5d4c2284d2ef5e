#!/usr/bin/env python3
"""Driver benchmark: encode + training throughput vs the reference.

Emits one JSON line per metric, each conformance-gated before timing (a
wrong tokenizer is not a fast tokenizer); the headline FastWP encode line
prints LAST:

  {"metric": "<name>", "value": N, "unit": "MB/s", "vs_baseline": N}

Structure (r4 — built so a driver kill at ANY point leaves valid output):
- The TPU child runs FIRST (the persistent .jax_cache/ makes its compiles
  warm); the CPU child runs second and fills in / beats whatever it can.
- Each child appends finished metrics to a results file; the parent polls
  that file WHILE the child runs and streams every new best-so-far metric
  straight to stdout — tail-parseable at any kill point.
- Children inherit stderr (no capture_output buffering).
- Expensive tail metrics (8k / 32k trains) are budget-gated inside the
  child via a deadline env var so they cannot starve the rest.

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
  naivewp_train_8k_MBps    vs tools/baseline_host2.jsonl (same config,
                                        WordPiece — the WP scale axis)
  naivebpe_train_32k_MBps  vs reference throughput on its 500-merge 85k
                           anchor run (tools/ref_anchor_85k.py) — the
                           reference only gets FASTER per byte at fewer
                           merges, so this baseline flatters the
                           reference, not us
  fastwp_encode_MBps       vs 1.154   (headline)
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
    "naivewp_train_8k_MBps": None,       # requires the host2 WP 8k run
    "naivebpe_train_32k_MBps": None,     # requires the host2 anchor run
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
    "ref_NaiveWordPiece_train_8000_t5k2500": "naivewp_train_8k_MBps",
    "ref_NaiveBPE_train_85k_500": "naivebpe_train_32k_MBps",
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

# Final emission order; the headline must be the last line on stdout.
ORDER = ["fastbpe_encode_MBps", "naivebpe_encode_MBps",
         "naivewp_encode_MBps", "naivebpe_train_MBps",
         "naivewp_train_MBps", "naivebpe_train_8k_MBps",
         "naivewp_train_8k_MBps", "naivebpe_train_32k_MBps",
         "fastwp_encode_85k_MBps", "fastwp_encode_MBps"]
REPLICAS = 16
# Parent wall budget. The driver's own timeout is unknown but killed a
# ~4500 s r3 run; streaming means a kill loses nothing measured, this
# just decides how the parent splits time between the two children.
TOTAL_BUDGET_S = int(os.environ.get("SWT_BENCH_BUDGET_S", "3300"))
CPU_RESERVE_S = 700    # kept back for the CPU child
CPU_MIN_S = 300


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ----------------------------------------------------------------- child

# Set once at measure() start: was the persistent XLA compile cache empty
# (a genuinely cold run pays 3-7 min per distinct jit shape through the
# remote-compile tunnel — its numbers are not comparable to warm ones and
# the record must say so).
_COLD = [False]


def _cache_is_cold() -> bool:
    try:
        return not any(os.scandir(os.path.join(ROOT, ".jax_cache")))
    except OSError:
        return True


def _phase_split():
    """Per-phase wall totals (ms) accumulated since the last profiling
    reset, condensed for the metric record — this is what makes a
    bad-link day distinguishable from a real regression in the artifact
    itself (the two link phases are scan_fetch/fetch_records + the put
    inside scan_dispatch; host work is native_prep/pack_u16/stitch)."""
    from subword_tokenizers_tpu.benchmarks import profiling
    if not profiling.enabled():
        return None
    out = {}
    for k, v in profiling.report().items():
        short = k.split(".", 1)[-1]
        out[short] = round(out.get(short, 0.0) + v["total_s"] * 1e3, 1)
    return out or None


def _emit(results_path, name, mbps, phases=None):
    base = BASELINES.get(name)
    rec = {"metric": name, "value": round(mbps, 3 if mbps >= 0.01 else 6),
           "unit": "MB/s",
           "vs_baseline": round(mbps / base, 2) if base else None}
    if phases:
        rec["phases_ms"] = phases
    if _COLD[0]:
        rec["cold"] = True
    with open(results_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"[bench] {rec}")


def _deadline():
    v = os.environ.get("SWT_BENCH_CHILD_DEADLINE")
    return float(v) if v else time.time() + 86400


def _remaining():
    return _deadline() - time.time()


def _time_best(fn, trials):
    """Best wall time over ``trials`` runs + the best run's phase split
    (per-trial profiling reset, so the split describes exactly the run
    whose number is recorded)."""
    from subword_tokenizers_tpu.benchmarks import profiling
    best = float("inf")
    best_ph = None
    for t in range(trials):
        if profiling.enabled():
            profiling.reset()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            best_ph = _phase_split()
    return best, best_ph


def _bench_encode(results_path, name, tok_cls, res_name, corpus, golden,
                  trials=6):
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
    best, ph = _time_best(lambda: tok.tokenize_batch(big), trials)
    _emit(results_path, name, nbytes / best / 1e6, phases=ph)


def _bench_train(results_path, name, tok_cls, corpus, nbytes, check,
                 warm, max_vocab=1000):
    from subword_tokenizers_tpu.benchmarks import profiling
    tok = tok_cls()
    if warm:
        tok.train(corpus, max_vocab)  # compile warmup (same shapes)
        check(tok)
    if profiling.enabled():
        profiling.reset()
    t0 = time.perf_counter()
    tok.train(corpus, max_vocab)
    dt = time.perf_counter() - t0
    ph = _phase_split()
    check(tok)
    _emit(results_path, name, nbytes / dt / 1e6, phases=ph)


def measure(results_path):
    import jax
    _COLD[0] = _cache_is_cold()
    if _COLD[0]:
        log("[bench] persistent compile cache is EMPTY — this is a COLD "
            "run; records will carry \"cold\": true")
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

    # Headline first so any later kill still has it on record.
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

    # Large-corpus FastWP encode: 7.4 MB — the device-bound regime where
    # the compact-fetch TPU path must beat (or expose the link bound vs)
    # the host executor. Conformance: batch output spot-checked against
    # the host scan. Runs right after the trains so the TPU child records
    # it even under a tight budget.
    big_path = os.path.join(ROOT, "data/train-85k.json")
    if os.path.isfile(big_path) and _remaining() > 240:
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
        best, ph = _time_best(lambda: tok.tokenize_batch(big), 3)
        _emit(results_path, "fastwp_encode_85k_MBps", nbytes / best / 1e6,
              phases=ph)
        phase_report("fastwp_encode_85k")

    # Remaining encoders on the conformance corpus.
    _bench_encode(results_path, "fastbpe_encode_MBps", FastBPE,
                  "FastBPE", corpus, golden["FastBPE"])
    _bench_encode(results_path, "naivewp_encode_MBps", NaiveWP,
                  "NaiveWordPiece", corpus, golden["NaiveWordPiece"])
    _bench_encode(results_path, "naivebpe_encode_MBps", NaiveBPE,
                  "NaiveBPE", corpus, golden["NaiveBPE"])

    # Scale training: train-5K[:2500] @ vocab 8000 (the deep-vocab golden
    # config, tests/golden/t5k2500_v8000_merges.json). Budget-gated: the
    # reference takes 647 s at this config on this host
    # (BASELINE.host2.md); our CPU run costs ~340 s, the TPU run a warmup
    # + timed pair.
    t25 = train5k[:2500]
    t25_bytes = sum(len(s.encode("utf-8")) for s in t25)
    need_8k = 420 if on_cpu else 600
    if _remaining() > need_8k:
        with open(os.path.join(ROOT, "tests/golden/"
                               "t5k2500_v8000_merges.json")) as f:
            gold_8k = [tuple(p) for p in json.load(f)]

        def check_8k(tok):
            assert tok.merges_list == gold_8k, \
                "naivebpe_train_8k: merges diverge from golden — refusing"

        _bench_train(results_path, "naivebpe_train_8k_MBps", NaiveBPE,
                     t25, t25_bytes, check_8k, warm=not on_cpu,
                     max_vocab=8000)
        phase_report("naivebpe_train_8k")
    else:
        log(f"[bench] skipping naivebpe_train_8k "
            f"({_remaining():.0f}s left < {need_8k}s)")

    # WordPiece at the same scale config (VERDICT r4 ask #4: the WP
    # machinery that only matters at depth — 128-bit scorer, candidate
    # cap, prefilter — previously had no driver-captured scale number).
    # Golden-gated on the reference-generated 8k vocab; baseline-gated on
    # the same-host reference measurement (tools/rebaseline_wp8k.py).
    need_wp8k = 700 if on_cpu else 600
    if BASELINES.get("naivewp_train_8k_MBps") and _remaining() > need_wp8k:
        with open(os.path.join(ROOT, "tests/golden/"
                               "t5k2500_v8000_wp_vocab.json")) as f:
            gold_wp8k = set(json.load(f))

        def check_wp8k(tok):
            assert tok.vocab == gold_wp8k, \
                "naivewp_train_8k: vocab diverges from golden — refusing"

        _bench_train(results_path, "naivewp_train_8k_MBps", NaiveWP,
                     t25, t25_bytes, check_wp8k, warm=not on_cpu,
                     max_vocab=8000)
        phase_report("naivewp_train_8k")
    else:
        log(f"[bench] skipping naivewp_train_8k (baseline="
            f"{BASELINES.get('naivewp_train_8k_MBps')} "
            f"remaining={_remaining():.0f}s)")

    # North-star scale config (BASELINE.md configs[4] vocab axis):
    # NaiveBPE @ 32k vocab on the 7.4 MB 85k corpus. TPU only (the CPU
    # backend takes tens of minutes here), budget-gated, and
    # ground-truth-gated: the first merges must equal the reference
    # anchor golden produced by tools/ref_anchor_85k.py.
    anchor = None
    import glob
    hits = sorted(glob.glob(os.path.join(
        ROOT, "tests/golden/t85k_v*_merges.json")))
    if hits:
        with open(hits[-1]) as f:
            anchor = [tuple(p) for p in json.load(f)]
    if (not on_cpu and anchor and os.path.isfile(big_path)
            and BASELINES.get("naivebpe_train_32k_MBps")
            and _remaining() > 600):
        with open(big_path) as f:
            big = json.load(f)
        big_bytes = sum(len(s.encode("utf-8")) for s in big)

        def check_32k(tok):
            n = len(anchor)
            assert [tuple(p) for p in tok.merges_list[:n]] == anchor, \
                "naivebpe_train_32k: diverges from reference anchor"

        _bench_train(results_path, "naivebpe_train_32k_MBps", NaiveBPE,
                     big, big_bytes, check_32k, warm=True,
                     max_vocab=32_000)
        phase_report("naivebpe_train_32k")
    elif not on_cpu:
        log(f"[bench] skipping naivebpe_train_32k (anchor={bool(anchor)} "
            f"baseline={BASELINES.get('naivebpe_train_32k_MBps')} "
            f"remaining={_remaining():.0f}s)")


# ---------------------------------------------------------------- parent

def _read_results(path):
    out = {}
    if os.path.isfile(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        # Torn tail line (the child is mid-append): skip;
                        # the next poll re-reads it complete. Raising here
                        # would hit _run_child's supervision except-branch
                        # and KILL a healthy child.
                        continue
                    out[rec["metric"]] = rec
    return out


class _Stream:
    """Best-so-far metric set, streamed to stdout the moment a child
    lands a new or improved number — the driver takes the last stdout
    line, so output is valid at any kill point."""

    def __init__(self):
        self.best = {}

    def absorb(self, path):
        for m, rec in _read_results(path).items():
            cur = self.best.get(m)
            if cur is None or rec["value"] > cur["value"]:
                self.best[m] = rec
                print(json.dumps(rec), flush=True)


def _run_child(backend: str, timeout_s: float, results_path: str,
               stream: _Stream):
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    else:
        if env.get("JAX_PLATFORMS") == "axon":
            # The shell profile exports JAX_PLATFORMS=axon, but the axon
            # plugin registers its platform as 'tpu' (observed after the
            # r3 host/plugin update) — the stale name makes jax fail at
            # backend init. Unset and let jax auto-pick the TPU.
            del env["JAX_PLATFORMS"]
    # Every child profiles: the per-phase split rides inside each metric
    # record (phases_ms), so a bad-link day is distinguishable from a
    # real regression in the artifact itself (VERDICT r4 ask #5).
    env.setdefault("SWT_PROFILE", "1")
    env["SWT_BENCH_CHILD_DEADLINE"] = str(time.time() + timeout_s)
    log(f"[bench] {backend} child: budget {timeout_s:.0f}s")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure",
         results_path],
        env=env, cwd=ROOT, stdout=subprocess.DEVNULL)  # stderr inherited
    t_end = time.time() + timeout_s + 60  # grace over the child's gate
    try:
        while proc.poll() is None:
            stream.absorb(results_path)
            if time.time() > t_end:
                proc.kill()
                log(f"[bench] {backend} child killed after "
                    f"{timeout_s:.0f}s (keeping completed metrics)")
                break
            time.sleep(1.0)
        proc.wait(timeout=30)
    except Exception as e:
        log(f"[bench] {backend} child supervision error: {e}")
        proc.kill()
    stream.absorb(results_path)
    if proc.returncode not in (0, None):
        log(f"[bench] {backend} child exited {proc.returncode}")


def main():
    if "--measure" in sys.argv:
        if os.environ.get("JAX_PLATFORMS") == "cpu":
            import jax
            jax.config.update("jax_platforms", "cpu")
        measure(sys.argv[sys.argv.index("--measure") + 1])
        return
    t_start = time.time()
    deadline = t_start + TOTAL_BUDGET_S
    stream = _Stream()
    with tempfile.TemporaryDirectory() as td:
        # Both executors measure every metric (each conformance-gated);
        # the best wins per metric. Training wins on the TPU (~60x the
        # reference); small-batch encode is latency-bound and wins on
        # the host cores. TPU child runs FIRST: its compiles are warm
        # via the persistent .jax_cache/, its numbers are the point of
        # the framework, and streaming means nothing is lost if the
        # caller's budget expires during the CPU child.
        tpu_budget = max(300.0, deadline - time.time() - CPU_RESERVE_S)
        _run_child("default", tpu_budget, os.path.join(td, "tpu.jsonl"),
                   stream)
        cpu_budget = max(CPU_MIN_S, deadline - time.time())
        _run_child("cpu", cpu_budget, os.path.join(td, "cpu.jsonl"),
                   stream)
    results = stream.best
    if "fastwp_encode_MBps" not in results:
        raise SystemExit("benchmark failed on every backend")
    # Final canonical block, headline last (repeats are fine — the
    # driver takes the last line).
    for m in ORDER:
        if m in results:
            print(json.dumps(results[m]), flush=True)


if __name__ == "__main__":
    main()
