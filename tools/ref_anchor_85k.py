"""One-time ground-truth anchor for the synthesized 85k scale corpus.

Runs the *reference* NaiveBPE trainer (/root/reference/source/bpe.py:50-112,
via the tests/ref_oracle.py HF shim) on data/train-85k.json to
``base_vocab + N_MERGES`` and saves the resulting ordered merge list as
``tests/golden/t85k_v<max_vocab>_merges.json``.

The framework's 8k/32k scale runs (tools/scale_bench.py) are then
prefix-asserted against this golden, anchoring the whole scale table to the
genuine reference semantics instead of self-consistency alone (VERDICT r3
missing #2).

Takes ~25-30 min of single-core CPU (the reference counts pairs per token
occurrence per merge step) — run in background:

    python tools/ref_anchor_85k.py
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

N_MERGES = 500


def main():
    from ref_oracle import make_reference

    with open(os.path.join(ROOT, "data/train-85k.json")) as f:
        corpus = json.load(f)

    ref = make_reference("NaiveBPE")
    # The reference grows vocab from the corpus's unique chars; compute the
    # base size with the same front end so max_vocab lands exactly
    # N_MERGES merges deep.
    processed = ref.preprocessing(corpus)
    base = len({ch for ex in processed for w, _ in ex for ch in w})
    max_vocab = base + N_MERGES
    print(f"corpus: {len(corpus)} sentences; base vocab {base}; "
          f"training reference NaiveBPE to max_vocab={max_vocab}",
          flush=True)

    t0 = time.time()
    ref.train(corpus, max_vocab)
    dt = time.time() - t0
    print(f"reference train: {dt:.1f}s, {len(ref.merges_list)} merges",
          flush=True)

    out = os.path.join(ROOT, "tests/golden",
                       f"t85k_v{max_vocab}_merges.json")
    merges = [list(p) for p in ref.merges_list]
    if os.path.isfile(out):
        with open(out) as f:
            prev = json.load(f)
        assert prev == merges, "reference rerun diverged from saved golden"
        print("rerun matches the saved golden bit-for-bit", flush=True)
    with open(out, "w") as f:
        json.dump(merges, f)
    print(f"saved {out}", flush=True)
    nbytes = sum(len(s.encode("utf-8")) for s in corpus)
    rec = {"metric": "ref_NaiveBPE_train_85k_500",
           "MBps": round(nbytes / dt / 1e6, 6), "seconds": round(dt, 1),
           "note": f"reference NaiveBPE, 85k corpus, {len(merges)} merges "
                   f"(tools/ref_anchor_85k.py); baseline for "
                   f"naivebpe_train_32k_MBps — the reference only gets "
                   f"faster per byte at fewer merges, so this flatters it"}
    print("baseline record (append to tools/baseline_host2.jsonl):",
          flush=True)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
