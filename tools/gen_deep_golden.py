"""Generate deep-vocab golden training fixtures by running the REFERENCE
implementation (via tests/ref_oracle) on the pan_tadeusz corpus.

The round-1 goldens top out at vocab 1000 (train-5K) and fuzz at ~110;
these fixtures pin the 2.5k-vocab regime where the i32 narrow path, the
fused hash-interning loop, and deep merge chains actually operate.

Usage: python tools/gen_deep_golden.py  (takes a few minutes — the
reference's trainer is O(vocab * corpus)).
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

VOCAB = 2500


def main():
    from ref_oracle import make_reference

    with open("/root/reference/data/pan_tadeusz.json") as f:
        corpus = json.load(f)

    out_dir = os.path.join(ROOT, "tests", "golden")

    t0 = time.time()
    ref_bpe = make_reference("NaiveBPE")
    ref_bpe.train(corpus, VOCAB)
    print(f"reference BPE: {len(ref_bpe.merges_list)} merges, "
          f"{time.time()-t0:.1f}s", flush=True)
    with open(os.path.join(out_dir, f"pt989_v{VOCAB}_merges.json"), "w",
              encoding="utf-8") as f:
        json.dump(ref_bpe.merges_list, f, ensure_ascii=False)

    t0 = time.time()
    ref_wp = make_reference("NaiveWordPiece")
    ref_wp.train(corpus, VOCAB)
    print(f"reference WP: vocab {len(ref_wp.vocab)}, "
          f"{time.time()-t0:.1f}s", flush=True)
    with open(os.path.join(out_dir, f"pt989_v{VOCAB}_wp_vocab.json"), "w",
              encoding="utf-8") as f:
        json.dump(sorted(ref_wp.vocab), f, ensure_ascii=False)


if __name__ == "__main__":
    main()
