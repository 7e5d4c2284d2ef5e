"""Generate deep-vocab golden training fixtures by running the REFERENCE
implementation (via tests/ref_oracle) on the pan_tadeusz corpus.

The round-1 goldens top out at vocab 1000 (train-5K) and fuzz at ~110;
these fixtures pin the 2.5k-vocab regime where the i32 narrow path, the
fused hash-interning loop, and deep merge chains actually operate.

Usage: python tools/gen_deep_golden.py [--vocab N] [--train5k M]
(takes minutes to tens of minutes — the reference's trainer is
O(vocab * corpus)). Default: vocab 2500 on pan_tadeusz (989 sentences);
``--train5k M`` switches the corpus to the first M sentences of
train-5K.json (fixture prefix ``t5k<M>``) for vocab depths pan_tadeusz's
word-type count cannot reach.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    from ref_oracle import make_reference

    vocab = 2500
    if "--vocab" in sys.argv:
        vocab = int(sys.argv[sys.argv.index("--vocab") + 1])
    if "--train5k" in sys.argv:
        m = int(sys.argv[sys.argv.index("--train5k") + 1])
        with open("/root/reference/data/train-5K.json") as f:
            corpus = json.load(f)[:m]
        prefix = f"t5k{m}"
    else:
        with open("/root/reference/data/pan_tadeusz.json") as f:
            corpus = json.load(f)
        prefix = "pt989"

    out_dir = os.path.join(ROOT, "tests", "golden")

    t0 = time.time()
    ref_bpe = make_reference("NaiveBPE")
    ref_bpe.train(corpus, vocab)
    print(f"reference BPE: {len(ref_bpe.merges_list)} merges, "
          f"{time.time()-t0:.1f}s", flush=True)
    with open(os.path.join(out_dir, f"{prefix}_v{vocab}_merges.json"), "w",
              encoding="utf-8") as f:
        json.dump(ref_bpe.merges_list, f, ensure_ascii=False)

    t0 = time.time()
    ref_wp = make_reference("NaiveWordPiece")
    ref_wp.train(corpus, vocab)
    print(f"reference WP: vocab {len(ref_wp.vocab)}, "
          f"{time.time()-t0:.1f}s", flush=True)
    with open(os.path.join(out_dir, f"{prefix}_v{vocab}_wp_vocab.json"), "w",
              encoding="utf-8") as f:
        json.dump(sorted(ref_wp.vocab), f, ensure_ascii=False)


if __name__ == "__main__":
    main()
