"""Synthesize larger training corpora (the reference's data/train-85k.json
is a missing blob in this environment — BASELINE config[1] needs a
comparable-scale corpus).

Builds an N-sentence corpus by resampling train-5K sentences and
recombining their word sequences with a seeded RNG — word-level statistics
(Zipf shape, character inventory) stay realistic while sentences are
unique. Deterministic for a given seed.

Usage: python tools/gen_corpus.py [n_sentences] [out.json]
"""
import json
import random
import sys


def build(n_sentences: int, seed: int = 0):
    with open("/root/reference/data/train-5K.json") as f:
        base = json.load(f)
    rng = random.Random(seed)
    words = [w for s in base for w in s.split()]
    out = []
    for i in range(n_sentences):
        if rng.random() < 0.5:
            out.append(rng.choice(base))
        else:
            k = rng.randrange(4, 18)
            start = rng.randrange(0, max(len(words) - k, 1))
            out.append(" ".join(words[start:start + k]))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 85_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "data/train-85k.json"
    corpus = build(n)
    import os
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(corpus, f, ensure_ascii=False)
    nbytes = sum(len(s.encode()) for s in corpus)
    print(f"wrote {len(corpus)} sentences ({nbytes/1e6:.1f} MB) "
          f"to {out_path}")
