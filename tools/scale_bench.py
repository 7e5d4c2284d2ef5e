"""Scale benchmarks: BASELINE configs [1] and [4] shaped runs.

- FastBPE trained on the 85k-sentence corpus (7.4 MB) to 8k vocab, then
  batch-tokenization of the full corpus (config[1]; data/train-85k.json is
  synthesized — the reference's blob is missing in this environment).
- NaiveBPE trained to 32k vocab on the same corpus (config[4]'s vocab
  scale, single chip; the multi-host reduction itself is validated on the
  virtual CPU mesh in tests/test_parallel.py).

Run in background; each new shape costs minutes of XLA compile.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)


def main():
    from subword_tokenizers_tpu import FastBPE, NaiveBPE

    print("devices:", jax.devices(), flush=True)
    with open("data/train-85k.json") as f:
        corpus = json.load(f)
    nbytes = sum(len(s.encode()) for s in corpus)
    print(f"corpus: {len(corpus)} sentences, {nbytes/1e6:.1f} MB",
          flush=True)

    tok = FastBPE()
    t0 = time.time()
    tok.train(corpus, 8_000)
    dt = time.time() - t0
    print(f"FastBPE train @8k vocab: {dt:.1f}s "
          f"({nbytes/dt/1e6:.3f} MB/s; {len(tok.merges_list)} merges)",
          flush=True)

    t0 = time.time()
    out = tok.tokenize_batch(corpus)
    dt = time.time() - t0
    ntok = sum(len(t) for t in out)
    print(f"FastBPE batch-tokenize 85k corpus (cold): {dt:.1f}s "
          f"({nbytes/dt/1e6:.2f} MB/s, {ntok/dt/1e6:.2f} Mtok/s)",
          flush=True)
    t0 = time.time()
    out = tok.tokenize_batch(corpus)
    dt = time.time() - t0
    print(f"FastBPE batch-tokenize (warm): {dt:.1f}s "
          f"({nbytes/dt/1e6:.2f} MB/s, {ntok/dt/1e6:.2f} Mtok/s)",
          flush=True)

    big = NaiveBPE()
    t0 = time.time()
    big.train(corpus, 32_000)
    dt = time.time() - t0
    print(f"NaiveBPE train @32k vocab: {dt:.1f}s "
          f"({len(big.merges_list)} merges, "
          f"{nbytes/dt/1e6:.3f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
