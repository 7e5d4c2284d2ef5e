"""32k-vocab sharded-vs-single-device training equivalence.

Trains NaiveBPE on train-5K to ``--max_vocab`` (default 32000 — the
BASELINE north-star vocab) twice on the CPU backend: once on an 8-virtual-
device 'data' mesh through the tiered two-phase reduction
(parallel/train.py), once single-device through the fused loop — and
asserts the merge lists are bit-identical. Reports how many steps each
reduction tier settled (certificate-proven top-K / exact compacted-runs /
full gather).

Runtime: tens of minutes on CPU (the sharded side is one host round trip
per merge step). Run in the background:

    python tools/sharded_equiv.py [--max_vocab 32000] [--wordpiece]
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    import json

    from subword_tokenizers_tpu import NaiveBPE, NaiveWP
    from subword_tokenizers_tpu.parallel.mesh import make_data_mesh

    max_vocab = 32000
    if "--max_vocab" in sys.argv:
        max_vocab = int(sys.argv[sys.argv.index("--max_vocab") + 1])
    wordpiece = "--wordpiece" in sys.argv
    cls = NaiveWP if wordpiece else NaiveBPE

    with open("/root/reference/data/train-5K.json") as f:
        corpus = json.load(f)

    t0 = time.perf_counter()
    single = cls()
    single.train(corpus, max_vocab)
    t_single = time.perf_counter() - t0
    n_single = (len(single.merges_list) if not wordpiece
                else len(single.vocab))
    print(f"single-device: {t_single:.1f}s ({n_single} "
          f"{'merges' if not wordpiece else 'vocab'})", flush=True)

    mesh = make_data_mesh(8)
    t0 = time.perf_counter()
    sharded = cls(mesh=mesh)
    sharded.train(corpus, max_vocab)
    t_shard = time.perf_counter() - t0
    stats = getattr(sharded, "_sel_stats", None)
    print(f"sharded (8 virtual devices): {t_shard:.1f}s  tiers={stats}",
          flush=True)

    if wordpiece:
        assert sharded.vocab == single.vocab, "vocab sets diverge"
    else:
        assert sharded.merges_list == single.merges_list, \
            "merge lists diverge"
    print(f"EQUIVALENT: sharded == single-device bit-for-bit at "
          f"max_vocab={max_vocab}", flush=True)


if __name__ == "__main__":
    main()
