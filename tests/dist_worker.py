"""Worker program for tests/test_distributed.py — one training process.

Usage: python dist_worker.py <process_id> <num_processes> <port> <outdir>

Each process sees 4 virtual CPU devices (8 global over 2 processes),
initializes jax.distributed, trains NaiveBPE over the full 8-device mesh
(corpus sharded across *all* processes' devices, collectives over Gloo),
checks bit-identity with in-process single-device training, and writes
resources only from the coordinator (host-0-writes convention,
parallel/distributed.py).
"""
import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from subword_tokenizers_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert distributed.is_coordinator() == (pid == 0)

    from subword_tokenizers_tpu import NaiveBPE
    from subword_tokenizers_tpu.parallel.mesh import make_data_mesh

    corpus = [
        "Litwo! Ojczyzno moja! ty jesteś jak zdrowie.",
        "Ile cię trzeba cenić, ten tylko się dowie,",
        "Kto cię stracił. Dziś piękność twą w całej ozdobie",
        "Widzę i opisuję, bo tęsknię po tobie.",
    ]

    mesh = make_data_mesh()  # all devices of all processes
    tok = NaiveBPE(mesh=mesh)
    tok.train(corpus, 120)

    single = NaiveBPE()
    single.train(corpus, 120)
    assert tok.merges_list == single.merges_list, \
        f"proc {pid}: multi-process merges diverged"

    # Host-0-writes convention; every process records what it decided.
    if distributed.is_coordinator():
        tok.save_resources(os.path.join(outdir, "resources"))
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"wrote": distributed.is_coordinator(),
                   "n_merges": len(tok.merges_list)}, f)
    print(f"proc {pid}: OK ({len(tok.merges_list)} merges)", flush=True)


if __name__ == "__main__":
    main()
