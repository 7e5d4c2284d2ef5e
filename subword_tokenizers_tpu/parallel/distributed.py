"""Multi-host initialization and conventions.

A multi-host training job is the same program on every host:

    from subword_tokenizers_tpu.parallel import distributed, mesh
    distributed.initialize()                    # jax.distributed handshake
    m = mesh.make_data_mesh()                   # all chips of all hosts
    tok = NaiveBPE(mesh=m)
    tok.train(corpus, max_vocab)                # identical on every host
    if distributed.is_coordinator():
        tok.save_resources(path)                # host-0 writes

Determinism note (SURVEY.md §5): every reduction in parallel/train.py is
order-invariant (integer sums, min/max with globally-defined keys), so all
hosts compute identical merge sequences without any coordination beyond
the collectives themselves; resources are written by host 0 only, by
convention.
"""
from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` passthrough (no-op if already up or
    running single-process)."""
    import jax
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        # Already initialized (or single-process context).
        pass


def is_coordinator() -> bool:
    import jax
    return jax.process_index() == 0


def fetch_global(arr):
    """Materialize a (possibly cross-process sharded) jax array on host.

    Single-process shardings fetch directly; multi-process shardings
    all-gather the remote shards first (every host gets the full array —
    the corpus-state view is small relative to training)."""
    import numpy as np
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(arr.sharding.mesh, PartitionSpec())
    return np.asarray(jax.jit(lambda x: x, out_shardings=rep)(arr))


def process_count() -> int:
    import jax
    return jax.process_count()
