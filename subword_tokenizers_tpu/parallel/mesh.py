"""Device mesh helpers for data-parallel training and encoding.

The framework's distribution model (SURVEY.md §2/§7): corpora shard across
chips along a 1-D ``data`` mesh axis; model state (merge tables, rank maps,
trie arrays) is replicated; the only cross-chip coupling is the per-step
global pair-frequency reduction. This works identically on 1 real chip, a
multi-chip slice, multi-host (after ``jax.distributed.initialize``), and on
fake CPU devices under ``--xla_force_host_platform_device_count``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"


def make_data_mesh(n_devices: Optional[int] = None,
                   devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (DATA_AXIS,))
