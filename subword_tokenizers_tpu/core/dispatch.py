"""Latency-aware device dispatch for the batched encoders.

One step of a scan encoder costs microseconds of compute but a fixed
dispatch latency per device program (milliseconds through a
remote-dispatch TPU link), so a *small* batch finishes on the host CPU
backend before an accelerator would finish dispatching it. The batched
encoders therefore route workloads below a slot threshold (rows x steps
of the pending scan) to the local CPU jax backend — the same jitted
program, compiled for the CPU target, producing bit-identical output
(everything on the conformance path is integer arithmetic).

The reference has no analogue (it is host-only, source/benchmarks.py
measures exactly this regime); this is the standard small-batch fallback
of accelerator serving stacks.

Measured threshold history (v5e behind the axon remote-dispatch link):
- r2 stack: ~49 ms per 8192-row scan slice on the TPU (a ~0.8 ms fixed
  cost per while_loop trip) vs ~18 ms host — everything routed to host.
- r3 stack (tools/encode_crossover.py + fresh-buffer link probes): the
  per-trip cost collapsed to ~0.3 us and the same slice now costs
  **0.08 ms of device time vs 22 ms on the host** — but every transfer
  CALL charges ~40-60 ms latency at ~15-30 MB/s, so a small batch is
  still host-bound: a single sentence costs ~1 ms on the host vs a
  ~70-100 ms link round trip. The measured crossover sits near ~1M
  char-slots (host scan rate ~0.17 us/slot vs the link's fixed
  ~100 ms for a compact-fetch dispatch cycle); the default threshold
  routes per-sentence/small-batch scans to the host executor
  (bit-identical program — reference-methodology per-sentence latency
  stays in milliseconds) and corpus-scale batches to the chip, whose
  compact-fetch path (ops/fetch.py) amortizes the link. Override via
  ``SWT_CPU_DISPATCH_SLOTS`` (char-slots; ``0`` pins everything to the
  default backend).
"""
from __future__ import annotations

import os
from typing import Optional

CPU_DISPATCH_SLOTS = int(os.environ.get("SWT_CPU_DISPATCH_SLOTS",
                                        str(1 << 19)))


def scan_device(n_slots: int, mesh=None, threshold: Optional[int] = None):
    """Return the host CPU ``jax.Device`` when an ``n_slots``-sized scan
    should run on host, else None (keep the default placement).

    None is returned when the default backend already is the CPU, when an
    explicit device mesh is in force (the caller asked for sharded
    execution), or when the workload is large enough to amortize
    accelerator dispatch.
    """
    if mesh is not None:
        return None
    limit = CPU_DISPATCH_SLOTS if threshold is None else threshold
    if n_slots >= limit or limit <= 0:
        return None
    import jax
    try:
        if jax.default_backend() == "cpu":
            return None
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


class DeviceCache:
    """Per-device cache of a model-state array bundle.

    ``build()`` returns a tuple of host (numpy) arrays; ``get(device)``
    returns the bundle uploaded to ``device`` (None = default device),
    uploading once per device — repeat calls reuse the resident copies
    (the bundles are tens of MB; re-uploading per call through a remote
    link would dominate the encode wall).
    """

    def __init__(self, build):
        self._build = build
        self._host = None
        self._per_dev = {}

    def host(self):
        if self._host is None:
            self._host = tuple(self._build())
        return self._host

    def get(self, device=None):
        key = device
        got = self._per_dev.get(key)
        if got is None:
            import jax
            import jax.numpy as jnp
            host = self.host()
            if device is None:
                got = tuple(jnp.asarray(a) for a in host)
            else:
                got = tuple(jax.device_put(a, device) for a in host)
            self._per_dev[key] = got
        return got
