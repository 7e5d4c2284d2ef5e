"""Length-sorted sliced execution of row-batched device kernels.

Every batched encoder here is a ``while_loop`` whose trip count is set by
the *slowest row* of the batch (the loop runs in lockstep until all rows
finish), so one monolithic batch costs ~rows x max-length iterations.
Sorting rows by a length key and slicing into fixed-row batches makes each
slice's trip count its own max length (the loop conditions are dynamic),
cutting total element-iterations to ~sum-of-lengths; slices dispatch
back-to-back, so the transfer of slice k+1 overlaps the device scan of
slice k on asynchronous backends.

Row counts quantize (ROW_QUANTA / multiples of SLICE_ROWS) so compiled
shapes repeat across corpora — each new shape is a multi-minute XLA
compile through the remote TPU tunnel. Padding rows go at the FRONT of
the sorted order (the cheapest slice); callers provide per-array pad
values that make padded rows no-ops for their kernel.
"""
from __future__ import annotations

from typing import Callable, Sequence

ROW_QUANTA = (1024, 2048, 4096, 8192)
SLICE_ROWS = ROW_QUANTA[-1]
# Slices per batch (upper bound): finer slices track the length
# distribution more closely (a batch that fits one slice gets no
# length-homogeneity benefit at all), at ~one extra dispatch each.
MAX_SLICES = 8


def quantize_rows(u: int) -> int:
    for q in ROW_QUANTA:
        if u <= q:
            return q
    return -(-u // SLICE_ROWS) * SLICE_ROWS


def slice_rows_for(total: int) -> int:
    return min(max(ROW_QUANTA[0], total // MAX_SLICES), SLICE_ROWS)


def sliced_rows(fn: Callable, arrays: Sequence, pad_values: Sequence,
                lengths, n_out: int):
    """Run ``fn(*row_slices) -> tuple of row-aligned outputs`` over
    length-sorted quantized row slices of ``arrays`` (numpy, shared
    leading dim W). Returns ``n_out`` host arrays in the original row
    order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    W = arrays[0].shape[0]
    order = np.argsort(lengths, kind="stable")
    R = quantize_rows(W)
    pad = R - W
    padded = []
    for arr, pv in zip(arrays, pad_values):
        out = np.full((R,) + arr.shape[1:], pv, dtype=arr.dtype)
        out[pad:] = arr[order]
        padded.append(out)
    sr = min(R, slice_rows_for(R))
    parts = []
    for k in range(R // sr):
        sl = slice(k * sr, (k + 1) * sr)
        parts.append(fn(*[jnp.asarray(a[sl]) for a in padded]))
    fetched = jax.device_get(parts)
    cat = [np.concatenate([f[j] for f in fetched])[pad:]
           for j in range(n_out)]
    inv = np.empty(W, dtype=np.int64)
    inv[order] = np.arange(W, dtype=np.int64)
    return tuple(a[inv] for a in cat)
