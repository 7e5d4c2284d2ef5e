"""Feasibility probe: dynamic vectorized gather inside a Pallas TPU kernel.

The E2E scan automaton's per-step cost is gathers from HBM-resident
tables. If Mosaic supports vector-index gathers from VMEM-resident tables,
the whole automaton can run as one kernel with zero HLO-op overhead.
This probe measures (a) whether it compiles, (b) gather throughput.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_take():
    N_TAB = 4096
    N = 1024

    def kernel(tab_ref, idx_ref, col_ref, out_ref):
        tab = tab_ref[:]            # [N_TAB, 128]
        idx = idx_ref[:]            # [N]
        col = col_ref[:]
        idx2 = jnp.broadcast_to(idx[:, None], (idx.shape[0], tab.shape[1]))
        rows = jnp.take_along_axis(tab, idx2, axis=0)
        out_ref[:] = jnp.take_along_axis(
            rows, col[:, None], axis=1)[:, 0]

    tab = jnp.asarray(np.random.randint(0, 100, (N_TAB, 128),
                                        dtype=np.int32))
    idx = jnp.asarray(np.random.randint(0, N_TAB, N, dtype=np.int32))
    col = jnp.asarray(np.random.randint(0, 128, N, dtype=np.int32))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(f(tab, idx, col))
    ref = np.asarray(tab)[np.asarray(idx), np.asarray(col)]
    print("take-2d: compiles, correct =", np.array_equal(out, ref),
          flush=True)
    t0 = time.perf_counter()
    for _ in range(100):
        jax.block_until_ready(f(tab, idx, col))
    print(f"take-2d: {(time.perf_counter()-t0)/100*1e6:.1f} us/call",
          flush=True)


def probe_loop_gather():
    """Automaton-shaped: while-loop of vector gathers inside one kernel."""
    N_TAB = 50_000
    N = 2048
    ITERS = 128

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(c, st):
            g = jnp.take_along_axis(tab, ((st + c) % N_TAB)[:, None],
                                    axis=0)[:, 0]
            return (g + st) % N_TAB

        idx = idx_ref[:]
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, idx)

    tab = jnp.asarray(np.random.randint(0, N_TAB, (N_TAB, 1),
                                        dtype=np.int32))
    idx = jnp.asarray(np.random.randint(0, N_TAB, N, dtype=np.int32))
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = f(tab, idx)
    jax.block_until_ready(out)
    # reference
    t = np.asarray(tab)[:, 0]
    v = np.asarray(idx)
    for c in range(ITERS):
        v = (t[(v + c) % N_TAB] + v) % N_TAB
    print("loop-gather: correct =", np.array_equal(np.asarray(out), v),
          flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(tab, idx))
    dt = (time.perf_counter() - t0) / 20
    print(f"loop-gather: {dt*1e3:.2f} ms/call, "
          f"{dt/ITERS*1e6:.1f} us/iter for {N} lanes", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe_take()
    probe_loop_gather()
