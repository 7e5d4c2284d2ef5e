"""TPU microbenchmarks: per-iteration cost anatomy of the encode/train ops.

Run in background (compiles take minutes through the remote-compile
tunnel). Results guide kernel design.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

ITERS = 200
U = 8192


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def trivial(x):
    def w(st):
        c, x = st
        return (c + 1, x + c)
    return jax.lax.while_loop(lambda st: st[0] < ITERS, w, (0, x))


@jax.jit
def gather1(x, table, idx, col):
    def w(st):
        c, x = st
        g = table[(idx + x) % 50_000, (col + c) % 128]
        return (c + 1, x + g)
    return jax.lax.while_loop(lambda st: st[0] < ITERS, w, (0, x))


@jax.jit
def gather_row(x, table, idx):
    def w(st):
        c, x = st
        g = table[(idx + x) % 50_000, :8]
        return (c + 1, x + g.sum(axis=1).astype(jnp.int32))
    return jax.lax.while_loop(lambda st: st[0] < ITERS, w, (0, x))


@jax.jit
def scatter_flat(buf, idx):
    def w(st):
        c, buf = st
        tgt = (idx * 40 + c) % (U * 40)
        buf = buf.at[tgt].set(c, mode="drop")
        return (c + 1, buf)
    return jax.lax.while_loop(lambda st: st[0] < ITERS, w, (0, buf))


@jax.jit
def scatter_2d(buf2, rows):
    def w(st):
        c, b = st
        b = b.at[rows, c % 40].set(c, mode="drop")
        return (c + 1, b)
    return jax.lax.while_loop(lambda st: st[0] < ITERS, w, (0, buf2))


@jax.jit
def sort3(k, p, w):
    return jax.lax.sort((k, p, w), num_keys=2)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1000, (50_000, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 50_000, U).astype(np.int32))
    col = jnp.asarray(rng.integers(0, 128, U).astype(np.int32))
    rows = jnp.arange(U, dtype=jnp.int32)
    x0 = jnp.zeros(U, jnp.int32)
    buf0 = jnp.zeros(U * 40, jnp.int32)
    buf2 = jnp.zeros((U, 40), jnp.int32)

    t = timeit(trivial, x0)
    print(f"trivial:      {t/ITERS*1e6:8.1f} us/iter", flush=True)
    t = timeit(gather1, x0, table, idx, col)
    print(f"gather1:      {t/ITERS*1e6:8.1f} us/iter", flush=True)
    t = timeit(gather_row, x0, table, idx)
    print(f"gather_row8:  {t/ITERS*1e6:8.1f} us/iter", flush=True)
    t = timeit(scatter_flat, buf0, idx)
    print(f"scatter_flat: {t/ITERS*1e6:8.1f} us/iter", flush=True)
    t = timeit(scatter_2d, buf2, rows)
    print(f"scatter_2d:   {t/ITERS*1e6:8.1f} us/iter", flush=True)

    P = 500_000
    k32 = jnp.asarray(rng.integers(0, 2**30, P).astype(np.int32))
    p32 = jnp.asarray(np.arange(P, dtype=np.int32))
    w32 = jnp.asarray(rng.integers(1, 100, P).astype(np.int32))
    t = timeit(sort3, k32, p32, w32)
    print(f"sort 500k i32 x3: {t*1e3:8.2f} ms", flush=True)
    t = timeit(sort3, k32.astype(jnp.int64), p32.astype(jnp.int64),
               w32.astype(jnp.int64))
    print(f"sort 500k i64 x3: {t*1e3:8.2f} ms", flush=True)

    from subword_tokenizers_tpu.ops.pairstats import bpe_select
    from subword_tokenizers_tpu.ops.merge import apply_merge
    sym = jnp.asarray(rng.integers(-1, 80, (23_000, 22)).astype(np.int32))
    fr = jnp.asarray(rng.integers(1, 50, 23_000).astype(np.int64))
    t = timeit(lambda s, f: bpe_select(s, f, True), sym, fr)
    print(f"bpe_select narrow: {t*1e3:8.2f} ms", flush=True)
    t = timeit(lambda s, f: bpe_select(s, f, False), sym, fr)
    print(f"bpe_select wide:   {t*1e3:8.2f} ms", flush=True)
    t = timeit(apply_merge, sym, 5, 6, 100)
    print(f"apply_merge:       {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def tiny(x):
        return x + 1
    xs = jnp.zeros((), jnp.int32)
    tiny(xs).block_until_ready()
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        int(tiny(xs))
    print(f"scalar round trip: {(time.perf_counter()-t0)/N*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
