"""Data-parallel batched encoding via shard_map.

Encoding is embarrassingly row-parallel: input rows (unique whitespace
chunks or words) shard across the ``data`` mesh axis while the trie/merge
model state is replicated — the classic inference layout. Each shard runs
its own scan automaton to completion; there is no cross-shard
communication at all.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.wp_encode_e2e import wp_e2e_scan, wp_e2e_scan_u16
from .mesh import DATA_AXIS


@partial(jax.jit,
         static_argnames=("mesh", "root_p", "root_sharp", "unk_id",
                          "sharp_seq", "n_pops"))
def sharded_e2e_scan(mesh, pchar, slen, goto_table, node_info, root_p,
                     root_sharp, unk_id, sharp_seq, n_pops):
    """Row-sharded wp_e2e_scan; returns the same
    (out, out_n, ovf, stuck, crash)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                        P(DATA_AXIS), P(DATA_AXIS)),
             check_vma=False)
    def run(pchar_l, slen_l, goto_l, info_l):
        return wp_e2e_scan(pchar_l, slen_l, goto_l, info_l, root_p,
                           root_sharp, unk_id, sharp_seq, n_pops)

    return run(pchar, slen, goto_table, node_info)


@partial(jax.jit,
         static_argnames=("mesh", "root_p", "root_sharp", "unk_id",
                          "sharp_seq", "n_pops"))
def sharded_e2e_scan_u16(mesh, pchar16, slen, goto_table, node_info,
                         root_p, root_sharp, unk_id, sharp_seq, n_pops):
    """Row-sharded u16-wire scan (the fused native front end's wire
    format). Each shard's lockstep while_loop exits at its own rows' max
    trip count — callers length-sort rows before sharding so blocked
    shards carry homogeneous lengths (the mesh analogue of
    core/batching.sliced_rows)."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                        P(DATA_AXIS), P(DATA_AXIS)),
             check_vma=False)
    def run(pchar_l, slen_l, goto_l, info_l):
        return wp_e2e_scan_u16(pchar_l, slen_l, goto_l, info_l, root_p,
                               root_sharp, unk_id, sharp_seq, n_pops)

    return run(pchar16, slen, goto_table, node_info)


def pad_rows(mesh, *arrays):
    """Pad axis-0 to a multiple of the mesh size; returns (padded..., n)."""
    n_dev = mesh.devices.size
    n = arrays[0].shape[0]
    pad = (-n) % n_dev
    out = []
    for a in arrays:
        if pad:
            fill = np.zeros((pad,) + a.shape[1:], dtype=a.dtype)
            a = np.concatenate([a, fill], axis=0)
        out.append(a)
    return (*out, n)


def put_sharded(mesh, *arrays):
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return tuple(jax.device_put(jnp.asarray(a), sharding) for a in arrays)
