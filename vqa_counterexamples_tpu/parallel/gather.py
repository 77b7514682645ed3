"""Sharded feature gather: index rows of a corpus-sharded matrix.

When the feature matrix outgrows one chip's HBM (att maps, or multi-host
COCO+VGenome stores), shard its rows over the mesh and gather by *global*
index: each device looks up the indices that fall in its shard (masked local
take) and a ``psum`` over the mesh assembles the full rows — communication is
exactly one all-reduce of the gathered batch, and rides ICI.

This is the scaling form of the on-device gather in engines/cx_engine.py
(`jnp.take(features, image_idxs)`); same contract, sharded layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def sharded_gather(features: jax.Array, indices: jax.Array, mesh,
                   axis: str = "data") -> jax.Array:
    """features (N, D) sharded over rows on ``axis``; indices (...,) int32
    replicated.  Returns (..., D) replicated."""
    n_total = features.shape[0]
    n_shards = mesh.shape[axis]
    assert n_total % n_shards == 0, "corpus rows must divide over the mesh"
    shard_rows = n_total // n_shards

    def local(feats_shard, idx):
        my_shard = jax.lax.axis_index(axis)
        local_idx = idx - my_shard * shard_rows
        mine = (local_idx >= 0) & (local_idx < shard_rows)
        safe = jnp.clip(local_idx, 0, shard_rows - 1)
        rows = jnp.take(feats_shard, safe, axis=0)
        rows = rows * mine[..., None].astype(rows.dtype)
        return jax.lax.psum(rows, axis)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P()), out_specs=P(),
                       check_vma=False)
    return fn(features, indices.astype(jnp.int32))
