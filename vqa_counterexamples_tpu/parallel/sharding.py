"""Sharding helpers: NamedSharding specs for batches, params, feature stores."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding over the given mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def corpus_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Row-shard a (N, D) feature matrix over the mesh (kNN corpus layout)."""
    return NamedSharding(mesh, P(axis, None))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in a pytree with its leading axis over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
