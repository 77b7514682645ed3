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


def parse_mesh(spec: str | None) -> dict | None:
    """'data=8' or 'data=4,model=2' -> axes dict (CLI --mesh flags)."""
    if not spec:
        return None
    axes = {}
    for part in spec.split(","):
        name, _, size = part.partition("=")
        axes[name.strip()] = int(size)
    return axes


def mesh_from_spec(spec: str | None):
    """Build a Mesh from a CLI spec string; None when no spec given."""
    axes = parse_mesh(spec)
    if not axes:
        return None
    from .mesh import make_mesh

    n_dev = 1
    for size in axes.values():
        n_dev *= size
    return make_mesh(axes, jax.devices()[:n_dev])


def mesh_context(mesh):
    """`with mesh_context(mesh):` — jax.set_mesh, or a no-op for None."""
    import contextlib

    return jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
