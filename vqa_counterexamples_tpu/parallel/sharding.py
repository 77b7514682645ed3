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


def add_distributed_flag(parser) -> None:
    """`--distributed` on the heavy CLIs: multi-host (pod-slice) bootstrap."""
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() before any "
                             "device use (multi-host pod-slice runs; the "
                             "coordinator/process env comes from the TPU VM "
                             "runtime).  Mesh axes given via --mesh then "
                             "span every host's devices")


def maybe_initialize_distributed(args) -> None:
    """Multi-host bootstrap, upstream of any mesh construction.

    After this, ``jax.devices()`` sees every host's chips and the same
    ``make_mesh``/``shard_batch`` code shards over ICI within a host and
    DCN across hosts — ``shard_batch``'s global-array ``device_put`` is
    multi-process-correct as long as every host builds the full batch.
    """
    if getattr(args, "distributed", False):
        import jax

        jax.distributed.initialize()
        print("=> jax.distributed initialized: process %d/%d, %d devices"
              % (jax.process_index(), jax.process_count(),
                 jax.device_count()))


def mesh_context(mesh):
    """`with mesh_context(mesh):` — jax.set_mesh, or a no-op for None."""
    import contextlib

    return jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
