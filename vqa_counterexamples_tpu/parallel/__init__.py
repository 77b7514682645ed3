from .mesh import make_mesh, default_mesh
from .sharding import (add_distributed_flag, batch_sharding, corpus_sharding,
                       maybe_initialize_distributed, mesh_context,
                       mesh_from_spec, parse_mesh, replicated, shard_batch)
