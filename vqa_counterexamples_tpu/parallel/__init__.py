from .mesh import make_mesh, default_mesh
from .sharding import (batch_sharding, corpus_sharding, mesh_context,
                       mesh_from_spec, parse_mesh, replicated, shard_batch)
