from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   all_gather_objects)
from .tp import make_mesh_2d, param_specs, shard_params  # noqa: F401
