from .mesh import (make_mesh, shard_batch, replicate,  # noqa: F401
                   all_gather_objects)
