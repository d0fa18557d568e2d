"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.3). The
TPU-native equivalent: a 1-D `data` mesh over all devices (ICI within a
slice, DCN across slices), batch sharded on the leading axis, parameters
replicated, XLA inserting the gradient all-reduce. Multi-host setup uses
`jax.distributed.initialize` (see cli/submit.py) instead of NCCL process
groups; per-host data loading replaces DistributedSampler.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = "data"):
    """Place a host pytree with leading batch axis onto the mesh, sharded
    along `axis_name` (batch must be divisible by the axis size)."""
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)
    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def all_gather_objects(obj):
    """Gather an arbitrary picklable object from every process; returns a
    list of per-process objects (same on all processes).

    The TPU-native equivalent of the reference's pickle -> byte tensor ->
    padded dist.all_gather (/root/reference/src/trackformer/util/misc.py:
    91-132): objects of different sizes/structures per process are pickled
    to uint8 arrays, padded to the max length, and gathered with
    `multihost_utils.process_allgather` (which requires identical shapes
    across processes — the reason a naive pytree allgather of per-host
    predictions cannot work).
    """
    import pickle

    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray(data.size, np.int64))
    max_n = int(sizes.max())
    padded = np.zeros(max_n, np.uint8)
    padded[:data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]
