"""Device mesh helpers for the distributed SfM pipeline.

Replaces the reference's MapReduceConfig cluster topology file
(/root/reference/src/map_reduce/map_reduce_config.h:44-88): instead of
`ip port image_path` rows, the topology is a jax.sharding.Mesh over the
available devices; cluster-level data parallelism (SURVEY.md P1) maps to
the 'cluster' axis and intra-cluster observation parallelism to 'obs'.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def shard_leading(mesh: Mesh, tree, axis: str = "d"):
    """Put arrays with a leading device axis on the mesh (one row/device)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def partition_balanced(sizes: np.ndarray, num_bins: int):
    """Greedy largest-first balanced partition (ref: cluster-size-sorted
    job ordering, distributed_mapper_controller.cpp:675-679).

    Returns bin index per item.
    """
    order = np.argsort(-np.asarray(sizes))
    loads = np.zeros(num_bins)
    assign = np.zeros(len(sizes), np.int32)
    for i in order:
        b = int(np.argmin(loads))
        assign[i] = b
        loads[b] += sizes[i]
    return assign
