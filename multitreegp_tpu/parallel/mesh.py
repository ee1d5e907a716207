"""Device mesh + population sharding.

The reference distributes work with a 1-D ``shard_map`` over the flattened
``(islands * pop)`` candidate axis with replicated data
(``genetic_programming.py:255-270``); evolution runs under plain jit with
GSPMD-propagated shardings. Here the same logical layout is expressed with
``NamedSharding`` constraints inside a single jitted program:

* axis ``'i'`` shards the ISLAND axis across devices — islands are the
  natural data-parallel unit of this workload (island evolution is fully
  independent; the only cross-island communication is ring migration, which
  XLA lowers to a collective-permute over ICI when the axis is sharded);
* when there are fewer islands than devices, the population axis provides a
  second sharding dimension.

Multi-host/pod execution uses the same code path after standard
``jax.distributed.initialize()``.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "i") -> Mesh:
    """1-D mesh over the available devices (reference: ``create_device_mesh``
    over ``jax.devices(device_type)``, ``genetic_programming.py:255-256``)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=(axis_name,))


def make_mesh_2d(
    num_slices: int,
    devices_per_slice: Optional[int] = None,
    axis_names=("dcn", "i"),
) -> Mesh:
    """2-D (DCN x ICI) mesh for multi-slice pods.

    The outer axis spans slices (inter-slice traffic rides the data-center
    network), the inner axis the chips of one slice (ICI). Collectives over
    the TUPLE ``axis_names`` treat the flattened product as one logical ring
    with dcn-major linearization — so the island migration ring crosses DCN
    exactly once per slice boundary per period, everything else stays on ICI.

    On a real multi-slice deployment call ``jax.distributed.initialize()``
    first; ``jax.devices()`` then enumerates all slices' chips grouped by
    process, which is exactly the (slice, chip) reshape below.
    """
    devices = jax.devices()
    if devices_per_slice is None:
        devices_per_slice = len(devices) // num_slices
    devices = np.asarray(devices[: num_slices * devices_per_slice]).reshape(
        num_slices, devices_per_slice
    )
    return Mesh(devices, axis_names=axis_names)


def mesh_axes(mesh: Mesh):
    """The spec entry sharding one array dim over EVERY mesh axis: the plain
    axis name for 1-D meshes, the tuple of names for DCN x ICI meshes."""
    return mesh.axis_names if len(mesh.axis_names) > 1 else mesh.axis_names[0]


def island_sharding(mesh: Mesh, num_islands: int) -> NamedSharding:
    """Sharding for (islands, pop, trees, nodes) tree tensors.

    Shards the island axis when divisible by the mesh, otherwise the
    population axis.
    """
    n_dev = mesh.devices.size
    axes = mesh_axes(mesh)
    if num_islands % n_dev == 0:
        return NamedSharding(mesh, P(axes))
    return NamedSharding(mesh, P(None, axes))


def fitness_sharding(mesh: Mesh, num_islands: int) -> NamedSharding:
    n_dev = mesh.devices.size
    axes = mesh_axes(mesh)
    if num_islands % n_dev == 0:
        return NamedSharding(mesh, P(axes))
    return NamedSharding(mesh, P(None, axes))


def shard_population(populations, fitness_or_none, mesh: Mesh):
    """Apply sharding constraints to the island-major population pytree."""
    num_islands = populations.ops.shape[0]
    sh = island_sharding(mesh, num_islands)
    populations = jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), populations
    )
    if fitness_or_none is None:
        return populations
    fsh = fitness_sharding(mesh, num_islands)
    fitness = jax.lax.with_sharding_constraint(fitness_or_none, fsh)
    return populations, fitness
