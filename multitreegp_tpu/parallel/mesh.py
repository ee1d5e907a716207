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


def island_sharding(mesh: Mesh, num_islands: int) -> NamedSharding:
    """Sharding for (islands, pop, trees, nodes) tree tensors.

    Shards the island axis when divisible by the mesh, otherwise the
    population axis.
    """
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if num_islands % n_dev == 0:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P(None, axis))


def fitness_sharding(mesh: Mesh, num_islands: int) -> NamedSharding:
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    if num_islands % n_dev == 0:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P(None, axis))


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
