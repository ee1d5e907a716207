"""Explicit-collective generation step for pod-scale runs.

The default evolve path (``ops.reproduction.make_evolve_populations``) runs
under plain jit with GSPMD-propagated shardings — the island-axis ``jnp.roll``
of ring migration becomes whatever collective XLA infers (exactly the
reference's situation, SURVEY.md §5.8). For pods this module expresses the
same step as an SPMD program with the communication written out:

* the island axis is sharded over the 1-D mesh (``k = islands / devices``
  local islands per device);
* each device evolves its local islands completely independently;
* ring migration sends ONE island's migrant block per device boundary via
  ``jax.lax.ppermute`` over ICI — the only inter-device traffic of a
  generation, ``migration_size * num_trees * max_nodes`` nodes per period;
* the global best (for logging) is a sharded argmin: ``psum``-style
  min-reduction over the mesh axis.

Semantics are identical to ``migrate_ring`` + vmapped ``evolve_island``
(tested for equality on a faked 8-device CPU platform).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.trees import TreeTensors


def _sorted_blocks(populations: TreeTensors, fitness: Array, migration_size: int):
    """Per-island (send_block, worst_order) for migration.

    send: each island's best ``migration_size`` candidates (the migrants).
    """
    send_order = jnp.argsort(fitness, axis=1)[:, :migration_size]
    take = lambda x, order: jax.vmap(lambda xi, oi: xi[oi])(x, order)
    send_pop = jax.tree_util.tree_map(lambda x: take(x, send_order), populations)
    send_fit = take(fitness, send_order)
    return send_pop, send_fit


def _ring_shift_islands(block, axis_name: str):
    """Shift island-major blocks by +1 along the GLOBAL island ring.

    ``block`` leaves have shape (local_islands, ...). The last local island's
    entry crosses the device boundary via ppermute; the rest shift locally.
    """
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def shift(x):
        boundary = x[-1:]  # goes to the next device
        received = jax.lax.ppermute(boundary, axis_name, perm)
        return jnp.concatenate([received, x[:-1]], axis=0)

    return jax.tree_util.tree_map(shift, block)


def _apply_migration(populations, fitness, recv_pop, recv_fit, do_migrate,
                     migration_size):
    """Replace each island's worst ``migration_size`` candidates with the
    received blocks (when ``do_migrate``). Pure local math — shared by the
    shard_map steps and the sequential per-shard emulation in
    ``__graft_entry__.dryrun_multichip`` leg 4, so what the emulator
    certifies is the exact production expression."""
    worst = jnp.argsort(fitness, axis=1, descending=True)[:, :migration_size]
    scatter = lambda x, idx, blk: jax.vmap(lambda xi, ii, bi: xi.at[ii].set(bi))(
        x, idx, blk
    )
    migrated_pop = jax.tree_util.tree_map(
        lambda x, blk: scatter(x, worst, blk), populations, recv_pop
    )
    migrated_fit = scatter(fitness, worst, recv_fit)
    populations = jax.tree_util.tree_map(
        lambda m, p: jnp.where(do_migrate, m, p), migrated_pop, populations
    )
    fitness = jnp.where(do_migrate, migrated_fit, fitness)
    return populations, fitness


def make_evolve_populations_collective(
    evolve_island: Callable,
    mesh: Mesh,
    migration_period: int,
    migration_size: int,
    reproduction_type_probabilities: Array,  # (islands, 3)
    reproduction_probabilities: Array,  # (islands,)
    tournament_probabilities: Array,  # (islands, tournament_size)
    axis_name: str = "i",
):
    """Build the sharded generation step.

    Returns ``step(populations, fitness, key, generation) -> populations`` with
    the island axis sharded over ``mesh``; drop-in replacement for
    ``make_evolve_populations``'s output when ``num_islands % num_devices == 0``.
    """
    n_dev = mesh.devices.size

    def local_step(populations, fitness, keys, hp_type, hp_repro, hp_tour, generation):
        # populations: (local_islands, pop, trees, nodes); keys: (local, 2)
        local = fitness.shape[0]
        do_migrate = (local * n_dev > 1) & (((generation + 1) % migration_period) == 0)

        send_pop, send_fit = _sorted_blocks(populations, fitness, migration_size)
        send_pop = _ring_shift_islands(send_pop, axis_name)
        send_fit = _ring_shift_islands(send_fit, axis_name)

        populations, fitness = _apply_migration(
            populations, fitness, send_pop, send_fit, do_migrate,
            migration_size,
        )

        return jax.vmap(evolve_island)(
            populations, fitness, keys, hp_type, hp_repro, hp_tour
        )

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name),
            P(axis_name), P(axis_name), P(axis_name), P(),
        ),
        out_specs=P(axis_name),
        check_vma=False,
    )

    def step(populations: TreeTensors, fitness: Array, key: Array, generation: Array):
        num_islands = fitness.shape[0]
        assert num_islands % n_dev == 0, (
            f"islands ({num_islands}) must divide over {n_dev} devices"
        )
        keys = jr.split(key, num_islands)
        return sharded(
            populations,
            fitness,
            keys,
            reproduction_type_probabilities,
            reproduction_probabilities,
            tournament_probabilities,
            generation,
        )

    return step


def make_evolve_populations_collective_fused(
    reproduce_islands: Callable,
    mesh: Mesh,
    migration_period: int,
    migration_size: int,
    reproduction_type_probabilities: Array,  # (islands, 3)
    reproduction_probabilities: Array,  # (islands,)
    tournament_probabilities: Array,  # (islands, tournament_size)
    axis_name: str = "i",
):
    """Sharded generation step around the Pallas reproduction kernel.

    GSPMD cannot partition a ``pallas_call``, so the fused reproduce
    (``ops.pallas_evolve.make_reproduce_islands``) must run INSIDE
    ``shard_map``: each device launches the kernel on its local islands'
    lanes; ring migration crosses device boundaries via ``ppermute`` exactly
    as in :func:`make_evolve_populations_collective`.
    """
    n_dev = mesh.devices.size

    def local_step(populations, fitness, keys, hp_type, hp_repro, hp_tour, generation):
        local = fitness.shape[0]
        do_migrate = (local * n_dev > 1) & (((generation + 1) % migration_period) == 0)

        send_pop, send_fit = _sorted_blocks(populations, fitness, migration_size)
        send_pop = _ring_shift_islands(send_pop, axis_name)
        send_fit = _ring_shift_islands(send_fit, axis_name)

        populations, fitness = _apply_migration(
            populations, fitness, send_pop, send_fit, do_migrate,
            migration_size,
        )

        return reproduce_islands(
            populations, fitness, keys, hp_type, hp_repro, hp_tour
        )

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name),
            P(axis_name), P(axis_name), P(axis_name), P(),
        ),
        out_specs=P(axis_name),
        check_vma=False,
    )

    def step(populations: TreeTensors, fitness: Array, key: Array, generation: Array):
        num_islands = fitness.shape[0]
        assert num_islands % n_dev == 0, (
            f"islands ({num_islands}) must divide over {n_dev} devices"
        )
        keys = jr.split(key, num_islands)
        return sharded(
            populations,
            fitness,
            keys,
            reproduction_type_probabilities,
            reproduction_probabilities,
            tournament_probabilities,
            generation,
        )

    return step


def make_sharded_evaluator(eval_islands: Callable, mesh: Mesh, axis_name: str = "i"):
    """Wrap ``eval_islands(populations) -> fitness`` (island-major, no
    cross-island communication) in ``shard_map`` over the island axis.

    Fitness evaluation is embarrassingly parallel across islands, but the
    fused rollout kernel inside it is a ``pallas_call`` that GSPMD would
    otherwise replicate — per-device launches over local islands restore
    linear scaling.
    """
    return shard_map(
        eval_islands,
        mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=P(axis_name),
        check_vma=False,
    )


def make_constant_opt_collective(
    optimise: Callable,
    mesh: Mesh,
    top_k: int,
    axis_name: str = "i",
):
    """Distributed top-k constant optimisation for ``fit(shard=True)``.

    Replaces the GSPMD global argsort of ``strategy._optimise_core`` (which
    XLA lowers to an all-gather of the full population) with an explicit
    local-top-k -> all-gather -> merge scheme (reference quirk at
    ``genetic_programming.py:418-422``: hardcoded top-50 sharded over the
    mesh):

    * each device contributes its local top ``min(k, local_pop)`` candidates
      (the exact global top-k is always inside this union) — only
      ``n_dev * k`` candidates ever cross ICI, not the population;
    * the merged global top ``ceil(k / n_dev) * n_dev`` (>= k, so every
      device refines an equal slice — a superset of the exact top-k,
      monotone since refinement never hurts) is computed replicated;
    * each device runs the Adam refinement on its slice of winners;
    * optimised constants/fitness return to the OWNING device's islands via
      a second all-gather + out-of-bounds-dropped scatter.

    Returns ``step(populations, fitness) -> (populations, fitness)`` with the
    island axis sharded; fitness entries of refined candidates are replaced
    by their refined fitness, matching ``_optimise_core``.
    """
    n_dev = mesh.devices.size

    def local_step(populations, fitness):
        # populations: (local_islands, pop, ...); fitness: (local_islands, pop)
        flat_fit = fitness.reshape(-1)
        flat_pop = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), populations
        )
        n_local = flat_fit.shape[0]
        k_contrib = min(top_k, n_local)
        # per-device share of the refinement, capped at the local population:
        # each device contributes only k_contrib >= k_local candidates, so an
        # uncapped ceil(top_k/n_dev) share would make the merged winner set
        # (k_pad) exceed the gathered pool whenever local_pop <
        # ceil(top_k/n_dev) — the scatter-back below would then broadcast
        # (k_pad,...) updates onto fewer targets and crash. Shapes are
        # static, so this resolves at trace time.
        k_local = min(-(-top_k // n_dev), n_local)
        k_pad = k_local * n_dev

        local_idx = jnp.argsort(flat_fit)[:k_contrib]
        local_cands = jax.tree_util.tree_map(lambda x: x[local_idx], flat_pop)
        local_sel_fit = flat_fit[local_idx]

        # one gather of k_contrib candidates per device; merge is replicated
        gath_fit = jax.lax.all_gather(local_sel_fit, axis_name)  # (n_dev, kc)
        gath_idx = jax.lax.all_gather(local_idx, axis_name)  # (n_dev, kc)
        gath_cands = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis_name), local_cands
        )
        order = jnp.argsort(gath_fit.reshape(-1))[:k_pad]  # winners first
        winners = jax.tree_util.tree_map(
            lambda x: x.reshape((n_dev * k_contrib,) + x.shape[2:])[order],
            gath_cands,
        )

        # each device refines winners[me*kl : (me+1)*kl]
        me = jax.lax.axis_index(axis_name)
        my_slice = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, me * k_local, k_local),
            winners,
        )
        opt_fit, opt_cands = optimise(my_slice)

        # return every refined slice to all devices, then keep what I own
        all_fit = jax.lax.all_gather(opt_fit, axis_name).reshape(k_pad)
        all_cands = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis_name).reshape(
                (k_pad,) + x.shape[1:]
            ),
            opt_cands,
        )
        owner_dev = order // k_contrib  # gathered row = owning device
        owner_idx = gath_idx.reshape(-1)[order]  # flat index on that device
        # scatter only my winners; others target index n_local -> dropped
        tgt = jnp.where(owner_dev == me, owner_idx, n_local)
        flat_pop = jax.tree_util.tree_map(
            lambda x, o: x.at[tgt].set(o, mode="drop"), flat_pop, all_cands
        )
        flat_fit = flat_fit.at[tgt].set(all_fit, mode="drop")

        local_islands = fitness.shape[0]
        pop = jax.tree_util.tree_map(
            lambda x: x.reshape((local_islands, -1) + x.shape[1:]), flat_pop
        )
        return pop, flat_fit.reshape(local_islands, -1)

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )


def global_best(fitness: Array, populations: TreeTensors, mesh: Mesh, axis_name: str = "i"):
    """Sharded global argmin: (best_fitness, best_candidate) without
    gathering the population to one device."""

    def local(fitness, populations):
        flat_fit = fitness.reshape(-1)
        idx = jnp.argmin(flat_fit)
        flat_pop = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), populations
        )
        cand = jax.tree_util.tree_map(lambda x: x[idx], flat_pop)
        best_local = flat_fit[idx]
        all_best = jax.lax.all_gather(best_local, axis_name)  # (n_dev,)
        winner = jnp.argmin(all_best)
        me = jax.lax.axis_index(axis_name)
        # broadcast the winner's candidate: zero-out losers, sum over the ring
        cand = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(
                jnp.where(winner == me, x, jnp.zeros_like(x)), axis_name
            ),
            cand,
        )
        return all_best[winner], cand

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )(fitness, populations)
