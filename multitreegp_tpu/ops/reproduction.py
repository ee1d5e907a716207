"""Selection, per-island generation step, and ring migration.

Behavioural spec (reference ``MultiTreeGP/genetic_operators/reproduction.py``):

* elitism: the best ``elite_size`` candidates are copied unchanged (:82);
* tournament selection: ``tournament_size`` uniform draws, winner chosen by
  rank with geometric probabilities ``sp*(1-sp)**rank``
  (:29-49, probabilities built at ``genetic_programming.py:114``);
* each non-elite pair is produced by one of {crossover, mutation, fresh
  sample} drawn from island-specific probabilities (:98), dispatched by
  ``lax.switch`` (:8-27);
* islands evolve independently (vmap over the island axis, :169-175) with
  island-specific hyperparameters;
* ring migration every ``migration_period`` generations: each island replaces
  its worst ``migration_size`` candidates with the best of its ring neighbour
  (:110-131, gated at :160-167 — note the reference computes BOTH branches of
  the ``lax.select`` every generation; we keep that semantics under jit since
  migration runs inside the fused generation step anyway).

The "fresh sample" reproduction type ignores its parents entirely, exactly
like the reference's ``sample_pair`` (``genetic_programming.py:513-525``).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array

from ..core.registry import FunctionSet
from ..core.trees import TreeTensors
from .crossover import crossover_candidates


def tournament_select(
    population: TreeTensors,
    fitness: Array,
    key: Array,
    tournament_probabilities: Array,
    tournament_size: int,
) -> TreeTensors:
    """Pick one candidate by rank-weighted tournament (reference :29-49)."""
    pop_size = fitness.shape[0]
    k_draw, k_win = jr.split(key)
    idx = jr.choice(k_draw, jnp.arange(pop_size), shape=(tournament_size,))
    ranked = idx[jnp.argsort(fitness[idx])]
    winner = jr.choice(k_win, ranked, p=tournament_probabilities)
    return population[winner]


def make_evolve_island(
    fset: FunctionSet,
    mutate_candidate: Callable,
    sample_candidate: Callable,
    population_size: int,
    elite_size: int,
    tournament_size: int,
):
    """Build the jittable per-island generation step.

    ``mutate_candidate(trees, key, reproduction_probability, variable_mask)``
    and ``sample_candidate(key)`` come from :mod:`mutation` /
    :mod:`initialization`.
    """
    num_pairs = (population_size - elite_size) // 2

    def crossover_pair(p1, p2, key, reproduction_probability):
        return crossover_candidates(p1, p2, key, reproduction_probability, fset)

    def mutate_pair(p1, p2, key, reproduction_probability):
        k1, k2 = jr.split(key)
        c1 = mutate_candidate(p1, k1, reproduction_probability, fset.variable_mask)
        c2 = mutate_candidate(p2, k2, reproduction_probability, fset.variable_mask)
        return c1, c2

    def sample_pair(p1, p2, key, reproduction_probability):
        k1, k2 = jr.split(key)
        return sample_candidate(k1), sample_candidate(k2)

    def reproduce(p1, p2, key, repro_type, reproduction_probability):
        return jax.lax.switch(
            repro_type,
            [crossover_pair, mutate_pair, sample_pair],
            p1,
            p2,
            key,
            reproduction_probability,
        )

    def evolve_island(
        population: TreeTensors,
        fitness: Array,
        key: Array,
        reproduction_type_probabilities: Array,  # (3,) island-specific
        reproduction_probability: Array,  # scalar island-specific
        tournament_probabilities: Array,  # (tournament_size,) island-specific
    ) -> TreeTensors:
        k_left, k_right, k_type, k_repro = jr.split(key, 4)
        order = jnp.argsort(fitness)
        elite = population[order[:elite_size]]

        select = partial(
            tournament_select,
            population,
            fitness,
            tournament_probabilities=tournament_probabilities,
            tournament_size=tournament_size,
        )
        left = jax.vmap(select)(jr.split(k_left, num_pairs))
        right = jax.vmap(select)(jr.split(k_right, num_pairs))

        repro_type = jr.choice(
            k_type, jnp.arange(3), shape=(num_pairs,), p=reproduction_type_probabilities
        )
        c_left, c_right = jax.vmap(reproduce, in_axes=(0, 0, 0, 0, None))(
            left, right, jr.split(k_repro, num_pairs), repro_type, reproduction_probability
        )
        return jax.tree_util.tree_map(
            lambda e, a, b: jnp.concatenate([e, a, b], axis=0), elite, c_left, c_right
        )

    return evolve_island


def migrate_ring(
    populations: TreeTensors, fitness: Array, migration_size: int
) -> Tuple[TreeTensors, Array]:
    """Ring migration across the island axis (axis 0).

    Each island's worst ``migration_size`` candidates are replaced by the best
    of its ring neighbour (reference ``migrate_population``, :110-131; ring =
    ``jnp.roll`` on the island axis, :162-164). Under a sharded island axis
    XLA lowers the roll to a collective permute over ICI.

    Also returns the migrated fitness so the generation step can keep
    fitness/population consistent without re-evaluating.
    """
    recv_order = jnp.argsort(fitness, axis=1, descending=True)  # worst first
    send_order = jnp.argsort(fitness, axis=1)  # best first

    # gather per-island sorted populations
    take = lambda x, order: jax.vmap(lambda xi, oi: xi[oi])(x, order)
    recv_pop = jax.tree_util.tree_map(lambda x: take(x, recv_order), populations)
    send_pop = jax.tree_util.tree_map(lambda x: take(x, send_order), populations)
    send_pop = jax.tree_util.tree_map(lambda x: jnp.roll(x, 1, axis=0), send_pop)
    recv_fit = take(fitness, recv_order)
    send_fit = jnp.roll(take(fitness, send_order), 1, axis=0)

    pop_size = fitness.shape[1]
    keep = (jnp.arange(pop_size) < migration_size)  # first rows come from sender

    def mix(s, r):
        shape = (1, pop_size) + (1,) * (s.ndim - 2)
        return jnp.where(keep.reshape(shape), s, r)

    out_pop = jax.tree_util.tree_map(mix, send_pop, recv_pop)
    out_fit = jnp.where(keep[None, :], send_fit, recv_fit)
    return out_pop, out_fit


def make_evolve_populations(
    evolve_island: Callable,
    migration_period: int,
    migration_size: int,
    reproduction_type_probabilities: Array,  # (islands, 3)
    reproduction_probabilities: Array,  # (islands,)
    tournament_probabilities: Array,  # (islands, tournament_size)
):
    """Island-vmapped generation step with periodic ring migration
    (reference ``evolve_populations``, :133-176)."""

    def evolve_populations(
        populations: TreeTensors, fitness: Array, key: Array, generation: Array
    ) -> TreeTensors:
        num_islands = fitness.shape[0]
        do_migrate = (num_islands > 1) & (((generation + 1) % migration_period) == 0)
        migrated_pop, migrated_fit = migrate_ring(populations, fitness, migration_size)
        populations = jax.tree_util.tree_map(
            lambda m, p: jnp.where(do_migrate, m, p), migrated_pop, populations
        )
        fitness = jnp.where(do_migrate, migrated_fit, fitness)

        keys = jr.split(key, num_islands)
        return jax.vmap(evolve_island)(
            populations,
            fitness,
            keys,
            reproduction_type_probabilities,
            reproduction_probabilities,
            tournament_probabilities,
        )

    return evolve_populations


def island_hyperparams(
    num_islands: int,
    tournament_size: int,
    selection_pressure_factors: Tuple[float, float],
    reproduction_probability_factors: Tuple[float, float],
    crossover_probability_factors: Tuple[float, float],
    mutation_probability_factors: Tuple[float, float],
    sample_probability_factors: Tuple[float, float],
):
    """Per-island linspace hyperparameter schedules
    (reference ``genetic_programming.py:113-119``)."""
    sp = jnp.linspace(*selection_pressure_factors, num_islands)
    tournament_probabilities = jnp.stack(
        [s * (1 - s) ** jnp.arange(tournament_size) for s in sp]
    )
    reproduction_type_probabilities = jnp.stack(
        [
            jnp.linspace(*crossover_probability_factors, num_islands),
            jnp.linspace(*mutation_probability_factors, num_islands),
            jnp.linspace(*sample_probability_factors, num_islands),
        ],
        axis=1,
    )
    reproduction_probabilities = jnp.linspace(*reproduction_probability_factors, num_islands)
    return tournament_probabilities, reproduction_type_probabilities, reproduction_probabilities
