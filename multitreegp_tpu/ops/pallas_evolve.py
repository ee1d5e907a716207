"""Fused generation step backed by the Pallas reproduction kernel.

Restructures ``ops.reproduction.make_evolve_populations`` so the reproduce
stage is ONE kernel launch across all islands instead of a per-pair vmapped
``lax.switch``:

* selection, elitism, migration gating and all island-heterogeneous
  hyperparameter draws stay in XLA (they are cheap — selection measured
  0.3 ms at pop 4096);
* the per-pair branch decision (crossover / mutate / fresh, reference
  ``reproduction.py:98``) and the per-candidate forced-Bernoulli tree masks
  (``crossover.py:214`` / ``mutation.py:571``) are drawn in XLA with the same
  island-specific probabilities, then encoded as per-lane action codes;
* all row-level tree surgery runs in :mod:`core.pallas_reproduction`.

Semantics match the XLA path distributionally (same selection, same branch
laws, same operator semantics — pinned by tests/test_tile_surgery.py); the
random stream differs, as it does vs the reference.

``make_reproduce_islands`` exposes the post-migration part (elitism +
selection + kernel) on an arbitrary leading island count with hyperparameters
as ARGUMENTS — that is what lets ``parallel.collective`` run the exact same
code per-device inside ``shard_map`` with sharded hyperparameter rows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array

from ..core import tile_surgery as ts
from ..core.pallas_reproduction import reproduce_pairs_pallas
from ..core.registry import FunctionSet
from ..core.trees import TreeTensors
from .crossover import forced_bernoulli_mask
from .reproduction import migrate_ring, tournament_select


def make_reproduce_islands(
    fset: FunctionSet,
    population_size: int,
    elite_size: int,
    tournament_size: int,
    max_nodes: int,
    max_init_depth: int,
    coefficient_sd: float = 1.0,
):
    """Build ``reproduce(populations, fitness, keys, rtp, rp, tp) ->
    populations`` — elitism + tournament selection + the one-launch Pallas
    reproduce over however many islands the inputs carry.

    ``keys`` is (islands, 2) uint32 (one PRNG key per island); ``rtp``
    (islands, 3), ``rp`` (islands,), ``tp`` (islands, tournament_size) are the
    per-island hyperparameter rows. Passing them as arguments (not closure)
    keeps the function usable inside ``shard_map`` where each device sees only
    its local rows.
    """
    num_pairs = (population_size - elite_size) // 2
    cfg = ts.make_config(fset, max_nodes, max_init_depth, coefficient_sd)
    num_trees = fset.num_trees

    def select_island(population, fitness, key, tprobs):
        k_l, k_r = jr.split(key)
        sel = partial(
            tournament_select,
            population,
            fitness,
            tournament_probabilities=tprobs,
            tournament_size=tournament_size,
        )
        left = jax.vmap(sel)(jr.split(k_l, num_pairs))
        right = jax.vmap(sel)(jr.split(k_r, num_pairs))
        return left, right

    def controls_island(key, rtp, rp):
        """Per-pair branch draws + per-tree masks for one island."""
        k_type, k_cx, k_m1, k_m2 = jr.split(key, 4)
        repro_type = jr.choice(k_type, jnp.arange(3), shape=(num_pairs,), p=rtp)
        cx_mask = jax.vmap(lambda k: forced_bernoulli_mask(k, rp, num_trees))(
            jr.split(k_cx, num_pairs)
        )
        m1 = jax.vmap(lambda k: forced_bernoulli_mask(k, rp, num_trees))(
            jr.split(k_m1, num_pairs)
        )
        m2 = jax.vmap(lambda k: forced_bernoulli_mask(k, rp, num_trees))(
            jr.split(k_m2, num_pairs)
        )
        is_cx = (repro_type == 0)[:, None]
        is_mut = (repro_type == 1)[:, None]
        is_fresh = (repro_type == 2)[:, None]
        cxflag = is_cx & cx_mask
        act1 = jnp.where(is_mut & m1, 1, 0) + jnp.where(is_fresh, 2, 0)
        act2 = jnp.where(is_mut & m2, 1, 0) + jnp.where(is_fresh, 2, 0)
        return cxflag, act1.astype(jnp.int32), act2.astype(jnp.int32)

    def reproduce(
        populations: TreeTensors,
        fitness: Array,
        keys: Array,  # (islands, 2) per-island keys
        rtp: Array,
        rp: Array,
        tp: Array,
    ) -> TreeTensors:
        num_islands = fitness.shape[0]

        order = jnp.argsort(fitness, axis=1)
        elite_idx = order[:, :elite_size]
        elite = jax.tree_util.tree_map(
            lambda x: jax.vmap(lambda xi, oi: xi[oi])(x, elite_idx), populations
        )

        k_sel = jax.vmap(lambda k: jr.fold_in(k, 0))(keys)
        k_ctrl = jax.vmap(lambda k: jr.fold_in(k, 1))(keys)
        left, right = jax.vmap(select_island)(populations, fitness, k_sel, tp)
        cxflag, act1, act2 = jax.vmap(controls_island)(k_ctrl, rtp, rp)

        flat = lambda x: x.reshape((num_islands * num_pairs,) + x.shape[2:])
        left_f = jax.tree_util.tree_map(flat, left)
        right_f = jax.tree_util.tree_map(flat, right)
        seed = jr.randint(
            jr.fold_in(keys[0], 2), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        c1, c2 = reproduce_pairs_pallas(
            left_f, right_f, flat(cxflag), flat(act1), flat(act2), seed, fset, cfg
        )

        unflat = lambda x: x.reshape((num_islands, num_pairs) + x.shape[1:])
        c1 = jax.tree_util.tree_map(unflat, c1)
        c2 = jax.tree_util.tree_map(unflat, c2)
        return jax.tree_util.tree_map(
            lambda e, a, b: jnp.concatenate([e, a, b], axis=1), elite, c1, c2
        )

    return reproduce


def make_evolve_populations_fused(
    fset: FunctionSet,
    population_size: int,
    elite_size: int,
    tournament_size: int,
    migration_period: int,
    migration_size: int,
    reproduction_type_probabilities: Array,  # (islands, 3)
    reproduction_probabilities: Array,  # (islands,)
    tournament_probabilities: Array,  # (islands, tournament_size)
    max_nodes: int,
    max_init_depth: int,
    coefficient_sd: float = 1.0,
):
    """Single-program fused evolve: ring migration in XLA (global roll) +
    :func:`make_reproduce_islands`. Drop-in for ``make_evolve_populations``."""
    reproduce = make_reproduce_islands(
        fset, population_size, elite_size, tournament_size,
        max_nodes, max_init_depth, coefficient_sd,
    )

    def evolve_populations(
        populations: TreeTensors, fitness: Array, key: Array, generation: Array
    ) -> TreeTensors:
        num_islands = fitness.shape[0]
        do_migrate = (num_islands > 1) & (((generation + 1) % migration_period) == 0)
        migrated_pop, migrated_fit = migrate_ring(populations, fitness, migration_size)
        populations = jax.tree_util.tree_map(
            lambda m, pp: jnp.where(do_migrate, m, pp), migrated_pop, populations
        )
        fitness = jnp.where(do_migrate, migrated_fit, fitness)

        keys = jr.split(key, num_islands)
        return reproduce(
            populations,
            fitness,
            keys,
            reproduction_type_probabilities,
            reproduction_probabilities,
            tournament_probabilities,
        )

    return evolve_populations
