"""Mesh/sharding tests on the 8-device faked-CPU platform (the reference
notebooks' xla_force_host_platform_device_count trick, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.core.trees import validate_host
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
from multitreegp_tpu.parallel.mesh import island_sharding, make_mesh

OPERATORS = [
    ("+", jnp.add, 2, 0.5),
    ("-", jnp.subtract, 2, 0.1),
    ("*", jnp.multiply, 2, 0.5),
    ("/", jnp.divide, 2, 0.1),
]


def test_eight_fake_devices():
    assert len(jax.devices()) == 8


def test_sharded_fit_matches_shapes():
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 3.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4)
    strategy = GeneticProgramming(
        num_generations=3,
        population_size=16,
        fitness_function=SREvaluator(substeps=1),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,  # one island per fake device
        max_nodes=32,
        elite_percentage=0.125,
        migration_period=2,
        migration_percentage=0.125,
    )
    best_fit, best_sol, final_pop, final_fitness = strategy.fit(
        jr.PRNGKey(1), data, shard=True
    )
    assert best_fit.shape == (3,)
    assert np.isfinite(np.asarray(best_fit)).all()
    validate_host(final_pop, strategy.fset.slots)


def test_sharded_fit_constopt_small_local_pop():
    """fit(shard=True, coefficient_optimisation=True) at the production
    default top_k=50 with local populations SMALLER than ceil(50/8): the
    collective const-opt branch traces even when the schedule never fires,
    so this pins the trace-time shape regression (per-device refinement
    share must cap at the local pool)."""
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2)
    strategy = GeneticProgramming(
        num_generations=2,
        population_size=6,  # local pop 6 < ceil(top_k / n_dev) = 7
        fitness_function=SREvaluator(substeps=1),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_nodes=16,
        max_init_depth=3,
        coefficient_optimisation=True,
        gradient_steps=2,
    )
    best_fit, _, final_pop, final_fitness = strategy.fit(
        jr.PRNGKey(1), data, shard=True
    )
    assert best_fit.shape == (2,)
    assert np.isfinite(np.asarray(best_fit)).all()
    validate_host(final_pop, strategy.fset.slots)


def test_sharded_eval_equals_unsharded():
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 3.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(2), ts, batch_size=4)
    strategy = GeneticProgramming(
        num_generations=2,
        population_size=16,
        fitness_function=SREvaluator(substeps=1),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_nodes=32,
        elite_percentage=0.125,
        migration_percentage=0.125,
    )
    pop = strategy.initialize_population(jr.PRNGKey(3))
    fit_plain = strategy._eval_fn(data)(pop)
    mesh = make_mesh()
    sh = island_sharding(mesh, 8)
    pop_sharded = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), pop)
    fit_sharded = strategy._eval_fn(data)(pop_sharded)
    np.testing.assert_allclose(
        np.asarray(fit_plain), np.asarray(fit_sharded), rtol=1e-6
    )


def test_sharded_fit_adaptive_method():
    """fit(shard=True) with the adaptive (Dopri5+PID) evaluator — the r5
    production adaptive default under the multi-chip composition. On the
    CPU mesh the evaluator's general integrate_adaptive path runs inside
    shard_map (the fused kernel requires TPU/interpret; its sharded
    equality is pinned in test_collective.py)."""
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2)
    strategy = GeneticProgramming(
        num_generations=2,
        population_size=8,
        fitness_function=SREvaluator(
            method="adaptive", adaptive_method="dopri5",
            rtol=1e-3, atol=1e-5, adaptive_budget=64,
        ),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_nodes=16,
        max_init_depth=3,
    )
    best_fit, _best_sol, final_pop, _ = strategy.fit(
        jr.PRNGKey(1), data, shard=True
    )
    assert best_fit.shape == (2,)
    assert np.isfinite(np.asarray(best_fit)).all()
    validate_host(final_pop, strategy.fset.slots)
