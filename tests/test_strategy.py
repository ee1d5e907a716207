"""End-to-end strategy tests: the SymbolicRegression notebook workload at
reduced scale must show real fitness improvement (the de-facto integration
test of the reference, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.core.trees import validate_host
from multitreegp_tpu.models.environments import VanDerPolOscillator, Acrobot
from multitreegp_tpu.models.evaluators import (
    SREvaluator,
    StaticPolicyEvaluator,
    generate_control_data,
    generate_sr_data,
)

OPERATORS = [
    ("+", jnp.add, 2, 0.5),
    ("-", jnp.subtract, 2, 0.1),
    ("*", jnp.multiply, 2, 0.5),
    ("/", jnp.divide, 2, 0.1),
]


@pytest.fixture(scope="module")
def sr_setup():
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8)
    strategy = GeneticProgramming(
        num_generations=6,
        population_size=32,
        fitness_function=SREvaluator(substeps=2),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=2,
        max_nodes=32,
        migration_period=3,
        migration_percentage=0.125,
        elite_percentage=0.125,
    )
    return strategy, data


def test_host_loop_improves(sr_setup):
    strategy, data = sr_setup
    key = jr.PRNGKey(1)
    pop = strategy.initialize_population(key)
    assert pop.ops.shape == (2, 32, 2, 32)
    first_best = None
    for g in range(strategy.num_generations):
        fitness, pop = strategy.evaluate_population(pop, data)
        if first_best is None:
            first_best = float(jnp.min(fitness))
        if g < strategy.num_generations - 1:
            key, k = jr.split(key)
            pop = strategy.evolve(pop, fitness, k)
    validate_host(pop, strategy.fset.slots)
    best_fitnesses, best_solutions = strategy.get_statistics()
    final_best = float(best_fitnesses[strategy.num_generations - 1])
    assert np.isfinite(final_best)
    assert final_best <= first_best  # monotone via elitism
    # rendering works
    _, best = strategy.get_statistics(strategy.num_generations - 1)
    s = strategy.to_string(best)
    assert s.startswith("[") and len(s) > 4


def test_fused_fit_loop(sr_setup):
    strategy, data = sr_setup
    best_fit, best_sol, final_pop, final_fitness = strategy.fit(jr.PRNGKey(2), data)
    assert best_fit.shape == (6,)
    assert np.isfinite(np.asarray(best_fit)).all()
    # best-so-far must not get worse thanks to elitism (allow tiny fp jitter)
    bf = np.asarray(best_fit)
    assert bf[-1] <= bf[0] + 1e-5
    validate_host(final_pop, strategy.fset.slots)
    assert final_fitness.shape == (2, 32)


def test_fit_improves_on_vdp():
    """Longer run: best fitness should drop substantially on Van der Pol."""
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(3), ts, batch_size=8)
    strategy = GeneticProgramming(
        num_generations=10,
        population_size=64,
        fitness_function=SREvaluator(substeps=2),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=2,
        max_nodes=32,
        elite_percentage=0.125,
        migration_percentage=0.125,
    )
    best_fit, *_ = strategy.fit(jr.PRNGKey(4), data)
    bf = np.asarray(best_fit)
    assert bf[-1] < bf[0]
    assert bf[-1] < 50.0  # random VdP populations start in the hundreds+


def test_parsimony_pressure():
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(5), ts, batch_size=4)
    strategy = GeneticProgramming(
        num_generations=2,
        population_size=16,
        fitness_function=SREvaluator(substeps=1),
        operator_list=OPERATORS,
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        size_parsinomy=1000.0,  # reference-spelled alias
        max_nodes=32,
        elite_percentage=0.125,
        migration_percentage=0.125,
    )
    pop = strategy.initialize_population(jr.PRNGKey(6))
    fitness, _ = strategy.evaluate_population(pop, data)
    from multitreegp_tpu.core.trees import tree_sizes

    # penalised fitness == raw fitness + size_parsimony * node count exactly
    raw = strategy.evaluator.evaluate_population(
        jax.tree_util.tree_map(lambda x: x.reshape((-1,) + x.shape[2:]), pop), data
    )
    sizes = np.asarray(jnp.sum(tree_sizes(pop), axis=-1)).reshape(-1)
    f = np.asarray(fitness).reshape(-1)
    np.testing.assert_allclose(f, np.asarray(raw) + 1000.0 * sizes, rtol=1e-6)


def test_static_policy_smoke():
    env = Acrobot(0.05, 0.1)
    ts = jnp.arange(0.0, 5.0, 0.25)
    data = generate_control_data(env, jr.PRNGKey(7), ts, batch_size=4)
    ops = OPERATORS[:3] + [("sin", jnp.sin, 1, 0.1), ("cos", jnp.cos, 1, 0.1)]
    strategy = GeneticProgramming(
        num_generations=2,
        population_size=16,
        fitness_function=StaticPolicyEvaluator(env, substeps=2),
        operator_list=ops,
        variable_list=[["y1", "y2", "y3", "y4"]],
        layer_sizes=[env.n_control],
        num_populations=2,
        size_parsimony=1.0,
        max_nodes=32,
        elite_percentage=0.125,
        migration_percentage=0.125,
    )
    best_fit, best_sol, final_pop, _ = strategy.fit(jr.PRNGKey(8), data)
    assert np.isfinite(np.asarray(best_fit)).all()
    validate_host(final_pop, strategy.fset.slots)


def test_fit_checkpoint_and_resume(tmp_path):
    """Kill-and-resume: a run checkpointed at gen 3 and resumed must be
    bit-identical to the uninterrupted run (same key stream)."""
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 4.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4)

    def make():
        return GeneticProgramming(
            num_generations=6,
            population_size=16,
            fitness_function=SREvaluator(substeps=1),
            operator_list=OPERATORS,
            variable_list=[["x0", "x1"]],
            layer_sizes=[2],
            num_populations=2,
            max_init_depth=3,
            max_nodes=16,
            migration_period=3,
            migration_percentage=0.125,
            elite_percentage=0.125,
        )

    ck = str(tmp_path / "run_{gen}.npz")
    # uninterrupted run
    bf_full, _, pop_full, fit_full = make().fit(jr.PRNGKey(5), data)
    # checkpointed run: periodic snapshots at gens 3 and 6
    make().fit(jr.PRNGKey(5), data, checkpoint_path=ck, checkpoint_every=3)
    import numpy as _np

    mid = str(tmp_path / "run_3.npz")
    with _np.load(mid) as z:
        assert int(z["generation"]) == 3
    # "kill" after the gen-3 snapshot, resume the remaining generations
    bf_res, _, pop_res, fit_res = make().fit(
        jr.PRNGKey(5), data, resume_from=mid
    )
    np.testing.assert_array_equal(np.asarray(fit_full), np.asarray(fit_res))
    np.testing.assert_array_equal(
        np.asarray(pop_full.ops), np.asarray(pop_res.ops)
    )
    # history: gens 0-2 come from the checkpoint, 3-5 from the resumed scan
    np.testing.assert_array_equal(np.asarray(bf_full), np.asarray(bf_res))

    # resuming the FINAL checkpoint (a completed run, start_gen == G): no
    # generations left to scan — fit() must return the saved history and
    # re-evaluate the final population instead of scanning an empty range
    done = str(tmp_path / "run_6.npz")
    bf_done, _, pop_done, fit_done = make().fit(
        jr.PRNGKey(5), data, resume_from=done
    )
    np.testing.assert_array_equal(np.asarray(bf_full), np.asarray(bf_done))
    np.testing.assert_array_equal(
        np.asarray(pop_full.ops), np.asarray(pop_done.ops)
    )
    assert np.isfinite(np.asarray(fit_done)).all()
    assert np.asarray(fit_done).shape == np.asarray(fit_full).shape


def test_to_callable_matches_tree_evaluator(sr_setup):
    strategy, _data = sr_setup
    pops = strategy.initialize_population(jr.PRNGKey(7))
    candidate = jax.tree_util.tree_map(lambda x: x[0, 0], pops)

    f = strategy.to_callable(candidate)
    batch = jr.normal(jr.PRNGKey(8), (5, 2))
    out = f(batch)
    assert out.shape == (5, strategy.num_trees)

    want = jax.vmap(lambda v: strategy.tree_evaluator(candidate, v))(batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)

    # plain JAX callable: vmap/grad compose
    g = jax.grad(lambda v: jnp.sum(f(v)))(batch[0])
    assert g.shape == (2,) and np.isfinite(np.asarray(g)).all()
