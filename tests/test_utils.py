"""Checkpoint round-trip, population statistics, throughput cost model,
phase timer, and string rendering."""
import os

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.core.trees import TreeTensors
from multitreegp_tpu.ops.initialization import make_population_sampler
from multitreegp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from multitreegp_tpu.utils.metrics import node_evals_per_evaluation, population_stats
from multitreegp_tpu.utils.profiling import PhaseTimer
from multitreegp_tpu.utils.render import candidate_to_string


def _fset():
    ops = [("+", jnp.add, 2), ("*", jnp.multiply, 2)]
    return build_function_set(ops, [["x0", "x1"]], [2])


def test_checkpoint_roundtrip(tmp_path):
    fset = _fset()
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 8)
    pops = jax.tree_util.tree_map(lambda x: x[None], pop)  # island axis
    key = jr.PRNGKey(7)
    best = jax.tree_util.tree_map(lambda x: x[0, 0], pops)
    path = str(tmp_path / "ckpt.npz")

    save_checkpoint(
        path, pops, key, 12,
        best_fitnesses=jnp.asarray([3.0, 2.0]),
        best_solutions=best,
        extra={"note": np.asarray(42)},
    )
    state = load_checkpoint(path)
    assert state["generation"] == 12
    np.testing.assert_array_equal(np.asarray(state["key"]), np.asarray(key))
    for field in ("ops", "c1", "c2", "const"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state["populations"], field)),
            np.asarray(getattr(pops, field)),
        )
    np.testing.assert_array_equal(
        np.asarray(state["best_fitnesses"]), np.asarray([3.0, 2.0])
    )
    assert int(state["extra"]["note"]) == 42
    assert not os.path.exists(path + ".tmp"), "no torn temp file left behind"


def test_population_stats_jittable():
    fset = _fset()
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 32)
    pops = jax.tree_util.tree_map(lambda x: x[None], pop)
    fitness = jr.uniform(jr.PRNGKey(1), (1, 32))
    stats = jax.jit(population_stats)(pops, fitness)
    assert set(stats) >= {
        "fitness_min", "fitness_median", "fitness_mean",
        "size_mean", "size_max", "unique_fraction",
    }
    assert float(stats["fitness_min"]) <= float(stats["fitness_median"])
    assert 0.0 < float(stats["unique_fraction"]) <= 1.0


def test_duplicate_detection_in_stats():
    fset = _fset()
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 16)
    # clone candidate 0 over the whole population -> unique fraction 1/16
    cloned = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[:1], x.shape), pop
    )
    pops = jax.tree_util.tree_map(lambda x: x[None], cloned)
    stats = population_stats(pops, jnp.zeros((1, 16)))
    assert abs(float(stats["unique_fraction"]) - 1 / 16) < 1e-6


def test_node_evals_cost_model():
    n = node_evals_per_evaluation(
        population_size=10, num_trees=2, max_nodes=8,
        batch_size=4, num_save_points=5, substeps=2, method="rk4",
    )
    assert n == (5 - 1) * 2 * 4 * (10 * 4 * 2) * 8


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] > 0
    assert "a" in str(t)


def test_render_simple_expression():
    fset = _fset()
    # x0 * 2.0 : rows [pad..., x0, const 2.0, *(c1=x0_row, c2=const_row)]
    n = 8
    ops = np.zeros(n, np.int32)
    c1 = np.full(n, -1, np.int32)
    c2 = np.full(n, -1, np.int32)
    const = np.zeros(n, np.float32)
    var_x0 = fset.var_start
    mul = None
    for k, name in enumerate(fset.operator_names):
        if name == "*":
            mul = 2 + k  # OP_START + k
    ops[5], ops[6], ops[7] = var_x0, 1, mul
    const[6] = 2.0
    c1[7], c2[7] = 6, 5
    cand = TreeTensors(
        jnp.asarray(ops)[None], jnp.asarray(c1)[None],
        jnp.asarray(c2)[None], jnp.asarray(const)[None],
    )
    s = candidate_to_string(cand, fset)
    assert "x0" in s and "2" in s
