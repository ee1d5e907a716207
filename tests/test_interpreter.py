"""Interpreter correctness: hand-built trees vs direct numpy evaluation."""
import jax.numpy as jnp
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import TreeTensors
from multitreegp_tpu.core.interpreter import evaluate_trees, make_candidate_evaluator


@pytest.fixture
def fset():
    ops = default_sr_operators() + [("sin", jnp.sin, 1, 0.1)]
    return build_function_set(ops, [["x0", "x1"]], [1])


def make_tree(rows, n=16):
    """rows: list of (op, c1, c2, const) bottom-to-top, root last."""
    pad = n - len(rows)
    ops = [0] * pad + [r[0] for r in rows]
    c1 = [-1] * pad + [r[1] + pad if r[1] >= 0 else -1 for r in rows]
    c2 = [-1] * pad + [r[2] + pad if r[2] >= 0 else -1 for r in rows]
    const = [0.0] * pad + [r[3] for r in rows]
    return TreeTensors(
        jnp.asarray(ops, jnp.int32),
        jnp.asarray(c1, jnp.int32),
        jnp.asarray(c2, jnp.int32),
        jnp.asarray(const, jnp.float32),
    )


def test_single_ops(fset):
    # opcodes: +=2, -=3, *=4, /=5, sin=6, x0=7, x1=8
    x0, x1 = 1.5, -0.75
    data = jnp.asarray([x0, x1])
    # (x0 + 2.5) * x1  rows: x1, x0, 2.5, +, *  (root last, c1 directly below)
    tree = make_tree([
        (8, -1, -1, 0.0),   # 0: x1
        (7, -1, -1, 0.0),   # 1: x0
        (1, -1, -1, 2.5),   # 2: const
        (2, 2, 1, 0.0),     # 3: + (c1=const? order: c1 below parent) -> 2.5 + x0
        (4, 3, 0, 0.0),     # 4: * -> (+) * x1
    ])
    out = evaluate_trees(tree, data, fset)
    np.testing.assert_allclose(out, (2.5 + x0) * x1, rtol=1e-6)


def test_unary(fset):
    data = jnp.asarray([0.3, 2.0])
    # sin(x0) - x1/x0
    tree = make_tree([
        (7, -1, -1, 0.0),   # 0: x0
        (8, -1, -1, 0.0),   # 1: x1
        (5, 1, 0, 0.0),     # 2: x1 / x0
        (7, -1, -1, 0.0),   # 3: x0
        (6, 3, -1, 0.0),    # 4: sin(x0)
        (3, 4, 2, 0.0),     # 5: sin(x0) - x1/x0
    ])
    out = evaluate_trees(tree, data, fset)
    np.testing.assert_allclose(out, np.sin(0.3) - 2.0 / 0.3, rtol=1e-5)


def test_constant_only(fset):
    tree = make_tree([(1, -1, -1, -3.25)])
    out = evaluate_trees(tree, jnp.asarray([1.0, 2.0]), fset)
    np.testing.assert_allclose(out, -3.25)


def test_batched_lanes(fset):
    # same tree over a batch of data rows; tree batch dim broadcast
    tree = make_tree([
        (7, -1, -1, 0.0),
        (8, -1, -1, 0.0),
        (4, 1, 0, 0.0),  # x1 * x0
    ])
    data = jnp.asarray(np.random.RandomState(0).randn(32, 2), jnp.float32)
    out = evaluate_trees(tree, data, fset)
    np.testing.assert_allclose(out, data[:, 0] * data[:, 1], rtol=1e-5)


def test_candidate_evaluator_adapter(fset):
    ev = make_candidate_evaluator(fset)
    t1 = make_tree([(7, -1, -1, 0.0)])
    t2 = make_tree([(8, -1, -1, 0.0)])
    cand = TreeTensors(*[jnp.stack([a, b]) for a, b in zip(t1, t2)])
    out = ev(cand, jnp.asarray([5.0, 7.0]))
    np.testing.assert_allclose(out, [5.0, 7.0])


def test_division_nan_isolated(fset):
    # x0 / x1 with x1 = 0 produces inf on that lane only
    tree = make_tree([
        (8, -1, -1, 0.0),
        (7, -1, -1, 0.0),
        (5, 1, 0, 0.0),  # x0 / x1
    ])
    data = jnp.asarray([[1.0, 0.0], [4.0, 2.0]], jnp.float32)
    out = evaluate_trees(tree, data, fset)
    assert np.isinf(out[0])
    np.testing.assert_allclose(out[1], 2.0)


def test_gradient_through_const(fset):
    import jax

    # d/dc of (c * x0) = x0, with a division elsewhere that would NaN without
    # the double-where guard
    def f(c):
        tree = make_tree([
            (7, -1, -1, 0.0),
            (1, -1, -1, 0.0),
            (4, 1, 0, 0.0),  # c * x0
        ])
        tree = tree._replace(const=tree.const.at[-2].set(c))
        return evaluate_trees(tree, jnp.asarray([3.0, 0.0]), fset)

    g = jax.grad(f)(2.0)
    np.testing.assert_allclose(g, 3.0, rtol=1e-6)


def test_ladder_equals_gather(fset):
    """Both interpreter implementations agree on random populations."""
    import jax.random as jr
    from multitreegp_tpu.core.interpreter import (
        evaluate_trees_gather,
        evaluate_trees_ladder,
    )
    from multitreegp_tpu.ops.initialization import make_population_sampler

    sampler = make_population_sampler(fset, max_init_depth=4, max_nodes=32)
    pop = sampler(jr.PRNGKey(0), 64)  # (64, 1, 32)
    data = jnp.asarray(np.random.RandomState(1).randn(64, 1, 2), jnp.float32)
    a = evaluate_trees_ladder(pop, data, fset)
    b = evaluate_trees_gather(pop, data, fset)
    mask = np.isfinite(np.asarray(a))
    np.testing.assert_allclose(np.asarray(a)[mask], np.asarray(b)[mask], rtol=1e-6)
    np.testing.assert_array_equal(mask, np.isfinite(np.asarray(b)))
