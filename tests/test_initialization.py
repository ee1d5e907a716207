"""Property tests for grow-initialization: every sampled tree satisfies the
tree-tensor invariants and respects depth / variable-mask constraints."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import validate_host, tree_sizes, subtree_spans, CONST
from multitreegp_tpu.ops.initialization import make_population_sampler, make_tree_sampler, make_bfs_tables


@pytest.fixture
def fset():
    ops = default_sr_operators() + [("sin", jnp.sin, 1, 0.3)]
    return build_function_set(ops, [["x0", "x1"], ["a0"]], [2, 1])


def test_bfs_tables_permutation():
    t = make_bfs_tables(4)
    pos = np.asarray(t.dfs_pos)
    assert sorted(pos) == list(range(15))
    # root is last, left child of root directly below
    assert pos[0] == 14 and pos[1] == 13


def test_population_invariants(fset):
    sampler = make_population_sampler(fset, max_init_depth=4, max_nodes=32)
    pop = jax.jit(sampler, static_argnums=1)(jr.PRNGKey(0), 64)
    assert pop.ops.shape == (64, 3, 32)
    validate_host(pop, fset.slots)


def test_sizes_and_depth(fset):
    sampler = make_population_sampler(fset, max_init_depth=3, max_nodes=32)
    pop = sampler(jr.PRNGKey(1), 128)
    sizes = np.asarray(tree_sizes(pop))
    assert sizes.min() >= 1
    assert sizes.max() <= 2**3 - 1  # depth-3 grow => at most 7 nodes


def test_variable_masks_respected(fset):
    sampler = make_population_sampler(fset, max_init_depth=4, max_nodes=32)
    pop = sampler(jr.PRNGKey(2), 128)
    ops = np.asarray(pop.ops)
    var_start = fset.var_start
    # layer 0 (trees 0,1) may use x0,x1 (opcodes var_start, var_start+1);
    # layer 1 (tree 2) only a0 (var_start+2)
    layer0 = ops[:, :2, :]
    layer1 = ops[:, 2, :]
    assert not np.any(layer0 == var_start + 2)
    assert not np.any(layer1 == var_start)
    assert not np.any(layer1 == var_start + 1)
    # a0 actually appears somewhere
    assert np.any(layer1 == var_start + 2)


def test_depth_limit_one_gives_leaves(fset):
    sample_tree = make_tree_sampler(fset, max_init_depth=4, max_nodes=32)
    keys = jr.split(jr.PRNGKey(3), 64)
    trees = jax.vmap(lambda k: sample_tree(k, jnp.int32(1), fset.variable_mask[0]))(keys)
    sizes = np.asarray(tree_sizes(trees))
    assert (sizes == 1).all()


def test_subtree_spans_consistent(fset):
    sampler = make_population_sampler(fset, max_init_depth=4, max_nodes=32)
    pop = sampler(jr.PRNGKey(4), 32)
    spans = np.asarray(subtree_spans(pop.ops, fset.slots))
    sizes = np.asarray(tree_sizes(pop))
    # root's span equals the tree size
    np.testing.assert_array_equal(spans[..., -1], sizes)
    # leaf rows have span 1
    ops = np.asarray(pop.ops)
    leaf = (ops == CONST) | (ops >= fset.var_start)
    assert (spans[leaf] == 1).all()


def test_deterministic(fset):
    sampler = make_population_sampler(fset, max_init_depth=4, max_nodes=32)
    a = sampler(jr.PRNGKey(5), 8)
    b = sampler(jr.PRNGKey(5), 8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
