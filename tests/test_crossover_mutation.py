"""Crossover and all seven mutation operators preserve tree invariants,
variable masks and max_nodes budgets on thousands of random trees."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import tree_sizes, validate_host
from multitreegp_tpu.ops.initialization import make_tree_sampler
from multitreegp_tpu.ops.crossover import crossover_candidates, crossover_trees
from multitreegp_tpu.ops.mutation import make_mutators

N = 32


@pytest.fixture(scope="module")
def setup():
    ops = default_sr_operators() + [("sin", jnp.sin, 1, 0.3), ("cos", jnp.cos, 1, 0.3)]
    fset = build_function_set(ops, [["x0", "x1"], ["a0"]], [2, 1])
    sample_tree = make_tree_sampler(fset, max_init_depth=4, max_nodes=N)
    mutate_candidate, mutate_tree, mutators = make_mutators(
        fset, sample_tree, max_nodes=N, max_init_depth=4
    )
    return fset, sample_tree, mutate_candidate, mutate_tree, mutators


def _trees(sample_tree, fset, key, count, mask_row=0):
    keys = jr.split(key, count)
    return jax.vmap(lambda k: sample_tree(k, jnp.int32(4), fset.variable_mask[mask_row]))(keys)


def test_crossover_invariants(setup):
    fset, sample_tree, *_ = setup
    t1 = _trees(sample_tree, fset, jr.PRNGKey(0), 128)
    t2 = _trees(sample_tree, fset, jr.PRNGKey(1), 128)
    keys = jr.split(jr.PRNGKey(2), 128)
    c1, c2 = jax.jit(jax.vmap(lambda a, b, k: crossover_trees(a, b, k, fset)))(t1, t2, keys)
    validate_host(c1, fset.slots)
    validate_host(c2, fset.slots)
    # node conservation: sizes swap subtree sizes
    s_in = np.asarray(tree_sizes(t1)) + np.asarray(tree_sizes(t2))
    s_out = np.asarray(tree_sizes(c1)) + np.asarray(tree_sizes(c2))
    np.testing.assert_array_equal(s_in, s_out)
    # crossover actually changes something most of the time
    changed = np.any(np.asarray(c1.ops) != np.asarray(t1.ops), axis=-1)
    assert changed.mean() > 0.5


def test_crossover_candidates_mask(setup):
    fset, sample_tree, *_ = setup
    def cand(key):
        keys = jr.split(key, fset.num_trees)
        return jax.vmap(sample_tree, in_axes=(0, None, 0))(keys, jnp.int32(4), fset.variable_mask)
    p1 = jax.vmap(cand)(jr.split(jr.PRNGKey(3), 32))
    p2 = jax.vmap(cand)(jr.split(jr.PRNGKey(4), 32))
    keys = jr.split(jr.PRNGKey(5), 32)
    c1, c2 = jax.jit(
        jax.vmap(lambda a, b, k: crossover_candidates(a, b, k, 0.5, fset))
    )(p1, p2, keys)
    validate_host(c1, fset.slots)
    validate_host(c2, fset.slots)
    # at least one tree per candidate differs (forced mask)
    diff = np.any(np.asarray(c1.ops) != np.asarray(p1.ops), axis=-1)  # (32, trees)
    # crossover may no-op when no valid pair exists, but overall most do
    assert diff.any(axis=-1).mean() > 0.8


@pytest.mark.parametrize("mut_idx", range(7))
def test_mutation_invariants(setup, mut_idx):
    fset, sample_tree, _, _, mutators = setup
    trees = _trees(sample_tree, fset, jr.PRNGKey(10 + mut_idx), 256)
    keys = jr.split(jr.PRNGKey(100 + mut_idx), 256)
    fn = mutators[mut_idx]
    out = jax.jit(jax.vmap(lambda t, k: fn(t, k, fset.variable_mask[0])))(trees, keys)
    validate_host(out, fset.slots)
    sizes = np.asarray(tree_sizes(out))
    assert sizes.max() <= N
    # layer-0 variable mask respected: a0 (last variable) never appears
    assert not np.any(np.asarray(out.ops) == fset.var_start + 2)


def test_mutate_leaf_changes_leaf(setup):
    fset, sample_tree, _, _, mutators = setup
    trees = _trees(sample_tree, fset, jr.PRNGKey(20), 256)
    keys = jr.split(jr.PRNGKey(21), 256)
    out = jax.vmap(lambda t, k: mutators[1](t, k, fset.variable_mask[0]))(trees, keys)
    # sizes unchanged, exactly one row differs in opcode or const
    np.testing.assert_array_equal(np.asarray(tree_sizes(out)), np.asarray(tree_sizes(trees)))
    ops_diff = (np.asarray(out.ops) != np.asarray(trees.ops)).sum(-1)
    const_diff = (np.asarray(out.const) != np.asarray(trees.const)).sum(-1)
    assert ((ops_diff + const_diff) >= 1).mean() > 0.95
    assert (ops_diff <= 1).all()


def test_mutate_candidate_forced_mask(setup):
    fset, sample_tree, mutate_candidate, *_ = setup
    def cand(key):
        keys = jr.split(key, fset.num_trees)
        return jax.vmap(sample_tree, in_axes=(0, None, 0))(keys, jnp.int32(4), fset.variable_mask)
    pop = jax.vmap(cand)(jr.split(jr.PRNGKey(30), 64))
    keys = jr.split(jr.PRNGKey(31), 64)
    out = jax.jit(
        jax.vmap(lambda t, k: mutate_candidate(t, k, 0.3, fset.variable_mask))
    )(pop, keys)
    validate_host(out, fset.slots)
    # layer masks respected per tree
    ops = np.asarray(out.ops)
    assert not np.any(ops[:, :2, :] == fset.var_start + 2)
    assert not np.any(ops[:, 2, :] == fset.var_start)
