"""Lane-parallel tile surgery vs the per-tree XLA ops (CPU, exact checks).

The Pallas reproduction kernel's entire algorithm lives in
``core.tile_surgery`` as pure jnp on (N, L) tiles; these tests pin it against
the splice/crossover/mutation implementations it replaces and against the
tree-tensor invariants."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core import tile_surgery as ts
from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.core.trees import (
    TreeTensors,
    rebuild_pointers,
    subtree_span_at,
    tree_sizes,
    validate_host,
)
from multitreegp_tpu.ops.initialization import make_population_sampler
from multitreegp_tpu.ops.splice import compose1, compose2, extract_subtree, splice

N = 32
L = 64


@pytest.fixture(scope="module")
def setup():
    ops = [
        ("+", jnp.add, 2, 0.5),
        ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5),
        ("/", jnp.divide, 2, 0.1),
        ("sin", jnp.sin, 1, 0.3),
    ]
    fset = build_function_set(ops, [["x0", "x1"]], [2])
    cfg = ts.make_config(fset, N, max_init_depth=4)
    pop = make_population_sampler(fset, 4, N)(jr.PRNGKey(0), L)
    # lane-major tiles of tree slot 0
    trees = pop[:, 0]
    tiles = (trees.ops.T, trees.const.T)  # (N, L)
    return fset, cfg, trees, tiles


def _lanes(trees: TreeTensors):
    return trees.ops.T, trees.const.T


def test_sizes_span_match(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    np.testing.assert_array_equal(
        np.asarray(ts.sizes_tile(ops_t)[0]), np.asarray(tree_sizes(trees))
    )
    idx = jr.randint(jr.PRNGKey(1), (L,), 0, N)
    # restrict to non-empty rows so spans are meaningful
    size = tree_sizes(trees)
    idx = jnp.maximum(idx, N - size)  # rows inside the tree
    ref = jax.vmap(lambda t, i: subtree_span_at(t.ops, fset.slots, i))(trees, idx)
    got = ts.span_at(ops_t, idx[None, :], cfg)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_extract_and_splice_match(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    size = tree_sizes(trees)
    idx = jnp.maximum(jr.randint(jr.PRNGKey(2), (L,), 0, N), N - size)
    span_ref = jax.vmap(lambda t, i: subtree_span_at(t.ops, fset.slots, i))(trees, idx)

    blk_ref = jax.vmap(extract_subtree)(trees, idx, span_ref)
    b_ops, b_const = ts.extract_block(ops_t, const_t, idx[None, :], span_ref[None, :])
    np.testing.assert_array_equal(np.asarray(b_ops), np.asarray(blk_ref.ops.T))
    np.testing.assert_allclose(np.asarray(b_const), np.asarray(blk_ref.const.T))

    # splice each extracted block into a DIFFERENT tree (rolled by one lane)
    roll = lambda x: jnp.roll(x, 1, axis=0)
    blk2 = jax.tree_util.tree_map(roll, blk_ref)
    bs2 = roll(span_ref)
    # only lanes where the splice fits (delta <= empty)
    fits = (bs2 - span_ref) <= (N - size)
    out_ref = jax.vmap(splice)(trees, idx, span_ref, blk2, bs2)
    o_ops, o_const = ts.splice_tiles(
        ops_t, const_t, idx[None, :], span_ref[None, :],
        blk2.ops.T, blk2.const.T, bs2[None, :],
    )
    m = np.asarray(fits)
    np.testing.assert_array_equal(np.asarray(o_ops.T)[m], np.asarray(out_ref.ops)[m])
    np.testing.assert_allclose(np.asarray(o_const.T)[m], np.asarray(out_ref.const)[m])


def test_compose_match(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    size = tree_sizes(trees)
    # whole tree as block (valid root-last block by construction)
    op_plus = jnp.full((L,), 2, jnp.int32)  # "+"
    ref_blk, ref_size = jax.vmap(lambda t, s: compose1(jnp.int32(5), t, s))(trees, size)
    got_ops, got_const, got_size = ts.compose1_tiles(
        jnp.full((1, L), 5, jnp.int32), ops_t, const_t, size[None, :]
    )
    fits = np.asarray(size) < N
    np.testing.assert_array_equal(np.asarray(got_ops.T)[fits], np.asarray(ref_blk.ops)[fits])
    np.testing.assert_array_equal(np.asarray(got_size[0])[fits], np.asarray(ref_size)[fits])

    roll = lambda x: jnp.roll(x, 1, axis=0)
    other = jax.tree_util.tree_map(roll, trees)
    osize = roll(size)
    ref2, ref2_size = jax.vmap(lambda a, sa, b, sb: compose2(jnp.int32(2), a, sa, b, sb))(
        trees, size, other, osize
    )
    g2_ops, g2_const, g2_size = ts.compose2_tiles(
        jnp.full((1, L), 2, jnp.int32), ops_t, const_t, size[None, :],
        other.ops.T, other.const.T, osize[None, :],
    )
    fits = np.asarray(size + osize + 1) <= N
    np.testing.assert_array_equal(np.asarray(g2_ops.T)[fits], np.asarray(ref2.ops)[fits])
    np.testing.assert_allclose(np.asarray(g2_const.T)[fits], np.asarray(ref2.const)[fits])
    np.testing.assert_array_equal(np.asarray(g2_size[0])[fits], np.asarray(ref2_size)[fits])


def test_rebuild_pointers(setup):
    fset, cfg, trees, _ = setup
    c1, c2 = rebuild_pointers(trees.ops, fset.slots)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(trees.c1))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(trees.c2))


def _to_trees(ops_t, const_t, slots):
    ops = ops_t.T
    c1, c2 = rebuild_pointers(ops, slots)
    return TreeTensors(ops, c1, c2, const_t.T)


def test_sample_tree_tile_valid_and_law(setup):
    fset, cfg, trees, _ = setup
    vmask = jnp.broadcast_to(fset.variable_mask[0][:, None], (fset.num_variables, L))
    urand = ts.make_host_rand(jr.PRNGKey(3), L)
    o, c, size = ts.sample_tree_tile(urand, vmask, cfg, 4)
    out = _to_trees(o, c, fset.slots)
    validate_host(out, fset.slots)
    np.testing.assert_array_equal(np.asarray(size[0]), np.asarray(tree_sizes(out)))
    # law sanity: mean size within 25% of the XLA sampler's
    ref_sizes = np.asarray(tree_sizes(trees))
    got_sizes = np.asarray(size[0])
    assert abs(got_sizes.mean() - ref_sizes.mean()) < 0.25 * ref_sizes.mean() + 1.0


def test_choose_row_law(setup):
    fset, cfg, trees, _ = setup
    w = jnp.zeros((N, 2048)).at[3].set(1.0).at[7].set(3.0)
    u = jr.uniform(jr.PRNGKey(4), (N, 2048))
    idx = np.asarray(ts.choose_row(w, u)[0])
    assert set(np.unique(idx)) == {3, 7}
    frac = (idx == 7).mean()
    assert abs(frac - 0.75) < 0.04


def test_crossover_tiles_invariants(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    roll = lambda x: jnp.roll(x, 1, axis=1)
    o2, c2 = roll(ops_t), roll(const_t)
    urand = ts.make_host_rand(jr.PRNGKey(5), L)
    x1o, x1c, x2o, x2c = ts.crossover_tiles(ops_t, const_t, o2, c2, urand, cfg)
    t1 = _to_trees(x1o, x1c, fset.slots)
    t2 = _to_trees(x2o, x2c, fset.slots)
    validate_host(t1, fset.slots)
    validate_host(t2, fset.slots)
    # node conservation: children rows = parents rows as multisets per lane
    for lane in range(0, L, 7):
        parents = sorted(
            np.asarray(ops_t[:, lane]).tolist() + np.asarray(o2[:, lane]).tolist()
        )
        children = sorted(
            np.asarray(x1o[:, lane]).tolist() + np.asarray(x2o[:, lane]).tolist()
        )
        assert parents == children
    # crossover should actually change most lanes
    changed = (np.asarray(x1o) != np.asarray(ops_t)).any(axis=0)
    assert changed.mean() > 0.5


def test_mutate_tiles_invariants(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    vmask = jnp.broadcast_to(fset.variable_mask[0][:, None], (fset.num_variables, L))
    urand = ts.make_host_rand(jr.PRNGKey(6), L)
    f_o, f_c, _ = ts.sample_tree_tile(urand, vmask, cfg, cfg.max_init_depth)
    mo, mc = ts.mutate_tiles(ops_t, const_t, vmask, urand, cfg, f_o, f_c)
    out = _to_trees(mo, mc, fset.slots)
    validate_host(out, fset.slots)
    changed = (np.asarray(mo) != np.asarray(ops_t)).any(axis=0) | (
        np.asarray(mc) != np.asarray(const_t)
    ).any(axis=0)
    assert changed.mean() > 0.7  # only rare no-op fallbacks may pass through


def test_reproduce_tiles_actions(setup):
    fset, cfg, trees, (ops_t, const_t) = setup
    roll = lambda x: jnp.roll(x, 1, axis=1)
    p2o, p2c = roll(ops_t), roll(const_t)
    vmask = jnp.broadcast_to(fset.variable_mask[0][:, None], (fset.num_variables, L))
    urand = ts.make_host_rand(jr.PRNGKey(7), L)

    third = L // 3
    cx = (jnp.arange(L) < third)[None, :]
    act1 = jnp.where(
        jnp.arange(L)[None, :] < 2 * third, jnp.int32(1), jnp.int32(2)
    ) * (~cx)
    act0 = jnp.zeros((1, L), jnp.int32)

    c1o, c1c, c2o, c2c = ts.reproduce_tiles(
        ops_t, const_t, p2o, p2c, cx, act1, act0, vmask, urand, cfg
    )
    validate_host(_to_trees(c1o, c1c, fset.slots), fset.slots)
    validate_host(_to_trees(c2o, c2c, fset.slots), fset.slots)
    # child 2: passthrough outside crossover lanes
    m = ~np.asarray(cx)[0]
    np.testing.assert_array_equal(np.asarray(c2o)[:, m], np.asarray(p2o)[:, m])
    # child 1 fresh lanes: trees replaced (statistically certain to differ)
    fresh = np.asarray(act1)[0] == 2
    assert (np.asarray(c1o)[:, fresh] != np.asarray(ops_t)[:, fresh]).any(axis=0).mean() > 0.9


def test_compact_rows_matches_per_lane_scatter(setup):
    """Butterfly compaction == stable per-lane packing, all sizes/densities."""
    for n in (8, 32, 128):
        l = 256
        k1, k2, k3, k4 = jr.split(jr.fold_in(jr.PRNGKey(9), n), 4)
        frac = jr.uniform(k1, (1, l))
        kept = jr.uniform(k2, (n, l)) < frac  # incl. near-empty + near-full
        ops = jnp.where(kept, jr.randint(k3, (n, l), 1, 9), 0)
        const = jnp.where(kept, jr.normal(k4, (n, l)), 0.0)
        o, c = jax.jit(ts.compact_rows)(ops, const)
        on, cn = np.asarray(ops), np.asarray(const)
        oo, co = np.asarray(o), np.asarray(c)
        for lane in range(l):
            m = on[:, lane] != 0
            pad = n - int(m.sum())
            np.testing.assert_array_equal(
                oo[:, lane], np.concatenate([np.zeros(pad, on.dtype), on[m, lane]])
            )
            np.testing.assert_array_equal(
                co[:, lane], np.concatenate([np.zeros(pad, cn.dtype), cn[m, lane]])
            )
