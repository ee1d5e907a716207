"""Population initialization (grow-style sampling).

Behavioural spec from the reference (``MultiTreeGP/genetic_operators/
initialization.py:9-164``): nodes are sampled in breadth-first order over a
full binary buffer of ``2**max_init_depth - 1`` slots; the probability of
drawing an operator decays as ``0.7**depth``; leaves are 50/50 constant vs
variable (variables masked per tree); a node is forced EMPTY when its parent
is a leaf/unary-without-second-slot or when the open-slot budget hits the
``max_nodes`` cap; finally empty rows are compacted so the tree is root-last
with padding packed at the front.

TPU-first redesign: the reference's per-node ``fori_loop`` body does scalar
work and its ``prune_tree`` is a second sequential ``fori_loop``
(``initialization.py:82-98``). Here:

* sampling is one ``lax.scan`` over the BFS slots whose body is fully
  vectorised over all lanes (population × trees) — the only sequential axis is
  the 2**d-1 BFS slots, which is irreducible (each decision depends on the
  parent's opcode and the open-slot budget);
* the BFS->depth-first permutation is a host-precomputed index table applied
  as one scatter (the reference rebuilds the map at trace time per node);
* compaction ("pruning") is a closed-form suffix-sum + scatter instead of a
  sequential loop: every non-empty depth-first row ``i`` lands at
  ``N - suffix_count(i)`` where ``suffix_count`` counts non-empty rows at
  positions >= i, and child pointers are remapped by the same formula.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array

from ..core.registry import FunctionSet
from ..core.trees import CONST, EMPTY, TreeTensors


class BfsTables(NamedTuple):
    """Host-precomputed BFS layout tables for a full binary buffer of depth d."""

    size: int  # S = 2**d - 1
    depth: Array  # (S,) int32: BFS node depth
    dfs_pos: Array  # (S,) int32: row of BFS node i in the depth-first (root-last) buffer
    left_dfs: Array  # (S,) int32: dfs row of BFS left child (or -1 at last level)
    right_dfs: Array  # (S,) int32: dfs row of BFS right child (or -1)
    decay: Array  # (S,) float32: 0.7**depth operator-probability decay


def make_bfs_tables(max_init_depth: int) -> BfsTables:
    """Build the BFS->DFS index tables on host.

    The depth-first layout is root-LAST: ``pos(root) = S-1``; a node's first
    child sits directly below it and the second child below the first child's
    (full-buffer) subtree. Equivalent to the reference's ``create_map_b_to_d``
    (``genetic_programming.py:272-296``).
    """
    d = max_init_depth
    s = 2**d - 1
    pos = np.zeros(s, dtype=np.int64)
    depth = np.zeros(s, dtype=np.int64)
    pos[0] = s - 1
    for i in range(s):
        l, r = 2 * i + 1, 2 * i + 2
        if l < s:
            depth[l] = depth[r] = depth[i] + 1
            # remaining full-subtree size below a child of node at depth depth[i]+1
            child_span = 2 ** (d - depth[i] - 1) - 1
            pos[l] = pos[i] - 1
            pos[r] = pos[i] - 1 - child_span
    left = np.full(s, -1, dtype=np.int64)
    right = np.full(s, -1, dtype=np.int64)
    for i in range(s):
        if 2 * i + 2 < s:
            left[i] = pos[2 * i + 1]
            right[i] = pos[2 * i + 2]
    return BfsTables(
        size=s,
        depth=jnp.asarray(depth, jnp.int32),
        dfs_pos=jnp.asarray(pos, jnp.int32),
        left_dfs=jnp.asarray(left, jnp.int32),
        right_dfs=jnp.asarray(right, jnp.int32),
        decay=jnp.asarray(0.7 ** depth.astype(np.float64), jnp.float32),
    )


def _compact(ops_dfs: Array, c1_dfs: Array, c2_dfs: Array, const_dfs: Array, max_nodes: int) -> TreeTensors:
    """Pack non-empty depth-first rows to the back of an (N,)-row tree.

    Vectorised replacement for the reference's sequential ``prune_tree``
    (``initialization.py:82-98``). Works for any source buffer size S <= N.
    """
    s = ops_dfs.shape[-1]
    keep = ops_dfs != EMPTY
    # suffix[i] = number of kept rows at positions >= i
    suffix = jnp.cumsum(keep[::-1].astype(jnp.int32))[::-1]
    new_idx = jnp.where(keep, max_nodes - suffix, max_nodes)  # N => dropped

    def remap(ptr):
        # child pointers are kept rows by construction
        tgt = jnp.where(ptr >= 0, max_nodes - suffix[jnp.clip(ptr, 0, s - 1)], -1)
        return tgt.astype(jnp.int32)

    ops = jnp.zeros(max_nodes, jnp.int32).at[new_idx].set(ops_dfs, mode="drop")
    c1 = jnp.full(max_nodes, -1, jnp.int32).at[new_idx].set(remap(c1_dfs), mode="drop")
    c2 = jnp.full(max_nodes, -1, jnp.int32).at[new_idx].set(remap(c2_dfs), mode="drop")
    const = jnp.zeros(max_nodes, jnp.float32).at[new_idx].set(const_dfs, mode="drop")
    return TreeTensors(ops, c1, c2, const)


def make_tree_sampler(fset: FunctionSet, max_init_depth: int, max_nodes: int, coefficient_sd: float = 1.0):
    """Return ``sample_tree(key, depth_limit, variable_mask) -> TreeTensors``.

    ``depth_limit`` may be traced (mutations sample depth-1/2 subtrees with the
    same machinery, mirroring reference ``mutation.py:149,226,273``).
    """
    tables = make_bfs_tables(max_init_depth)
    s = tables.size
    slots = fset.slots
    op_indices = fset.operator_indices
    op_probs = fset.operator_probs
    var_indices = fset.variable_indices
    # BFS parent's dfs position, and whether this BFS slot is a left child
    parent = jnp.asarray([(i + (i % 2) - 2) // 2 if i > 0 else 0 for i in range(s)], jnp.int32)
    parent_dfs = tables.dfs_pos[parent]
    is_left = jnp.asarray([i % 2 == 1 for i in range(s)], jnp.bool_)

    def sample_tree(key: Array, depth_limit: Array, variable_mask: Array) -> TreeTensors:
        keys = jr.split(key, s)
        xs = (jnp.arange(s, dtype=jnp.int32), keys, tables.depth, tables.decay, parent_dfs, is_left)

        def body(carry, x):
            ops_dfs, const_dfs, open_slots = carry
            i, k, depth, decay, p_dfs, left = x
            k_coeff, k_leaf, k_var, k_node, k_op = jr.split(k, 5)
            coefficient = jr.normal(k_coeff) * coefficient_sd
            leaf = jax.lax.select(
                jr.uniform(k_leaf) < 0.5,
                jnp.int32(CONST),
                jr.choice(k_var, var_indices, shape=(), p=variable_mask).astype(jnp.int32),
            )
            operator = jr.choice(k_op, op_indices, shape=(), p=op_probs).astype(jnp.int32)
            grow = (open_slots < max_nodes - i - 1) & (depth + 1 < depth_limit)
            index = jnp.where(grow & (jr.uniform(k_node) < decay), operator, leaf)
            index = jnp.where(open_slots == 0, EMPTY, index)
            # parent must have an open slot for this child position
            parent_op = ops_dfs[p_dfs]
            has_slot = slots[jnp.maximum(parent_op, 0)] + left.astype(jnp.int32) > 1
            index = jnp.where((i > 0) & ~has_slot, EMPTY, index)

            dfs_i = tables.dfs_pos[i]
            ops_dfs = ops_dfs.at[dfs_i].set(index)
            const_dfs = const_dfs.at[dfs_i].set(jnp.where(index == CONST, coefficient, 0.0))
            open_slots = jnp.where(
                index == EMPTY, open_slots, jnp.maximum(0, open_slots + slots[index] - 1)
            )
            return (ops_dfs, const_dfs, open_slots), None

        init = (jnp.zeros(s, jnp.int32), jnp.zeros(s, jnp.float32), jnp.int32(1))
        (ops_dfs, const_dfs, _), _ = jax.lax.scan(body, init, xs)

        # child pointers in dfs space: only operator rows reference children
        arity = slots[ops_dfs]
        # scatter: the dfs row of BFS node i gets children tables (host-precomputed)
        left_tbl = jnp.full(s, -1, jnp.int32).at[tables.dfs_pos].set(tables.left_dfs)
        right_tbl = jnp.full(s, -1, jnp.int32).at[tables.dfs_pos].set(tables.right_dfs)
        c1_dfs = jnp.where(arity >= 1, left_tbl, -1)
        c2_dfs = jnp.where(arity >= 2, right_tbl, -1)
        return _compact(ops_dfs, c1_dfs, c2_dfs, const_dfs, max_nodes)

    return sample_tree


def make_population_sampler(fset: FunctionSet, max_init_depth: int, max_nodes: int, coefficient_sd: float = 1.0):
    """Return ``sample_population(key, population_size) -> TreeTensors``.

    Output batch shape is ``(population_size, num_trees)``; each tree uses its
    layer's variable mask (reference ``sample_population``,
    ``initialization.py:144-164``).
    """
    sample_tree = make_tree_sampler(fset, max_init_depth, max_nodes, coefficient_sd)
    num_trees = fset.num_trees

    def sample_candidate(key: Array) -> TreeTensors:
        keys = jr.split(key, num_trees)
        return jax.vmap(sample_tree, in_axes=(0, None, 0))(
            keys, jnp.int32(max_init_depth), fset.variable_mask
        )

    def sample_population(key: Array, population_size: int) -> TreeTensors:
        keys = jr.split(key, population_size)
        return jax.vmap(sample_candidate)(keys)

    return sample_population
