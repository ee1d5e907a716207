"""Seven-operator mutation suite, all derived from the splice primitive.

Behavioural spec from the reference (``MultiTreeGP/genetic_operators/
mutation.py``), operator by operator:

0. ``add_subtree``      (:127): a leaf becomes a fresh depth-2 subtree.
1. ``mutate_leaf``      (:167): a leaf becomes a *different* leaf
   (re-sampling loop :64-78; constants may stay constants).
2. ``mutate_operator``  (:300): an operator becomes a different operator;
   arity changes discard the old operands and sample fresh subtrees
   (depth-2 for 2->1, two depth-1 leaves for 1->2, :200-298); validity
   requires the replacement to fit (hardcoded max sizes 7/8, :99).
3. ``delete_operator``  (:342): a non-root operator subtree becomes a leaf.
4. ``prepend_operator`` (:384): a new operator becomes the root, the old tree
   one operand and (for binary ops) a fresh depth-2 subtree the other; a coin
   flips which side.
5. ``insert_operator``  (:429): a new operator is spliced above a non-root
   operator node, with the old subtree on a coin-flipped side.
6. ``replace_tree``     (:488): resample the whole tree at max_init_depth.

Per-tree applicability masks (``get_mutations``, :523-539):
  - fewer than 8 empty rows: no growth ops -> probs [0,1,1,1,0,0,1]
  - <= 3 nodes: no delete/insert      -> probs [1,1,1,0,1,0,1]
  - == 1 node: additionally no operator mutation -> [1,1,0,0,1,0,1]

TPU-first deltas: every structural edit is extract/compose/splice (pure
gathers; see :mod:`splice`); unbounded rejection ``while_loop``s are replaced
by renormalised sampling (mutate_leaf excludes the old leaf from the draw) or
``MUT_RETRIES`` pre-sampled attempts with a no-op fallback (mutate_operator);
each operator additionally no-ops when its structural preconditions fail so a
fused population kernel can never produce an invalid tree.
"""
from __future__ import annotations


from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax import Array

from ..core.registry import FunctionSet
from ..core.trees import CONST, OP_START, TreeTensors, subtree_span_at, tree_sizes
from .crossover import forced_bernoulli_mask
from .splice import compose1, compose2, extract_subtree, leaf_block, splice

MUT_RETRIES = 8

# probability tables from the reference's get_mutations (mutation.py:534-537)
# (plain numpy so importing the package does not initialise a JAX backend)
_PROBS_DEFAULT = np.ones(7, np.float32)
_PROBS_FULL = np.asarray([0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0], np.float32)
_PROBS_SMALL = np.asarray([1.0, 1.0, 1.0, 0.0, 1.0, 0.0, 1.0], np.float32)
_PROBS_LEAF = np.asarray([1.0, 1.0, 0.0, 0.0, 1.0, 0.0, 1.0], np.float32)


def _where_tree(cond: Array, a: TreeTensors, b: TreeTensors) -> TreeTensors:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(cond, x, y), a, b)


def _leaf_rows(ops: Array, var_start: int) -> Array:
    return (ops == CONST) | (ops >= var_start)


def _operator_rows(ops: Array, var_start: int) -> Array:
    return (ops >= OP_START) & (ops < var_start)


def _choose_row(key: Array, probs: Array) -> Array:
    """Pick a row index with probability proportional to probs (sum > 0)."""
    n = probs.shape[0]
    return jr.choice(key, jnp.arange(n, dtype=jnp.int32), p=probs)


def _sample_leaf(key: Array, fset: FunctionSet, variable_mask: Array, coefficient_sd: float,
                 exclude_var: Array | None = None) -> Tuple[Array, Array]:
    """50/50 constant-vs-variable leaf (reference initialization.py:32).

    ``exclude_var`` (opcode or -1) removes one variable from the draw —
    the bounded replacement for mutate_leaf's resample-until-different loop.
    Falls back to a constant when no variable remains.
    """
    k_kind, k_coeff, k_var = jr.split(key, 3)
    coeff = jr.normal(k_coeff) * coefficient_sd
    p = variable_mask
    if exclude_var is not None:
        idx = jnp.clip(exclude_var - fset.var_start, 0, fset.num_variables - 1)
        p = jnp.where(
            (exclude_var >= fset.var_start)
            & (jnp.arange(fset.num_variables) == idx),
            0.0,
            p,
        )
    has_var = jnp.sum(p) > 0
    var_op = jr.choice(
        k_var, fset.variable_indices, p=jnp.where(has_var, p, jnp.ones_like(p))
    ).astype(jnp.int32)
    take_const = (jr.uniform(k_kind) < 0.5) | ~has_var
    op = jnp.where(take_const, jnp.int32(CONST), var_op)
    return op, jnp.where(take_const, coeff, 0.0)


def make_mutators(
    fset: FunctionSet,
    sample_tree: Callable[[Array, Array, Array], TreeTensors],
    max_nodes: int,
    max_init_depth: int,
    coefficient_sd: float = 1.0,
):
    """Build the seven single-tree mutation fns and the dispatch helpers."""
    n = max_nodes
    slots = fset.slots
    var_start = fset.var_start

    def _block_of(tree: TreeTensors) -> Tuple[TreeTensors, Array]:
        size = tree_sizes(tree)
        return extract_subtree(tree, jnp.int32(n - 1), size), size

    # -- 0: add_subtree ------------------------------------------------------
    def add_subtree(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_sel, k_sub = jr.split(key)
        probs = _leaf_rows(tree.ops, var_start).astype(jnp.float32)
        idx = _choose_row(k_sel, probs)
        sub = sample_tree(k_sub, jnp.int32(2), vmask)
        block, bs = _block_of(sub)
        fits = (n - tree_sizes(tree)) >= bs - 1
        out = splice(tree, idx, jnp.int32(1), block, bs)
        return _where_tree(fits, out, tree)

    # -- 1: mutate_leaf ------------------------------------------------------
    def mutate_leaf(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_sel, k_leaf = jr.split(key)
        probs = _leaf_rows(tree.ops, var_start).astype(jnp.float32)
        idx = _choose_row(k_sel, probs)
        old = tree.ops[idx]
        op, coeff = _sample_leaf(k_leaf, fset, vmask, coefficient_sd, exclude_var=old)
        return tree._replace(
            ops=tree.ops.at[idx].set(op),
            const=tree.const.at[idx].set(jnp.where(op == CONST, coeff, 0.0)),
        )

    # -- 2: mutate_operator --------------------------------------------------
    def mutate_operator(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_sel, k_op, k_sub = jr.split(key, 3)
        op_rows = _operator_rows(tree.ops, var_start)
        has_op = jnp.any(op_rows)
        probs = jnp.where(has_op, op_rows.astype(jnp.float32), jnp.ones(n))
        empty = n - tree_sizes(tree)

        idxs = jax.vmap(lambda k: _choose_row(k, probs))(jr.split(k_sel, MUT_RETRIES))
        new_ops = jax.vmap(
            lambda k: jr.choice(k, fset.operator_indices, p=fset.operator_probs)
        )(jr.split(k_op, MUT_RETRIES)).astype(jnp.int32)

        def check(idx, new_op):
            span = subtree_span_at(tree.ops, slots, idx)
            # reference hardcodes max replacement sizes 7 (binary) / 8 (unary)
            # -- mutation.py:99 (unary keeps op + depth-2 subtree rows: 8)
            need = jnp.where(slots[new_op] == 2, 7, 8)
            return (tree.ops[idx] != new_op) & (empty + span >= need)

        valid = jax.vmap(check)(idxs, new_ops) & has_op
        pick = jnp.argmax(valid)
        ok = jnp.any(valid)
        idx, new_op = idxs[pick], new_ops[pick]
        span = subtree_span_at(tree.ops, slots, idx)
        old_arity = slots[tree.ops[idx]]
        new_arity = slots[new_op]

        # same arity: in-place opcode swap
        same = tree._replace(ops=tree.ops.at[idx].set(new_op))
        # 2 -> 1: one fresh depth-2 subtree under the new unary op
        sub = sample_tree(k_sub, jnp.int32(2), vmask)
        sub_b, sub_s = _block_of(sub)
        blk1, bs1 = compose1(new_op, sub_b, sub_s)
        to_unary = splice(tree, idx, span, blk1, bs1)
        # 1 -> 2: two fresh depth-1 leaves under the new binary op
        ka, kb = jr.split(k_sub)
        la = sample_tree(ka, jnp.int32(1), vmask)
        lb = sample_tree(kb, jnp.int32(1), vmask)
        la_b, la_s = _block_of(la)
        lb_b, lb_s = _block_of(lb)
        blk2, bs2 = compose2(new_op, la_b, la_s, lb_b, lb_s)
        to_binary = splice(tree, idx, span, blk2, bs2)

        out = _where_tree(
            old_arity == new_arity,
            same,
            _where_tree(new_arity == 1, to_unary, to_binary),
        )
        return _where_tree(ok, out, tree)

    # -- 3: delete_operator --------------------------------------------------
    def delete_operator(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_sel, k_leaf = jr.split(key)
        op_rows = _operator_rows(tree.ops, var_start).at[n - 1].set(False)
        has = jnp.any(op_rows)
        probs = jnp.where(has, op_rows.astype(jnp.float32), jnp.ones(n))
        idx = _choose_row(k_sel, probs)
        span = subtree_span_at(tree.ops, slots, idx)
        op, coeff = _sample_leaf(k_leaf, fset, vmask, coefficient_sd)
        out = splice(tree, idx, span, leaf_block(n, op, coeff), jnp.int32(1))
        return _where_tree(has, out, tree)

    # -- 4: prepend_operator -------------------------------------------------
    def prepend_operator(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_op, k_sub, k_side = jr.split(key, 3)
        new_op = jr.choice(k_op, fset.operator_indices, p=fset.operator_probs).astype(jnp.int32)
        arity = slots[new_op]
        size = tree_sizes(tree)
        tree_b, _ = _block_of(tree)
        sub = sample_tree(k_sub, jnp.int32(2), vmask)
        sub_b, sub_s = _block_of(sub)
        second_branch = jr.bernoulli(k_side)

        blk_u, bs_u = compose1(new_op, tree_b, size)
        first_b = _where_tree(second_branch, sub_b, tree_b)
        first_s = jnp.where(second_branch, sub_s, size)
        second_b = _where_tree(second_branch, tree_b, sub_b)
        second_s = jnp.where(second_branch, size, sub_s)
        blk_b, bs_b = compose2(new_op, first_b, first_s, second_b, second_s)

        blk = _where_tree(arity == 1, blk_u, blk_b)
        bs = jnp.where(arity == 1, bs_u, bs_b)
        fits = bs <= n
        out = splice(tree, jnp.int32(n - 1), size, blk, bs)
        return _where_tree(fits, out, tree)

    # -- 5: insert_operator --------------------------------------------------
    def insert_operator(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_sel, k_op, k_sub, k_side = jr.split(key, 4)
        op_rows = _operator_rows(tree.ops, var_start).at[n - 1].set(False)
        has = jnp.any(op_rows)
        probs = jnp.where(has, op_rows.astype(jnp.float32), jnp.ones(n))
        idx = _choose_row(k_sel, probs)
        span = subtree_span_at(tree.ops, slots, idx)
        new_op = jr.choice(k_op, fset.operator_indices, p=fset.operator_probs).astype(jnp.int32)
        arity = slots[new_op]
        old_b = extract_subtree(tree, idx, span)
        sub = sample_tree(k_sub, jnp.int32(2), vmask)
        sub_b, sub_s = _block_of(sub)
        second_branch = jr.bernoulli(k_side)

        blk_u, bs_u = compose1(new_op, old_b, span)
        first_b = _where_tree(second_branch, sub_b, old_b)
        first_s = jnp.where(second_branch, sub_s, span)
        second_b = _where_tree(second_branch, old_b, sub_b)
        second_s = jnp.where(second_branch, span, sub_s)
        blk_b, bs_b = compose2(new_op, first_b, first_s, second_b, second_s)

        blk = _where_tree(arity == 1, blk_u, blk_b)
        bs = jnp.where(arity == 1, bs_u, bs_b)
        fits = (n - tree_sizes(tree)) >= bs - span
        out = splice(tree, idx, span, blk, bs)
        return _where_tree(has & fits, out, tree)

    # -- 6: replace_tree -----------------------------------------------------
    def replace_tree(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        return sample_tree(key, jnp.int32(max_init_depth), vmask)

    mutators = [
        add_subtree,
        mutate_leaf,
        mutate_operator,
        delete_operator,
        prepend_operator,
        insert_operator,
        replace_tree,
    ]

    def get_mutation_probs(tree: TreeTensors) -> Array:
        """Applicability mask (reference get_mutations, mutation.py:523-539)."""
        size = tree_sizes(tree)
        empty = n - size
        probs = _PROBS_DEFAULT
        probs = jnp.where(empty < 8, _PROBS_FULL, probs)
        probs = jnp.where(size <= 3, _PROBS_SMALL, probs)
        probs = jnp.where(size == 1, _PROBS_LEAF, probs)
        return probs

    def mutate_tree(tree: TreeTensors, key: Array, vmask: Array) -> TreeTensors:
        k_which, k_mut = jr.split(key)
        which = jr.choice(k_which, jnp.arange(7), p=get_mutation_probs(tree))
        return jax.lax.switch(which, mutators, tree, k_mut, vmask)

    def mutate_candidate(
        trees: TreeTensors, key: Array, reproduction_probability: Array, variable_mask: Array
    ) -> TreeTensors:
        """Mutate a candidate's trees under a forced Bernoulli mask
        (reference mutate_trees, mutation.py:555-577)."""
        m = trees.batch_shape[0]
        k_mask, k_mut = jr.split(key)
        mask = forced_bernoulli_mask(k_mask, reproduction_probability, m)
        mutated = jax.vmap(mutate_tree)(trees, jr.split(k_mut, m), variable_mask)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(mask[:, None], a, b), mutated, trees
        )

    return mutate_candidate, mutate_tree, mutators
