"""Subtree crossover as extract + splice with bounded rejection.

Behavioural spec (reference ``MultiTreeGP/genetic_operators/crossover.py``):

* candidate nodes are sampled from non-empty rows with operators weighted 2:1
  over leaves (``crossover.py:110-116``);
* a node pair is rejected when the exchanged subtrees would overflow either
  tree's ``max_nodes`` budget, or when both subtrees are identical
  (same size and per-row equal: equal operator/variable opcodes, or constants
  with equal values; single-node-vs-single-node trees are exempt)
  (``check_invalid_cx_nodes``/``check_equal_subtrees``, ``crossover.py:42-91``);
* per candidate, a Bernoulli mask picks which trees cross over, with at least
  one tree forced (``crossover.py:214``).

TPU-first deltas: the reference resamples inside an *unbounded*
``lax.while_loop`` (``crossover.py:150``); here we pre-sample ``CX_RETRIES``
node pairs, compute all validity bits vectorised, and take the first valid
pair — if none is valid the pair of trees is left unchanged (statically
shaped, no divergence risk). Subtree extents come from the closed-form
suffix-sum span (``core.trees.subtree_span_at``) instead of the sequential
``find_end_idx`` walk, and the exchange itself is the shared splice primitive
instead of bespoke triple-roll masking.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import Array

from ..core.registry import FunctionSet
from ..core.trees import CONST, EMPTY, OP_START, TreeTensors, subtree_span_at, tree_sizes
from .splice import extract_subtree, splice

CX_RETRIES = 8


def _node_probs(ops: Array, var_start: int) -> Array:
    """Sampling weights over rows: operators 2, leaves 1, padding 0."""
    nonempty = ops != EMPTY
    is_op = (ops >= OP_START) & (ops < var_start)
    return (nonempty.astype(jnp.float32) + is_op.astype(jnp.float32))


def _subtrees_equal(t1: TreeTensors, n1: Array, s1: Array, t2: TreeTensors, n2: Array, s2: Array) -> Array:
    """Reference equality semantics (``crossover.py:42-58,84-88``)."""
    n = t1.max_nodes
    o = jnp.arange(n, dtype=jnp.int32)
    r1 = jnp.clip(n1 - o, 0, n - 1)
    r2 = jnp.clip(n2 - o, 0, n - 1)
    ops1, ops2 = t1.ops[r1], t2.ops[r2]
    same_leaf = (ops1 == CONST) & (ops2 == CONST) & (t1.const[r1] == t2.const[r2])
    rows_eq = ((ops1 == ops2) & (ops1 > CONST)) | same_leaf
    all_eq = jnp.all(jnp.where(o < s1, rows_eq, True))
    multi = (tree_sizes(t1) > 1) | (tree_sizes(t2) > 1)
    return (s1 == s2) & multi & all_eq


def crossover_trees(
    tree1: TreeTensors, tree2: TreeTensors, key: Array, fset: FunctionSet
) -> Tuple[TreeTensors, TreeTensors]:
    """Cross a single pair of trees (batch shape ``()``)."""
    n = tree1.max_nodes
    slots = fset.slots
    rows = jnp.arange(n, dtype=jnp.int32)
    p1 = _node_probs(tree1.ops, fset.var_start)
    p2 = _node_probs(tree2.ops, fset.var_start)
    empty1 = n - tree_sizes(tree1)
    empty2 = n - tree_sizes(tree2)

    k1, k2 = jr.split(key)
    n1s = jax.vmap(lambda k: jr.choice(k, rows, p=p1))(jr.split(k1, CX_RETRIES))
    n2s = jax.vmap(lambda k: jr.choice(k, rows, p=p2))(jr.split(k2, CX_RETRIES))

    def check(n1, n2):
        s1 = subtree_span_at(tree1.ops, slots, n1)
        s2 = subtree_span_at(tree2.ops, slots, n2)
        fits = (empty1 >= s2 - s1) & (empty2 >= s1 - s2)
        return fits & ~_subtrees_equal(tree1, n1, s1, tree2, n2, s2)

    valid = jax.vmap(check)(n1s, n2s)
    pick = jnp.argmax(valid)  # first valid attempt
    ok = jnp.any(valid)
    n1 = n1s[pick]
    n2 = n2s[pick]
    s1 = subtree_span_at(tree1.ops, slots, n1)
    s2 = subtree_span_at(tree2.ops, slots, n2)

    b1 = extract_subtree(tree1, n1, s1)
    b2 = extract_subtree(tree2, n2, s2)
    c1 = splice(tree1, n1, s1, b2, s2)
    c2 = splice(tree2, n2, s2, b1, s1)

    keep = lambda new, old: jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, old)
    return keep(c1, tree1), keep(c2, tree2)


def forced_bernoulli_mask(key: Array, p: Array, m: int) -> Array:
    """Bernoulli(p) over m trees with at least one success.

    The reference resamples the whole mask until non-zero
    (``crossover.py:214``, ``mutation.py:571``); we instead force one
    uniformly-chosen tree when the draw is all-zero — bounded and nearly the
    same conditional law.
    """
    mask_key, force_key = jr.split(key)
    mask = jr.bernoulli(mask_key, p=p, shape=(m,))
    force = jax.nn.one_hot(jr.randint(force_key, (), 0, m), m, dtype=jnp.bool_)
    return jnp.where(jnp.any(mask), mask, force)


def crossover_candidates(
    parent1: TreeTensors,
    parent2: TreeTensors,
    key: Array,
    reproduction_probability: Array,
    fset: FunctionSet,
) -> Tuple[TreeTensors, TreeTensors]:
    """Cross a pair of candidates tree-by-tree under a forced Bernoulli mask.

    Mirrors the reference's ``crossover_trees`` (``crossover.py:194-218``).
    Batch shape of each parent is ``(num_trees,)``.
    """
    m = parent1.batch_shape[0]
    mask_key, cx_key = jr.split(key)
    mask = forced_bernoulli_mask(mask_key, reproduction_probability, m)
    c1, c2 = jax.vmap(lambda t1, t2, k: crossover_trees(t1, t2, k, fset))(
        parent1, parent2, jr.split(cx_key, m)
    )
    sel = lambda new, old: jax.tree_util.tree_map(
        lambda a, b: jnp.where(mask[:, None], a, b), new, old
    )
    return sel(c1, parent1), sel(c2, parent2)
