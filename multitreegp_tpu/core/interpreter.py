"""Batched tree interpreter (pure-XLA path).

The reference evaluates one tree at a time with a ``fori_loop`` whose body does
a scalar ``lax.switch`` over per-opcode lambdas (``genetic_programming.py:
356-401``), vmapped over trees. That serialises opcode dispatch and keeps the
VPU idle. Here the whole lane space — ``(islands × pop × trees × batch)`` —
advances together: one ``fori_loop`` over the ``max_nodes`` row axis where each
step

1. gathers both child values for *all* lanes (``take_along_axis``),
2. evaluates *every* operator on the full lane vectors and selects by opcode
   mask (a ``jnp.where`` ladder — branch-free, fully vectorised on the VPU),
3. writes the row's value for all lanes (``dynamic_update_slice``).

Because children always sit below parents (root-last invariant), a single
bottom-up sweep is a correct evaluation order. Empty rows evaluate to 0 and
are never referenced by live rows.

The ladder uses a double-``where`` so that reverse-mode AD through the
interpreter (constant optimisation) never sees NaN/Inf cotangents from
not-taken branches (e.g. ``/`` by zero).

A Pallas TPU kernel with identical semantics lives in
:mod:`pallas_interpreter`; this module is the portable reference path and the
fallback for CPU testing.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from .registry import FunctionSet
from .trees import CONST, OP_START, TreeTensors


def _dispatch(fset: FunctionSet, ops_row: Array, x: Array, y: Array, leaf: Array, const_row: Array) -> Array:
    """Branch-free opcode dispatch over full lane vectors.

    ops_row/x/y/leaf/const_row: (...,) lanes. Returns the row value per lane.
    """
    val = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    for k, fn in enumerate(fset.operator_fns):
        sel = ops_row == (OP_START + k)
        # Double-where: feed safe inputs to not-selected lanes so that
        # d/dx of e.g. x/y at y=0 cannot poison gradients of other lanes.
        xs = jnp.where(sel, x, one)
        ys = jnp.where(sel, y, one)
        val = jnp.where(sel, fn(xs, ys), val)
    val = jnp.where(ops_row == CONST, const_row, val)
    val = jnp.where(ops_row >= fset.var_start, leaf, val)
    return val


def evaluate_trees(trees: TreeTensors, data: Array, fset: FunctionSet) -> Array:
    """Evaluate a batch of trees on a batch of data vectors.

    Args:
        trees: tree tensors with batch shape ``B = (...,)`` — i.e. fields of
            shape ``(*B, N)``.
        data: flat variable vectors, shape ``(*B, V)`` (``V == fset.num_variables``),
            broadcastable against ``B`` (e.g. ``(V,)`` replicated over all trees).
        fset: the opcode registry.

    Returns:
        Root values, shape ``B``.

    Matches the semantics of the reference's ``vmap_foriloop``
    (``genetic_programming.py:390-401``) but runs all lanes per row step.
    """
    n = trees.max_nodes
    batch = jnp.broadcast_shapes(trees.batch_shape, data.shape[:-1])
    ops = jnp.broadcast_to(trees.ops, batch + (n,))
    c1 = jnp.broadcast_to(trees.c1, batch + (n,))
    c2 = jnp.broadcast_to(trees.c2, batch + (n,))
    const = jnp.broadcast_to(trees.const, batch + (n,))
    data = jnp.broadcast_to(data, batch + data.shape[-1:])
    v = data.shape[-1]

    def body(i, vals):
        ops_row = jax.lax.dynamic_index_in_dim(ops, i, axis=-1, keepdims=False)
        c1_row = jax.lax.dynamic_index_in_dim(c1, i, axis=-1, keepdims=False)
        c2_row = jax.lax.dynamic_index_in_dim(c2, i, axis=-1, keepdims=False)
        const_row = jax.lax.dynamic_index_in_dim(const, i, axis=-1, keepdims=False)
        x = jnp.take_along_axis(vals, jnp.maximum(c1_row, 0)[..., None], axis=-1)[..., 0]
        y = jnp.take_along_axis(vals, jnp.maximum(c2_row, 0)[..., None], axis=-1)[..., 0]
        var_idx = jnp.clip(ops_row - fset.var_start, 0, v - 1)
        leaf = jnp.take_along_axis(data, var_idx[..., None], axis=-1)[..., 0]
        val = _dispatch(fset, ops_row, x, y, leaf, const_row)
        return jax.lax.dynamic_update_index_in_dim(vals, val, i, axis=-1)

    vals = jax.lax.fori_loop(0, n, body, jnp.zeros(batch + (n,), jnp.float32))
    return vals[..., -1]


def make_candidate_evaluator(fset: FunctionSet) -> Callable[[TreeTensors, Array], Array]:
    """Reference-API adapter: ``(candidate, data) -> per-tree root values``.

    ``candidate`` has batch shape ``(num_trees,)`` and ``data`` is one flat
    ``(V,)`` vector shared by all trees — the exact contract of the
    reference's ``tree_evaluator`` handed to evaluators
    (``genetic_programming.py:249``).
    """

    def evaluate(candidate: TreeTensors, data: Array) -> Array:
        return evaluate_trees(candidate, data[None, :], fset)

    return evaluate
