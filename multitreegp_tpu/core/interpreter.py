"""Batched tree interpreter (pure-XLA paths).

The reference evaluates one tree at a time with a ``fori_loop`` whose body does
a scalar ``lax.switch`` over per-opcode lambdas (``genetic_programming.py:
356-401``), vmapped over trees. That serialises opcode dispatch and keeps the
VPU idle. Here the whole lane space — ``(islands x pop x trees x batch)`` —
advances together, one tree row per step, with branch-free ``jnp.where``
dispatch over full lane vectors.

Two implementations with identical semantics:

* **ladder** (default, fast): exploits two layout invariants —
  (1) a parent's first child is ALWAYS the row directly below it
  (``c1[i] == i-1``; depth-first contiguous subtrees make this structural),
  so the first operand needs no gather at all; and
  (2) ``c2[i] < i-1``, so the second operand is resolved by a statically
  unrolled triangular select ladder over earlier row values. The result is a
  pure elementwise-select dataflow — ZERO dynamic gathers, no
  dynamic-update-slice on the minor axis — which XLA fuses into a handful of
  VPU kernels. Cost: ~N^2/2 selects per tree eval, a bargain against the
  gather path's N serialized minor-dim dynamic slices (measured ~100x faster
  at max_nodes=32 on TPU v5e).
  Leaf variables are also resolved ladder-style against statically sliced
  data columns, avoiding the per-lane gather into the data vector.

* **gather** (fallback): one ``fori_loop`` over rows with
  ``take_along_axis`` child gathers — O(N) HLO instead of O(N^2), preferred
  for very wide trees (``max_nodes`` > LADDER_MAX_NODES) where the unrolled
  ladder would blow up trace/compile time.

Both use a double-``where`` so that reverse-mode AD through the interpreter
(constant optimisation) never sees NaN/Inf cotangents from not-taken branches
(e.g. ``/`` by zero).

A Pallas TPU kernel with the same contract lives in :mod:`pallas_interpreter`.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from .registry import FunctionSet
from .trees import CONST, OP_START, TreeTensors

# Above this many nodes the unrolled ladder costs too much trace/compile time;
# fall back to the fori_loop gather path.
LADDER_MAX_NODES = 64


def _dispatch(fset: FunctionSet, ops_row: Array, x: Array, y: Array, leaf: Array, const_row: Array) -> Array:
    """Branch-free opcode dispatch over full lane vectors."""
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


def _broadcast(trees: TreeTensors, data: Array):
    n = trees.max_nodes
    batch = jnp.broadcast_shapes(trees.batch_shape, data.shape[:-1])
    ops = jnp.broadcast_to(trees.ops, batch + (n,))
    c1 = jnp.broadcast_to(trees.c1, batch + (n,))
    c2 = jnp.broadcast_to(trees.c2, batch + (n,))
    const = jnp.broadcast_to(trees.const, batch + (n,))
    data = jnp.broadcast_to(data, batch + data.shape[-1:])
    return batch, ops, c1, c2, const, data


def evaluate_trees_ladder(trees: TreeTensors, data: Array, fset: FunctionSet) -> Array:
    """Select-ladder evaluation (see module docstring). Returns root values.

    Tree fields and data are NOT materialised at the full joint batch shape:
    per-row slices keep their own batch dims and rely on implicit numpy
    broadcasting inside the selects, so e.g. trees batched ``(P, 1, m)``
    against data ``(P, B, 1, V)`` never allocates ``(P, B, m, N)`` tensors —
    values grow to the joint shape only where data actually flows in.
    """
    n = trees.max_nodes
    batch = jnp.broadcast_shapes(trees.batch_shape, data.shape[:-1])
    v = data.shape[-1]
    zero = jnp.float32(0.0)

    data_cols = [data[..., j] for j in range(v)]
    vals: list[Array] = []
    for i in range(n):
        ops_row = trees.ops[..., i]
        x = vals[i - 1] if i > 0 else zero  # c1 == i-1 structurally
        y = zero
        c2_row = trees.c2[..., i]
        for j in range(i - 1):  # c2 < c1 == i-1
            y = jnp.where(c2_row == j, vals[j], y)
        leaf = zero
        for j in range(v):
            leaf = jnp.where(ops_row == fset.var_start + j, data_cols[j], leaf)
        vals.append(_dispatch(fset, ops_row, x, y, leaf, trees.const[..., i]))
    return jnp.broadcast_to(vals[-1], batch)


def evaluate_trees_gather(trees: TreeTensors, data: Array, fset: FunctionSet) -> Array:
    """fori_loop + take_along_axis evaluation (O(N) HLO; for wide trees)."""
    n = trees.max_nodes
    batch, ops, c1, c2, const, data = _broadcast(trees, data)
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


def evaluate_trees(
    trees: TreeTensors, data: Array, fset: FunctionSet, impl: str = "auto"
) -> Array:
    """Evaluate a batch of trees on a batch of data vectors.

    Args:
        trees: tree tensors with batch shape ``B = (...,)``.
        data: flat variable vectors ``(*B, V)``, broadcastable against ``B``.
        fset: the opcode registry.
        impl: "ladder" | "gather" | "auto" (ladder for small max_nodes).

    Returns root values of shape ``B`` — the semantics of the reference's
    ``vmap_foriloop`` (``genetic_programming.py:390-401``), all lanes at once.
    """
    if impl == "auto":
        # TPU: the Pallas kernel wins at every scale measured (3.3x over the
        # ladder inside rollout scans; gather's minor-axis dynamic slices are
        # pathological on TPU — never auto-selected there). CPU (tests, faked
        # multi-device meshes) uses the compact gather path for compile time.
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            from .pallas_interpreter import pallas_available

            if pallas_available():
                impl = "pallas"
            else:  # pragma: no cover
                impl = "ladder" if trees.max_nodes <= LADDER_MAX_NODES else "gather"
        else:
            impl = "gather"
    if impl == "ladder":
        return evaluate_trees_ladder(trees, data, fset)
    if impl == "pallas":
        from .pallas_interpreter import evaluate_trees_pallas

        return evaluate_trees_pallas(trees, data, fset)
    return evaluate_trees_gather(trees, data, fset)


def make_candidate_evaluator(fset: FunctionSet) -> Callable[[TreeTensors, Array], Array]:
    """Reference-API adapter: ``(candidate, data) -> per-tree root values``.

    ``candidate`` has batch shape ``(num_trees,)`` and ``data`` is one flat
    ``(V,)`` vector shared by all trees — the contract of the reference's
    ``tree_evaluator`` handed to evaluators (``genetic_programming.py:249``).
    """

    def evaluate(candidate: TreeTensors, data: Array) -> Array:
        return evaluate_trees(candidate, data[None, :], fset)

    return evaluate
