"""Tree tensor representation.

A *tree* is a fixed-width tensor of ``max_nodes`` rows. Unlike the reference
(``MultiTreeGP/genetic_programming.py:101``), which stores a tree as a single
``(max_nodes, 4)`` float32 array (opcode, child1, child2, coefficient), we use a
struct-of-arrays layout with integer opcodes and child pointers:

* ``ops``   int32  ``(..., N)`` — opcode per row (see :mod:`registry` for the scheme)
* ``c1``    int32  ``(..., N)`` — row index of the first child, ``-1`` if none
* ``c2``    int32  ``(..., N)`` — row index of the second child, ``-1`` if none
* ``const`` float32 ``(..., N)`` — constant value for ``CONST`` rows, else 0

SoA keeps integer comparisons in integer lanes on the VPU and lets gradient-based
constant optimisation differentiate ``const`` alone (the reference splits a packed
float tensor at column 3 instead, ``genetic_programming.py:447``).

Layout invariants (identical to the reference, ``initialization.py:82-98``):

1. **Root-last**: the root is row ``N-1``; children always have lower row
   indices than their parents, so a bottom-up sweep over rows is a valid
   evaluation order.
2. **Padding-first**: empty rows (``op == EMPTY``, encoded ``(0, -1, -1, 0.0)``)
   are packed at the *front* (low indices).
3. **Contiguous subtrees**: the subtree rooted at row ``i`` occupies a
   contiguous row range ``(end, i]``. All genetic surgery relies on this.

Leading batch dims stack trees into candidates ``(num_trees, N)``, populations
``(pop, num_trees, N)`` and islands ``(islands, pop, num_trees, N)``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from jax import Array

# Opcode scheme (mirrors the reference's, genetic_programming.py:132-201):
#   0            = EMPTY (padding row)
#   1            = CONST (value in `const`)
#   2 .. 2+K-1   = operators, in operator_list order
#   2+K ..       = variables, in first-appearance order across variable_list
EMPTY = 0
CONST = 1
OP_START = 2


class TreeTensors(NamedTuple):
    """A pytree of stacked trees; all fields share leading dims + (N,)."""

    ops: Array  # int32
    c1: Array  # int32
    c2: Array  # int32
    const: Array  # float32

    @property
    def max_nodes(self) -> int:
        return self.ops.shape[-1]

    @property
    def batch_shape(self):
        return self.ops.shape[:-1]

    def __getitem__(self, idx) -> "TreeTensors":
        return TreeTensors(self.ops[idx], self.c1[idx], self.c2[idx], self.const[idx])


def empty_trees(batch_shape, max_nodes: int) -> TreeTensors:
    """All-padding trees: every row is (EMPTY, -1, -1, 0.0)."""
    shape = tuple(batch_shape) + (max_nodes,)
    return TreeTensors(
        ops=jnp.zeros(shape, jnp.int32),
        c1=jnp.full(shape, -1, jnp.int32),
        c2=jnp.full(shape, -1, jnp.int32),
        const=jnp.zeros(shape, jnp.float32),
    )


def tree_sizes(trees: TreeTensors) -> Array:
    """Number of non-empty rows per tree: int32 (...,)."""
    return jnp.sum(trees.ops != EMPTY, axis=-1).astype(jnp.int32)


def pack(trees: TreeTensors) -> Array:
    """Pack into the reference's ``(..., N, 4)`` float layout for interop."""
    return jnp.stack(
        [
            trees.ops.astype(jnp.float32),
            trees.c1.astype(jnp.float32),
            trees.c2.astype(jnp.float32),
            trees.const,
        ],
        axis=-1,
    )


def unpack(arr: Array) -> TreeTensors:
    """Inverse of :func:`pack` (accepts the reference's float tensors)."""
    return TreeTensors(
        ops=arr[..., 0].astype(jnp.int32),
        c1=arr[..., 1].astype(jnp.int32),
        c2=arr[..., 2].astype(jnp.int32),
        const=arr[..., 3].astype(jnp.float32),
    )


def arity_of(ops: Array, slots: Array) -> Array:
    """Per-row arity (0 for EMPTY/CONST/variables) given the registry table."""
    return slots[jnp.clip(ops, 0, slots.shape[0] - 1)]


def subtree_spans(ops: Array, slots: Array) -> Array:
    """Subtree size for every row of every tree, fully vectorised.

    For root-last/children-first trees, walking down from row ``i`` with an
    open-slot counter (the reference's sequential ``find_end_idx``,
    ``crossover.py:23-40``) is equivalent to: let ``w[j] = 1 - arity[j]``
    and ``S[k] = sum_{j=k..i} w[j]``; the subtree bottom is the largest ``k``
    with ``S[k] == 1``. We compute all spans at once with a suffix-sum per
    candidate root: size[i] = i - bottom(i) + 1, and 0 for empty rows.

    ops: int32 (..., N) -> int32 (..., N)
    """
    n = ops.shape[-1]
    w = (1 - arity_of(ops, slots)).astype(jnp.int32)  # (..., N)
    # csum[j] = w[0] + ... + w[j]
    csum = jnp.cumsum(w, axis=-1)
    # S[k, i] = csum[i] - csum[k-1]; S[k,i]==1 <=> rows k..i form a closed forest
    # with exactly one tree => bottom(i) = max k with S[k,i]==1 (k<=i).
    csum_im1 = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
    )  # csum[k-1] with csum[-1]=0
    idx = jnp.arange(n, dtype=jnp.int32)
    # For each root i, find max k <= i with csum[i] - csum[k-1] == 1.
    s = csum[..., None, :] - csum_im1[..., :, None]  # [..., k, i]
    valid = (s == 1) & (idx[:, None] <= idx[None, :])
    k = jnp.max(jnp.where(valid, idx[:, None], -1), axis=-2)  # (..., i)
    size = idx - k + 1
    return jnp.where(ops != EMPTY, size, 0).astype(jnp.int32)


def subtree_span_at(ops: Array, slots: Array, node_idx: Array) -> Array:
    """Subtree size of the single row ``node_idx`` (int32 scalar per tree).

    O(N) per tree instead of the O(N^2) all-rows version.
    """
    n = ops.shape[-1]
    w = (1 - arity_of(ops, slots)).astype(jnp.int32)
    csum = jnp.cumsum(w, axis=-1)
    csum_im1 = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    c_at = jnp.take_along_axis(csum, node_idx[..., None], axis=-1)  # (..., 1)
    s = c_at - csum_im1  # (..., k)
    valid = (s == 1) & (idx <= node_idx[..., None])
    k = jnp.max(jnp.where(valid, idx, -1), axis=-1)
    return (node_idx - k + 1).astype(jnp.int32)


def rebuild_pointers(ops: Array, slots: Array) -> Tuple[Array, Array]:
    """Derive (c1, c2) child pointers from opcodes alone.

    For root-last/children-first trees the pointers are redundant: the first
    child of an operator row ``i`` is always row ``i-1``, and the second child
    sits directly below the first child's subtree, ``c2[i] = i-1 -
    span(i-1)``. The Pallas reproduction kernel (``core.tile_surgery``) only
    carries (ops, const) and calls this once per generation to restore the
    full :class:`TreeTensors` contract.

    ops: int32 (..., N) -> (c1, c2) int32 (..., N).
    """
    n = ops.shape[-1]
    ar = arity_of(ops, slots)
    spans = subtree_spans(ops, slots)
    idx = jnp.arange(n, dtype=jnp.int32)
    span_below = jnp.concatenate(
        [jnp.zeros_like(spans[..., :1]), spans[..., :-1]], axis=-1
    )  # spans[i-1] aligned at row i
    c1 = jnp.where(ar >= 1, idx - 1, -1)
    c2 = jnp.where(ar == 2, idx - 1 - span_below, -1)
    return c1.astype(jnp.int32), c2.astype(jnp.int32)


def validate_host(trees: TreeTensors, slots) -> None:
    """Host-side invariant checker used by tests (not jittable).

    Checks: root-last, padding-first, children-below-parents, child-pointer /
    arity consistency, contiguous subtree property.
    """
    import numpy as np

    ops = np.asarray(trees.ops).reshape(-1, trees.max_nodes)
    c1 = np.asarray(trees.c1).reshape(-1, trees.max_nodes)
    c2 = np.asarray(trees.c2).reshape(-1, trees.max_nodes)
    slots = np.asarray(slots)
    n = trees.max_nodes
    for t in range(ops.shape[0]):
        o, a, b = ops[t], c1[t], c2[t]
        size = int((o != EMPTY).sum())
        assert size >= 1, f"tree {t}: empty tree"
        # padding-first / root-last
        assert (o[: n - size] == EMPTY).all(), f"tree {t}: padding not packed at front"
        assert (o[n - size :] != EMPTY).all(), f"tree {t}: hole inside tree"
        # arity vs child pointers
        for i in range(n - size, n):
            ar = int(slots[o[i]]) if o[i] < len(slots) else 0
            if ar >= 1:
                assert 0 <= a[i] < i, f"tree {t} row {i}: bad c1 {a[i]}"
            else:
                assert a[i] == -1, f"tree {t} row {i}: leaf with c1 {a[i]}"
            if ar == 2:
                assert 0 <= b[i] < i, f"tree {t} row {i}: bad c2 {b[i]}"
                assert b[i] < a[i], f"tree {t} row {i}: c2 {b[i]} !< c1 {a[i]}"
            else:
                assert b[i] == -1, f"tree {t} row {i}: row with c2 {b[i]}"
        # every non-root row is referenced exactly once
        refs = [x for x in list(a) + list(b) if x >= 0]
        assert sorted(refs) == list(range(n - size, n - 1)), (
            f"tree {t}: child refs {sorted(refs)} != rows {list(range(n - size, n - 1))}"
        )
        # contiguity: recursive extent check
        def extent(i):
            lo = i
            if a[i] >= 0:
                lo = min(lo, extent(a[i]))
            if b[i] >= 0:
                lo = min(lo, extent(b[i]))
            return lo

        for i in range(n - size, n):
            lo = extent(i)
            ar = int(slots[o[i]])
            # subtree rows are exactly (lo..i) and children fill them
            n_desc = i - lo + 1
            stack, seen = [i], 0
            todo = [i]
            while todo:
                j = todo.pop()
                seen += 1
                if a[j] >= 0:
                    todo.append(a[j])
                if b[j] >= 0:
                    todo.append(b[j])
            assert seen == n_desc, f"tree {t} row {i}: non-contiguous subtree"
