"""Subtree surgery primitives: extract / splice / compose.

The reference implements crossover and six structural mutations as ~800 lines
of per-operator ``jnp.roll`` + masked-``where`` arithmetic with ad-hoc child
pointer fixups (``crossover.py:120-192``, ``mutation.py:127-486``). Because
the layout guarantees *subtree = contiguous row range* (root-last,
padding-first), every one of those operators is an instance of a single
primitive:

    splice(tree, node_idx, old_size, block, block_size)
        "replace the subtree occupying rows (node_idx-old_size, node_idx]
         with a block of block_size rows"

plus ``extract_subtree`` (pull a subtree out into a root-last block) and
``compose1``/``compose2`` (build a block from an operator plus child blocks).
All are pure gathers with closed-form index maps — no rolls, no sequential
loops, no data-dependent shapes — so they vectorise cleanly over the whole
population on TPU.

Index algebra (N = max_nodes, root at N-1, padding at front):

* A *block* is a root-last tree fragment stored in its own N-row buffer:
  rows (N-1-size, N-1], root at N-1, absolute child pointers.
* ``splice``: let ``end = node_idx - old_size`` and
  ``delta = block_size - old_size``. Output row j sources from
    - ``j > node_idx``: tree row j (unchanged region above),
    - ``node_idx-block_size < j <= node_idx``: block row ``j + (N-1-node_idx)``,
    - ``j <= node_idx-block_size``: tree row ``j + delta`` (rows below shift
      by ``-delta`` so old row ``end`` lands at ``node_idx - block_size``;
      rows shifted past the bottom become padding).
  Pointer rule: any tree-sourced pointer ``p <= end`` moves to ``p - delta``
  (rows above the spliced range can only point at ``node_idx`` itself or
  above, both unchanged); block pointers shift by ``node_idx - (N-1)``.

Callers are responsible for validity (enough padding: ``delta <= empty``);
all operators mask-select the parent tree when a proposed splice would
overflow, replacing the reference's unbounded ``while_loop`` resampling.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..core.trees import CONST, EMPTY, TreeTensors


def _gather_rows(tree: TreeTensors, src: Array, valid: Array) -> TreeTensors:
    """Gather rows ``src`` (clipped) and blank out invalid rows to padding."""
    n = tree.max_nodes
    s = jnp.clip(src, 0, n - 1)
    return TreeTensors(
        ops=jnp.where(valid, tree.ops[s], EMPTY),
        c1=jnp.where(valid, tree.c1[s], -1),
        c2=jnp.where(valid, tree.c2[s], -1),
        const=jnp.where(valid, tree.const[s], 0.0),
    )


def _shift_pointers(tree: TreeTensors, amount: Array, upto: Array | None = None) -> TreeTensors:
    """Add ``amount`` to every valid child pointer (optionally only p <= upto)."""

    def fix(p):
        cond = p >= 0 if upto is None else (p >= 0) & (p <= upto)
        return jnp.where(cond, p + amount, p)

    return tree._replace(c1=fix(tree.c1), c2=fix(tree.c2))


def extract_subtree(tree: TreeTensors, node_idx: Array, size: Array) -> TreeTensors:
    """Pull the subtree rooted at ``node_idx`` (``size`` rows) into a block.

    The result is a valid standalone tree: root at N-1, padding in front.
    """
    n = tree.max_nodes
    idx = jnp.arange(n, dtype=jnp.int32)
    shift = node_idx - (n - 1)  # <= 0
    src = idx + shift
    valid = idx > (n - 1 - size)
    out = _gather_rows(tree, src, valid)
    return _shift_pointers(out, -shift)


def splice(
    tree: TreeTensors,
    node_idx: Array,
    old_size: Array,
    block: TreeTensors,
    block_size: Array,
) -> TreeTensors:
    """Replace the subtree at ``node_idx`` (``old_size`` rows) with ``block``."""
    n = tree.max_nodes
    idx = jnp.arange(n, dtype=jnp.int32)
    end = node_idx - old_size
    delta = block_size - old_size

    in_above = idx > node_idx
    in_block = (idx > node_idx - block_size) & ~in_above

    # tree-sourced rows (above unchanged, below shifted by -delta)
    src_tree = jnp.where(in_above, idx, idx + delta)
    valid_tree = in_above | ((idx + delta >= 0) & (idx + delta <= end))
    t = _gather_rows(tree, src_tree, valid_tree & ~in_block)
    t = _shift_pointers(t, -delta, upto=end)

    # block-sourced rows
    shift = (n - 1) - node_idx  # >= 0
    b = _gather_rows(block, idx + shift, in_block)
    b = _shift_pointers(b, -shift)

    return TreeTensors(
        ops=jnp.where(in_block, b.ops, t.ops),
        c1=jnp.where(in_block, b.c1, t.c1),
        c2=jnp.where(in_block, b.c2, t.c2),
        const=jnp.where(in_block, b.const, t.const),
    )


def leaf_block(max_nodes: int, op: Array, const: Array) -> TreeTensors:
    """A single-leaf block (size 1)."""
    ops = jnp.zeros(max_nodes, jnp.int32).at[-1].set(op)
    c = jnp.full(max_nodes, -1, jnp.int32)
    consts = jnp.zeros(max_nodes, jnp.float32).at[-1].set(jnp.where(op == CONST, const, 0.0))
    return TreeTensors(ops, c, c, consts)


def compose1(op: Array, child: TreeTensors, child_size: Array) -> tuple[TreeTensors, Array]:
    """Block for unary ``op(child)``; returns (block, size)."""
    n = child.max_nodes
    idx = jnp.arange(n, dtype=jnp.int32)
    # child rows shift down by 1
    moved = _gather_rows(child, idx + 1, (idx > n - 2 - child_size) & (idx <= n - 2))
    moved = _shift_pointers(moved, -1)
    root = idx == n - 1
    return (
        TreeTensors(
            ops=jnp.where(root, op, moved.ops),
            c1=jnp.where(root, n - 2, moved.c1),
            c2=jnp.where(root, -1, moved.c2),
            const=jnp.where(root, 0.0, moved.const),
        ),
        child_size + 1,
    )


def compose2(
    op: Array,
    first: TreeTensors,
    first_size: Array,
    second: TreeTensors,
    second_size: Array,
) -> tuple[TreeTensors, Array]:
    """Block for binary ``op(first, second)``; returns (block, size).

    ``first`` becomes child1 (directly below the root) and ``second`` child2
    below it — the reference's layout (``mutation.py:286-288``).
    """
    n = first.max_nodes
    idx = jnp.arange(n, dtype=jnp.int32)
    a = _gather_rows(first, idx + 1, (idx > n - 2 - first_size) & (idx <= n - 2))
    a = _shift_pointers(a, -1)
    off = 1 + first_size
    b = _gather_rows(second, idx + off, (idx > n - 1 - off - second_size) & (idx <= n - 1 - off))
    b = _shift_pointers(b, -off)
    in_b = (idx > n - 1 - off - second_size) & (idx <= n - 1 - off)
    root = idx == n - 1
    merged = TreeTensors(
        ops=jnp.where(root, op, jnp.where(in_b, b.ops, a.ops)),
        c1=jnp.where(root, n - 2, jnp.where(in_b, b.c1, a.c1)),
        c2=jnp.where(root, n - 2 - first_size, jnp.where(in_b, b.c2, a.c2)),
        const=jnp.where(root, 0.0, jnp.where(in_b, b.const, a.const)),
    )
    return merged, first_size + second_size + 1
