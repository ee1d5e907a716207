"""Host-side expression rendering (observability surface).

Replicates the reference's ``tree_to_string`` / ``to_string``
(``genetic_programming.py:310-354``): recursive tensor -> infix string with
optional sympy simplification, and layer-bracketed candidate rendering.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.registry import FunctionSet
from ..core.trees import CONST, EMPTY, TreeTensors


def tree_to_string(tree: TreeTensors, fset: FunctionSet, root: Optional[int] = None) -> str:
    """Render a single tree (batch shape ``()``) as an infix expression."""
    ops = np.asarray(tree.ops)
    c1 = np.asarray(tree.c1)
    c2 = np.asarray(tree.c2)
    const = np.asarray(tree.const)

    def rec(i: int) -> str:
        op = int(ops[i])
        if op == CONST:
            return "{:.2f}".format(float(const[i]))
        if op == EMPTY:
            return "0"
        name = fset.op_to_string.get(op, f"<op{op}>")
        if c1[i] < 0:  # variable
            return name
        if c2[i] < 0:  # unary operator
            return f"{name}({rec(int(c1[i]))})"
        return f"({rec(int(c1[i]))}){name}({rec(int(c2[i]))})"

    return rec(int(tree.max_nodes - 1) if root is None else root)


def candidate_to_string(candidate: TreeTensors, fset: FunctionSet, simplify: bool = True) -> str:
    """Render a candidate as layer-bracketed expression lists.

    Matches the reference's ``to_string`` (``genetic_programming.py:330-354``),
    including sympy round-tripping for simplification when available.
    """
    exprs = []
    num_trees = candidate.batch_shape[0]
    for t in range(num_trees):
        s = tree_to_string(candidate[t], fset)
        if simplify:
            try:
                import sympy

                s = str(sympy.parsing.sympy_parser.parse_expr(s))
            except Exception:
                pass
        exprs.append(s)

    out = []
    i = 0
    for size in fset.layer_sizes:
        out.append("[" + ", ".join(exprs[i : i + size]) + "]")
        i += size
    return ", ".join(out)
