"""Opcode registry: operators, variables and per-tree variable masks.

Mirrors the registry the reference builds inline in its constructor
(``MultiTreeGP/genetic_programming.py:132-201``): ``operator_list`` entries are
``(name, callable, arity[, sampling_probability])`` tuples; ``variable_list``
holds one list of variable names per *layer* of trees, giving each tree its own
admissible leaf set (the "multi-tree individuals with distinct input sets"
capability); opcodes are assigned 0=EMPTY, 1=CONST, then operators, then
variables in first-appearance order.

Unlike the reference we do not build per-opcode lambdas for a ``lax.switch``
dispatch; the interpreter evaluates all operators on full lane vectors and
selects by opcode mask (see :mod:`interpreter`), so this registry only stores
names, callables, arities and sampling probabilities.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Sequence, Tuple

import jax.numpy as jnp
from jax import Array

from .trees import CONST, EMPTY, OP_START


def _normalize(fn: Callable, arity: int) -> Callable:
    """Normalise operator callables to a uniform (x, y) -> value signature."""
    if arity == 1:
        return lambda x, y: fn(x)
    return lambda x, y: fn(x, y)


@dataclass(frozen=True)
class FunctionSet:
    """Immutable opcode registry shared by all tree machinery.

    Attributes:
        operator_names: operator display strings, opcode ``OP_START + k``.
        operator_fns: arity-normalised callables ``(x, y) -> value``.
        arities: int32 ``(K,)`` operator arities (1 or 2).
        operator_probs: float32 ``(K,)`` unnormalised sampling probabilities.
        variable_names: flat variable names, opcode ``var_start + v``.
        var_start: opcode of the first variable.
        slots: int32 ``(num_opcodes,)`` arity by opcode (0 for EMPTY/CONST/vars).
        variable_mask: float32 ``(num_trees, num_variables)`` one-hot-ish mask of
            which variables each tree may sample (reference ``variable_array``,
            ``genetic_programming.py:183-193``).
        layer_sizes: trees per layer.
    """

    operator_names: Tuple[str, ...]
    operator_fns: Tuple[Callable, ...]
    arities: Array
    operator_probs: Array
    variable_names: Tuple[str, ...]
    variable_mask: Array
    layer_sizes: Tuple[int, ...]
    string_to_op: Dict[str, int] = field(repr=False)
    op_to_string: Dict[int, str] = field(repr=False)

    @property
    def num_operators(self) -> int:
        return len(self.operator_names)

    @property
    def num_variables(self) -> int:
        return len(self.variable_names)

    @property
    def var_start(self) -> int:
        return OP_START + self.num_operators

    @property
    def num_opcodes(self) -> int:
        return self.var_start + self.num_variables

    @property
    def num_trees(self) -> int:
        return int(sum(self.layer_sizes))

    @property
    def operator_indices(self) -> Array:
        return jnp.arange(OP_START, self.var_start, dtype=jnp.int32)

    @property
    def variable_indices(self) -> Array:
        return jnp.arange(self.var_start, self.num_opcodes, dtype=jnp.int32)

    @property
    def slots(self) -> Array:
        """Arity per opcode: 0 for EMPTY/CONST/variables."""
        return jnp.concatenate(
            [
                jnp.zeros(2, jnp.int32),  # EMPTY, CONST
                self.arities.astype(jnp.int32),
                jnp.zeros(self.num_variables, jnp.int32),
            ]
        )

    @property
    def data_layout(self) -> Tuple[str, ...]:
        """Order in which the flat interpreter data vector must be packed."""
        return self.variable_names


def build_function_set(
    operator_list: Sequence[Tuple],
    variable_list: Sequence[Sequence[str]],
    layer_sizes: Sequence[int],
) -> FunctionSet:
    """Build a :class:`FunctionSet` from reference-style operator/variable lists.

    Accepts exactly the reference's constructor inputs
    (``genetic_programming.py:143-193``): duplicate operator names are merged
    (first occurrence wins), missing probabilities default to 1.0, variables
    are assigned data slots in first-appearance order across layers, and each
    layer's trees share one variable mask.
    """
    layer_sizes = tuple(int(s) for s in layer_sizes)
    if len(layer_sizes) != len(variable_list):
        raise ValueError(
            "variable_list must have one entry per layer "
            f"(got {len(variable_list)} for {len(layer_sizes)} layers)"
        )
    if not operator_list:
        raise ValueError("operator_list must not be empty")

    names: List[str] = []
    fns: List[Callable] = []
    arities: List[int] = []
    probs: List[float] = []
    string_to_op: Dict[str, int] = {}

    for entry in operator_list:
        name, fn, arity = entry[0], entry[1], int(entry[2])
        prob = float(entry[3]) if len(entry) > 3 else 1.0
        if arity not in (1, 2):
            raise ValueError(f"operator {name!r}: arity must be 1 or 2, got {arity}")
        if name in string_to_op:
            continue
        string_to_op[name] = OP_START + len(names)
        names.append(name)
        fns.append(_normalize(fn, arity))
        arities.append(arity)
        probs.append(prob)

    var_start = OP_START + len(names)
    variable_names: List[str] = []
    for layer_vars in variable_list:
        if not layer_vars:
            raise ValueError("every layer needs a non-empty variable list")
        for var in layer_vars:
            if var not in string_to_op:
                string_to_op[var] = var_start + len(variable_names)
                variable_names.append(var)

    num_trees = sum(layer_sizes)
    mask = jnp.zeros((num_trees, len(variable_names)), jnp.float32)
    row = 0
    for layer_i, layer_vars in enumerate(variable_list):
        p = jnp.zeros(len(variable_names), jnp.float32)
        for var in layer_vars:
            p = p.at[string_to_op[var] - var_start].set(1.0)
        for _ in range(layer_sizes[layer_i]):
            mask = mask.at[row].set(p)
            row += 1

    op_to_string = {v: k for k, v in string_to_op.items()}
    op_to_string[EMPTY] = "<empty>"
    op_to_string[CONST] = "<const>"

    return FunctionSet(
        operator_names=tuple(names),
        operator_fns=tuple(fns),
        arities=jnp.asarray(arities, jnp.int32),
        operator_probs=jnp.asarray(probs, jnp.float32),
        variable_names=tuple(variable_names),
        variable_mask=mask,
        layer_sizes=layer_sizes,
        string_to_op=string_to_op,
        op_to_string=op_to_string,
    )


# A default arithmetic set matching the reference's SymbolicRegression example
# (examples/SymbolicRegression.ipynb cell 6).
def default_sr_operators():
    return [
        ("+", jnp.add, 2, 0.5),
        ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5),
        ("/", jnp.divide, 2, 0.1),
    ]
