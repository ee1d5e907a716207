"""Pallas TPU kernel: fused whole-population reproduction.

One launch produces every child of a generation. Lanes are flattened
``(pairs x trees)``; each grid step loads a 128-lane tile of both parents into
VMEM and runs the complete reproduction algorithm of
:mod:`core.tile_surgery` — crossover with bounded rejection, the seven-case
unified mutation, fresh grow-sampling — entirely on VPU registers, with
randomness from the on-core PRNG.

Why a kernel: the XLA reproduce path (``ops.reproduction.make_evolve_island``)
is a vmapped ``lax.switch`` that computes ALL three reproduction branches and
ALL seven mutation operators for every pair, as hundreds of small gathers —
measured 540 ms/generation at pop 4096 on v5e, 16x the cost of evaluating the
same population. Here each surgery is a dense select ladder on (N, 128) tiles
and the whole generation's reproduction is one kernel.

RNG: ``pltpu.prng_random_bits`` seeded per grid step from a host-supplied
seed — a different stream than the XLA path's threefry, which is fine:
reproduction semantics are distributional (the reference's own stream differs
too, SURVEY.md §7 "hard parts" 3). Law-level equivalence of every draw is
exercised by ``tests/test_tile_surgery.py`` on CPU; tree invariants of kernel
outputs by ``tests/test_pallas_tpu.py`` on hardware.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from . import tile_surgery as ts
from .registry import FunctionSet
from .trees import TreeTensors, rebuild_pointers

try:  # pragma: no cover - import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

LANE = 128

# Structural moves are log2(N)-stage shifts (tile_surgery.shift_rows), so the
# kernel graph is nearly flat in max_nodes (24.0k HLO lines at N=128 vs 22.9k
# at N=32; the old per-row select ladder hit 52.8k at N=128). 256 matches the
# fused rollout's windowed-gather coverage (pallas_rollout.DEEP_MAX_NODES).
MAX_KERNEL_NODES = 256


def _make_kernel(cfg: ts.SurgeryConfig, n: int, v: int):
    def kernel(seed_ref, p1o_ref, p1c_ref, p2o_ref, p2c_ref, ctrl_ref, vmask_ref,
               c1o_ref, c1c_ref, c2o_ref, c2c_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

        def urand(rows: int) -> Array:
            bits = pltpu.prng_random_bits((rows, LANE))
            # top 24 bits as a positive int32 (mosaic has no uint32->f32 cast)
            top = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
            return top.astype(jnp.float32) * (1.0 / (1 << 24))

        cx = ctrl_ref[0:1, :] != 0
        act1 = ctrl_ref[1:2, :]
        act2 = ctrl_ref[2:3, :]
        c1o, c1c, c2o, c2c = ts.reproduce_tiles(
            p1o_ref[...], p1c_ref[...], p2o_ref[...], p2c_ref[...],
            cx, act1, act2, vmask_ref[...][:v], urand, cfg,
        )
        c1o_ref[...] = c1o
        c1c_ref[...] = c1c
        c2o_ref[...] = c2o
        c2c_ref[...] = c2c

    return kernel


def reproduce_pairs_pallas(
    left: TreeTensors,
    right: TreeTensors,
    cxflag: Array,  # (P, T) bool
    act1: Array,  # (P, T) int32 — 0 pass / 1 mutate / 2 fresh
    act2: Array,  # (P, T) int32
    seed: Array,  # () int32
    fset: FunctionSet,
    cfg: ts.SurgeryConfig,
) -> Tuple[TreeTensors, TreeTensors]:
    """Produce (child1, child2) for every parent pair in one kernel launch.

    ``left``/``right`` have batch shape (P, T); outputs match, with child
    pointers rebuilt from opcodes (``trees.rebuild_pointers``).
    """
    p, t = left.batch_shape
    n = left.max_nodes
    v = fset.num_variables
    lanes = p * t
    pad = (-lanes) % LANE
    total = lanes + pad
    grid = total // LANE

    def to_tile(x, fill=0):
        flat = x.reshape(lanes, n).T  # (N, lanes)
        return jnp.pad(flat, ((0, 0), (0, pad)), constant_values=fill)

    # per-lane variable weights: tree slot t -> variable_mask[t]
    vrows = max(v, 8)  # sublane-pad the mask tile
    vm = jnp.broadcast_to(fset.variable_mask.T[:, None, :], (v, p, t)).reshape(v, lanes)
    vm = jnp.pad(vm, ((0, vrows - v), (0, pad)))

    ctrl = jnp.stack(
        [
            cxflag.reshape(lanes).astype(jnp.int32),
            act1.reshape(lanes).astype(jnp.int32),
            act2.reshape(lanes).astype(jnp.int32),
        ]
    )
    ctrl = jnp.pad(ctrl, ((0, 5), (0, pad)))  # (8, total)

    spec = lambda rows: pl.BlockSpec((rows, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    kernel = _make_kernel(cfg, n, v)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec(n), spec(n), spec(n), spec(n), spec(8), spec(vrows),
        ],
        out_specs=(spec(n),) * 4,
        out_shape=(
            jax.ShapeDtypeStruct((n, total), jnp.int32),
            jax.ShapeDtypeStruct((n, total), jnp.float32),
            jax.ShapeDtypeStruct((n, total), jnp.int32),
            jax.ShapeDtypeStruct((n, total), jnp.float32),
        ),
    )(
        seed.reshape(1).astype(jnp.int32),
        to_tile(left.ops), to_tile(left.const),
        to_tile(right.ops), to_tile(right.const),
        ctrl, vm,
    )

    def from_tile(ops_t, const_t):
        ops = ops_t[:, :lanes].T.reshape(p, t, n)
        const = const_t[:, :lanes].T.reshape(p, t, n)
        c1, c2 = rebuild_pointers(ops, jnp.asarray(cfg.slots))
        return TreeTensors(ops, c1, c2, const)

    return from_tile(outs[0], outs[1]), from_tile(outs[2], outs[3])


def reproduction_kernel_available(max_nodes: int) -> bool:
    from .pallas_interpreter import tpu_kernels_available

    return tpu_kernels_available() and max_nodes <= MAX_KERNEL_NODES
