"""Fused whole-rollout Pallas kernel for symbolic-regression fitness.

The north-star design (SURVEY.md §7, BASELINE.json): the reference pays a
full dispatch round-trip per drift evaluation — per solver step, per RK
stage, per candidate (``diffrax.diffeqsolve`` under nested vmaps,
``SR_evaluator.py:76-79``). The unfused TPU path already batches every lane
into one kernel per drift call, but still streams the tree tensors from HBM
and relaunches ~200 times per evaluation. This kernel goes the rest of the
way: ONE launch per population evaluation —

* grid over ``(P x B)`` lane tiles; each tile DMAs its candidates' opcode /
  child / constant streams into VMEM ONCE and keeps them resident for the
  whole trajectory;
* the time loop (``T`` save steps x ``substeps`` x RK stages) runs inside
  the kernel: every RK stage evaluates all ``m`` trees of the candidate on
  the current state held in registers/VMEM — zero HBM traffic between
  stages, steps, or save points (only the saved states stream out);
* per-lane divergence containment: an ``alive`` tile freezes lanes whose
  state leaves the finite range, exactly like :mod:`models.integrators`.

Restrictions (by design, for the hot path): autonomous drifts only (the
candidate IS the drift — SR semantics; no explicit t dependence), trees per
candidate ``m == state dimension d``, uniform save grid. Everything else
uses the general unfused path.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import Array

from .registry import FunctionSet
from .trees import CONST, EMPTY, OP_START, TreeTensors

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .pallas_interpreter import (
    LANE,
    SUBLANES,
    TILE,
    UNROLL_MAX_NODES,
    tpu_kernels_available,
)

# |x| beyond this is divergence even while finite (matches integrators.py).
DIVERGENCE_BOUND = 1e8

_RK_TABLES = {
    # method -> ([(stage_coeff, accum_weight)...], final_scale); matches the
    # exact accumulation order of integrators._STEPPERS so fp rounding agrees
    "euler": ([(0.0, 1.0)], 1.0),
    "heun": ([(0.0, 1.0), (1.0, 1.0)], 0.5),
    "rk4": ([(0.0, 1.0), (0.5, 2.0), (0.5, 2.0), (1.0, 1.0)], 1 / 6),
}


class _RefRows:
    """Row view ``ref[mi, i, 0]`` with a fixed (possibly traced) tree index —
    lets the tree-eval ladder read rows directly from VMEM inside a fori over
    trees instead of materialising every (tree, row) tile as an SSA value."""

    def __init__(self, ref, mi):
        self.ref, self.mi = ref, mi

    def __getitem__(self, i):
        return self.ref[self.mi, i, 0]


def _make_sr_tree_eval(fset: FunctionSet, n: int, sub: int = SUBLANES):
    var_start = fset.var_start

    def eval_tree(ops_tile, c2_tile, const_tile, x_tiles):
        """Unrolled stack interpreter on one tree's (N,.) streams; x_tiles is
        the list of per-variable (S, 128) register tiles. Row sources are
        indexable (SSA lists or a ``_RefRows`` VMEM view) so the ladder serves
        both the unrolled and the fori-rolled tree loops."""
        zero = jnp.zeros((sub, LANE), jnp.float32)
        one = jnp.ones((sub, LANE), jnp.float32)
        vals = []
        for i in range(n):
            op = ops_tile[i]
            c2 = c2_tile[i]
            x = vals[i - 1] if i else zero
            y = zero
            for j in range(i - 1):
                y = jnp.where(c2 == j, vals[j], y)
            leaf = zero
            for var in range(min(len(x_tiles), fset.num_variables)):
                leaf = jnp.where(op == var_start + var, x_tiles[var], leaf)
            val = zero
            for k, fn in enumerate(fset.operator_fns):
                sel = op == (OP_START + k)
                xs = jnp.where(sel, x, one)
                ys = jnp.where(sel, y, one)
                val = jnp.where(sel, fn(xs, ys), val)
            val = jnp.where(op == CONST, const_tile[i], val)
            val = jnp.where(op >= var_start, leaf, val)
            vals.append(val)
        return vals[-1]

    return eval_tree


def _make_sr_tree_eval_when(fset: FunctionSet, n: int, sub: int = SUBLANES):
    """Padding-prefix-skipping variant of :func:`_make_sr_tree_eval`.

    The rolled-row A/B at shallow N lost to the unrolled ladder because the
    skip's savings were eaten by dynamic row indexing (r2 hardware: 4.05e10
    vs 6.46e10 at N=32). This hybrid keeps BOTH advantages: every row index
    stays a python int (static selects, static scratch addressing), and each
    row's whole body sits under a ``pl.when(i >= start)`` — a scalar-predicate
    branch Mosaic genuinely skips, so the all-padding prefix of a size-sorted
    lane tile costs ~nothing. Row values live in a ``(N, sub, LANE)`` VMEM
    plane scratch at static indices instead of SSA values (pl.when bodies
    cannot yield), which is where Mosaic would have spilled a 32-plane SSA
    ladder anyway.

    Garbage safety: rows below ``start`` leave their plane uninitialised, but
    subtree contiguity (children of used rows are used rows, trees.py
    invariants) means a used row's ``c2 == j`` / leaf / op selects never pick
    a garbage plane, and ``jnp.where`` does not propagate unselected NaNs.
    """
    var_start = fset.var_start

    def eval_tree(ops_tile, c2_tile, const_tile, x_tiles, vals_scr, start):
        zero = jnp.zeros((sub, LANE), jnp.float32)
        one = jnp.ones((sub, LANE), jnp.float32)
        for i in range(n):
            @pl.when(jnp.asarray(i, jnp.int32) >= start)
            def _(i=i):
                op = ops_tile[i]
                c2 = c2_tile[i]
                x = vals_scr[i - 1] if i else zero
                y = zero
                for j in range(i - 1):
                    y = jnp.where(c2 == j, vals_scr[j], y)
                leaf = zero
                for var in range(min(len(x_tiles), fset.num_variables)):
                    leaf = jnp.where(op == var_start + var, x_tiles[var], leaf)
                val = zero
                for k, fn in enumerate(fset.operator_fns):
                    sel = op == (OP_START + k)
                    xs = jnp.where(sel, x, one)
                    ys = jnp.where(sel, y, one)
                    val = jnp.where(sel, fn(xs, ys), val)
                val = jnp.where(op == CONST, const_tile[i], val)
                val = jnp.where(op >= var_start, leaf, val)
                vals_scr[i] = val
        # the root row n-1 is used on every non-padding lane (root-last,
        # size >= 1), so its plane is always written before this read
        return vals_scr[n - 1]

    return eval_tree


def _make_rollout_kernel(fset: FunctionSet, n: int, m: int, t_steps: int,
                         substeps: int, dt: float, method: str):
    stages, final_scale = _RK_TABLES[method]
    eval_tree = _make_sr_tree_eval(fset, n)
    # compile-time control (the policy kernel's fori-rolling, 29d9964): the
    # fully-unrolled body is O(substeps x stages x m x N^2) select ops —
    # ~90 s Mosaic compiles at the default config, ~6 min for SDE substeps.
    # Rolling the tree loop (dynamic VMEM row indexing) and the substep loop
    # (state carried in scratch refs — Mosaic cannot legalize multi-tile
    # tuple fori carries) divides the traced body by m*substeps.
    roll_trees = m >= 2
    roll_sub = substeps >= 2

    def kernel(ops_ref, c2_ref, const_ref, x0_ref, xs_ref, alive_ref,
               x_ref, live_ref, stage_ref, sem, *extra):
        # ops/c2/const: (m, n, 1, S, 128); x0: (d, 1, S, 128)
        # xs lives in HBM (full (t_steps, m, grid, S, 128)): a VMEM-resident
        # trajectory would blow the budget at long horizons; saved rows go
        # out through a double-buffered staging tile + async DMA.
        gi = pl.program_id(0)
        if roll_trees:
            tree_scr = extra[0]

            def drift(x_tiles):
                def body(mi, _):
                    tree_scr[mi] = eval_tree(
                        _RefRows(ops_ref, mi), _RefRows(c2_ref, mi),
                        _RefRows(const_ref, mi), x_tiles,
                    )
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        else:
            ops = [[ops_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            c2s = [[c2_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            consts = [[const_ref[mi, i, 0] for i in range(n)] for mi in range(m)]

            def drift(x_tiles):
                return [
                    eval_tree(ops[mi], c2s[mi], consts[mi], x_tiles)
                    for mi in range(m)
                ]

        def copy_out(t_row, slot):
            return pltpu.make_async_copy(
                stage_ref.at[slot], xs_ref.at[t_row, :, gi], sem.at[slot]
            )

        def ok_mask(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            return good.astype(jnp.float32)

        x = [x0_ref[mi, 0] for mi in range(m)]
        live_ref[...] = ok_mask(x)
        for mi in range(m):
            stage_ref[0, mi] = x[mi]
            x_ref[mi] = x[mi]
        copy_out(0, 0).start()

        h = dt / substeps

        def one_substep():
            """Advance x_ref/live_ref by one RK substep (state in scratch so
            the substep loop can roll into a fori without tuple carries)."""
            x = [x_ref[mi] for mi in range(m)]
            alive = live_ref[...]
            acc = [jnp.zeros((SUBLANES, LANE), jnp.float32) for _ in range(m)]
            k = None
            for c, w in stages:
                x_stage = x if k is None else [
                    x[mi] + (h * c) * k[mi] for mi in range(m)
                ]
                k = drift(x_stage)
                acc = [acc[mi] + w * k[mi] for mi in range(m)]
            x_new = [x[mi] + (h * final_scale) * acc[mi] for mi in range(m)]
            alive = alive * ok_mask(x_new)
            for mi in range(m):
                x_ref[mi] = jnp.where(alive > 0.5, x_new[mi], x[mi])
            live_ref[...] = alive

        def save_step(t, _):
            if roll_sub:
                def sub_body(s, _c):
                    one_substep()
                    return 0

                jax.lax.fori_loop(0, substeps, sub_body, 0)
            else:
                for _s in range(substeps):
                    one_substep()
            x = [x_ref[mi] for mi in range(m)]

            slot = (t + 1) % 2

            @pl.when(t >= 1)
            def _():
                copy_out(t - 1, slot).wait()

            for mi in range(m):
                stage_ref[slot, mi] = x[mi]
            copy_out(t + 1, slot).start()
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        copy_out(t_steps - 1, (t_steps - 1) % 2).wait()
        if t_steps >= 2:
            copy_out(t_steps - 2, (t_steps - 2) % 2).wait()
        alive_ref[0] = live_ref[...]

    return kernel, roll_trees


def _make_fitness_kernel(fset: FunctionSet, n: int, m: int, t_steps: int,
                         substeps: int, dt: float, method: str,
                         process_noise: bool = False, sub: int = SUBLANES,
                         deep: bool = False, skip: bool = False):
    """Rollout + in-kernel MSE: never materialises the trajectory.

    The SR fitness only needs ``mean_t sum_d (x_t - y_t)^2`` per lane; the
    rollout kernel's HBM trajectory write (and XLA's read-back + reduce) is
    pure waste for population evaluation. Here ground-truth rows stream IN
    through a double-buffered staging tile (the policy kernel's exo-stream
    pattern) and the squared error accumulates in a VMEM register tile; the
    only outputs are the per-lane error sum and the liveness mask.

    With ``process_noise`` the streamed row ``t`` additionally carries the
    interval's Euler-Maruyama kicks (``substeps * d`` values, exact
    ``integrate_sde`` draws precomputed by the evaluator), added to the state
    after each Euler substep — the SDE variant of the SR evaluator.
    """
    stages, final_scale = _RK_TABLES[method]
    # same compile-time control as _make_rollout_kernel (policy fori-rolling)
    roll_trees = m >= 2 or deep
    roll_sub = substeps >= 2
    if deep:
        eval_deep = _make_deep_tree_eval(fset, n, sub)
    elif skip:
        eval_when = _make_sr_tree_eval_when(fset, n, sub)
    else:
        eval_tree = _make_sr_tree_eval(fset, n, sub)

    def kernel(*refs):
        if deep:
            (ops_ref, const_ref, x0_ref, ys_ref, depth_ref, start_ref,
             err_ref, alive_ref, x_ref, live_ref, y_scr, ysem,
             tree_scr, planes_scr, sp_scr, top_scr, ysel_scr) = refs
        elif skip:
            (ops_ref, c2_ref, const_ref, x0_ref, ys_ref, start_ref,
             err_ref, alive_ref, x_ref, live_ref, y_scr, ysem, *extra) = refs
        else:
            (ops_ref, c2_ref, const_ref, x0_ref, ys_ref,
             err_ref, alive_ref, x_ref, live_ref, y_scr, ysem, *extra) = refs
        gi = pl.program_id(0)
        if deep:
            def drift(x_tiles):
                def body(mi, _):
                    eval_deep(
                        _RefRows(ops_ref, mi), _RefRows(const_ref, mi),
                        x_tiles, planes_scr, sp_scr, top_scr, ysel_scr,
                        start=start_ref[0, mi, 0],
                        depth_cap=lambda i, mi=mi: depth_ref[0, mi, i],
                    )
                    tree_scr[mi] = ysel_scr[...]
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        elif skip and roll_trees:
            tree_scr, vals_scr = extra

            def drift(x_tiles):
                def body(mi, _):
                    tree_scr[mi] = eval_when(
                        _RefRows(ops_ref, mi), _RefRows(c2_ref, mi),
                        _RefRows(const_ref, mi), x_tiles,
                        vals_scr, start_ref[0, mi, 0],
                    )
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        elif skip:
            vals_scr = extra[0]
            ops = [[ops_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            c2s = [[c2_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            consts = [[const_ref[mi, i, 0] for i in range(n)] for mi in range(m)]

            def drift(x_tiles):
                return [
                    eval_when(ops[mi], c2s[mi], consts[mi], x_tiles,
                              vals_scr, start_ref[0, mi, 0])
                    for mi in range(m)
                ]
        elif roll_trees:
            tree_scr = extra[0]

            def drift(x_tiles):
                def body(mi, _):
                    tree_scr[mi] = eval_tree(
                        _RefRows(ops_ref, mi), _RefRows(c2_ref, mi),
                        _RefRows(const_ref, mi), x_tiles,
                    )
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        else:
            ops = [[ops_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            c2s = [[c2_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            consts = [[const_ref[mi, i, 0] for i in range(n)] for mi in range(m)]

            def drift(x_tiles):
                return [
                    eval_tree(ops[mi], c2s[mi], consts[mi], x_tiles)
                    for mi in range(m)
                ]

        def y_copy(row, slot):
            return pltpu.make_async_copy(
                ys_ref.at[row, :, gi], y_scr.at[slot], ysem.at[slot]
            )

        def ok_mask(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            return good.astype(jnp.float32)

        def sq_err(x_tiles, slot):
            e = jnp.zeros((sub, LANE), jnp.float32)
            for mi in range(m):
                dlt = x_tiles[mi] - y_scr[slot, mi]
                e = e + dlt * dlt
            return e

        x = [x0_ref[mi, 0] for mi in range(m)]
        live_ref[...] = ok_mask(x)
        for mi in range(m):
            x_ref[mi] = x[mi]
        y_copy(0, 0).start()
        if t_steps > 1:
            y_copy(1, 1).start()
        y_copy(0, 0).wait()
        err_ref[0] = sq_err(x, 0)

        h = dt / substeps

        def one_substep(t, s):
            """Advance x_ref/live_ref by one RK(+kick) substep; ``s`` may be a
            python int (unrolled) or a traced fori index (rolled — the kick
            row offset is dynamic VMEM indexing either way)."""
            x = [x_ref[mi] for mi in range(m)]
            alive = live_ref[...]
            acc = [jnp.zeros((sub, LANE), jnp.float32) for _ in range(m)]
            k = None
            for c, w in stages:
                x_stage = x if k is None else [
                    x[mi] + (h * c) * k[mi] for mi in range(m)
                ]
                k = drift(x_stage)
                acc = [acc[mi] + w * k[mi] for mi in range(m)]
            x_new = [x[mi] + (h * final_scale) * acc[mi] for mi in range(m)]
            if process_noise:
                # kick rows of interval t live in row t (slot t % 2)
                x_new = [
                    x_new[mi] + y_scr[t % 2, m + s * m + mi]
                    for mi in range(m)
                ]
            alive = alive * ok_mask(x_new)
            for mi in range(m):
                x_ref[mi] = jnp.where(alive > 0.5, x_new[mi], x[mi])
            live_ref[...] = alive

        def save_step(t, _):
            y_copy(t + 1, (t + 1) % 2).wait()
            if roll_sub:
                def sub_body(s, _c):
                    one_substep(t, s)
                    return 0

                jax.lax.fori_loop(0, substeps, sub_body, 0)
            else:
                for _s in range(substeps):
                    one_substep(t, _s)
            x = [x_ref[mi] for mi in range(m)]

            err_ref[0] = err_ref[0] + sq_err(x, (t + 1) % 2)

            @pl.when(t + 2 <= t_steps - 1)
            def _():
                y_copy(t + 2, t % 2).start()
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        alive_ref[0] = live_ref[...]

    return kernel, roll_trees


# ---------------------------------------------------------------- deep trees
#
# Beyond UNROLL_MAX_NODES the unrolled SSA ladder is out (O(N^2) compile) and
# the r1 fused attempt with a full dynamic fori ladder measured SLOWER than
# per-call kernels (2.8 vs 8.2 Gnodes/s at N=128): every row paid an O(N)
# gather ladder. The r2 windowed-gather design (window-9 loads + a
# distance-bounded ladder fallback) was fast on grow-SAMPLED populations
# (93% of links within 8 rows) but quadratic on EVOLVED ones: crossover
# splices whole subtrees, and after ~40 generations at N=128 link distances
# reach p90=36 / p99=104, so the per-tile max-distance fallback fired near
# full-length on most rows (measured 832 ms vs 43 ms per pop-4096 eval).
#
# This is the STACK interpreter SURVEY.md §7 design-delta 2 prescribed: in a
# root-last postorder serialization a binary node's operands are always the
# top TWO stack entries (subtrees are contiguous, so the second-child value
# sits directly below the first-child value on the stack) — no gather, no
# child pointers, no fallback, for EVERY tree shape:
#
# * rows roll in a fori; the top of stack lives in a register tile, deeper
#   entries in a (depth, S, L) VMEM plane scratch indexed by a per-lane
#   stack pointer (a select ladder over planes);
# * the ladder is bounded by the TILE's max stack depth (an SMEM scalar per
#   (tile, tree)) — stack depth is small (p50 4 / max 7 on grow-sampled,
#   p99 24 / max 28 on 40-gen evolved N=128 populations) and bounded by
#   (leaves+1) <= (N+1)/2 + 1 always, so the plane scratch is HALF the old
#   (N, S, L) row-value scratch;
# * (8, 128) lane tiles keep the two tree streams (opcode + const — the
#   child-index stream is no longer read at all) + plane scratch inside
#   VMEM at N=256.
DEEP_MAX_NODES = 256
SUBLANES_DEEP = 8
TILE_DEEP = SUBLANES_DEEP * LANE


def stack_planes(n: int) -> int:
    """Plane-scratch allocation for the deep stack eval: the deepest stack a
    size-<=n postorder program can need is one slot per leaf plus the top
    register; leaves <= (n + 1) // 2 for arity-<=2 trees."""
    return (n + 1) // 2 + 1


def _make_deep_tree_eval(fset: FunctionSet, n: int, sub: int):
    """Rolled-row STACK-machine tree eval on (sub, 128) tiles. Returns
    ``eval_tree(ops_rows, const_rows, x_tiles, planes_scr, sp_scr, top_scr,
    y_scr, start, depth_cap)`` writing the root value to ``y_scr`` (read it
    back as ``y_scr[...]``).

    Per row: a leaf pushes (old top spills to ``planes_scr[sp-1]``), a unary
    operator rewrites the top in place, a binary operator consumes the top
    (first operand, the adjacent child's value — same operand order as the
    unrolled ladder's ``x = vals[i-1]``) and ``planes_scr[sp-2]`` (second
    operand), net-popping one. Plane reads/writes are one fused select
    ladder over the planes live AT THIS ROW: ``depth_cap`` is either a
    per-(tile, tree) scalar (the tile's max stack depth; the ladder runs
    ``depth_cap - 1`` trips) or a callable ``depth_cap(i) -> trips`` giving
    the exact per-row trip count (max plane index accessed at row ``i``
    over the tile's lanes, plus one — :func:`deep_tile_scalars`). The
    per-row form is the deep default: a tree's max stack depth is reached
    on a few rows only (evolved N=128 populations: per-row mean ~4 vs
    per-tree p99 ~24), so row-local bounds cut most ladder trips.

    ``start`` (scalar, possibly traced) skips the all-padding row prefix:
    the layout is padding-first with every tree's used rows a contiguous
    suffix ``[n - size, n)``. EMPTY rows are per-lane no-ops (they match no
    opcode class, so top/sp/planes pass through), which also makes the skip
    exact."""
    import numpy as np

    var_start = fset.var_start
    # opcode arity is static (FunctionSet is a plain dataclass, never traced)
    # — resolve the binary opcodes HERE: the ``slots`` property builds a
    # fresh jnp array, which inside a trace is a tracer that ``int()`` rejects
    arities = np.asarray(jax.device_get(fset.arities))
    binary_ops = [OP_START + k for k, a in enumerate(arities) if int(a) == 2]
    # the common operator sets list all binaries first (+,-,*,/ then
    # sin/cos...), making the binary opcodes a contiguous range — detect
    # that statically and emit one range compare per row instead of a
    # per-opcode equality ladder (both branches are semantically identical)
    binary_contiguous = (
        len(binary_ops) > 0
        and binary_ops == list(range(binary_ops[0], binary_ops[-1] + 1))
    )

    def eval_tree(ops_rows, const_rows, x_tiles, planes_scr, sp_scr,
                  top_scr, y_scr, start=0, depth_cap=None):
        zero = jnp.zeros((sub, LANE), jnp.float32)
        one = jnp.ones((sub, LANE), jnp.float32)
        izero = jnp.zeros((sub, LANE), jnp.int32)
        if depth_cap is None:
            trips = lambda i: planes_scr.shape[0] - 1
        elif callable(depth_cap):
            trips = depth_cap  # exact per-row trip counts (host-precomputed)
        else:
            cap = depth_cap
            trips = lambda i: jnp.maximum(cap - 1, 0)

        sp_scr[...] = izero
        top_scr[...] = zero

        def row(i, _):
            op = ops_rows[i]
            sp = sp_scr[...]
            top = top_scr[...]
            is_leaf = (op == CONST) | (op >= var_start)
            if binary_contiguous:
                is2 = jnp.where(
                    (op >= binary_ops[0]) & (op <= binary_ops[-1]), 1, izero
                )
            else:
                is2 = izero
                for opc in binary_ops:
                    is2 = jnp.where(op == opc, 1, is2)

            # one pass over the live planes: read the second operand
            # (binary rows, plane sp-2) and spill the old top (leaf rows,
            # plane sp-1) — disjoint per lane, so a single fori serves both
            y_scr[...] = zero

            def plane(p_idx, _):
                pv = planes_scr[p_idx]
                y_scr[...] = jnp.where(sp - 2 == p_idx, pv, y_scr[...])
                planes_scr[p_idx] = jnp.where(
                    is_leaf & (sp - 1 == p_idx), top, pv
                )
                return 0

            jax.lax.fori_loop(0, trips(i), plane, 0)
            x = top
            y = y_scr[...]

            leaf = zero
            for var in range(min(len(x_tiles), fset.num_variables)):
                leaf = jnp.where(op == var_start + var, x_tiles[var], leaf)
            val = zero
            for k, fn in enumerate(fset.operator_fns):
                sel = op == (OP_START + k)
                xs = jnp.where(sel, x, one)
                ys = jnp.where(sel, y, one)
                val = jnp.where(sel, fn(xs, ys), val)
            val = jnp.where(op == CONST, const_rows[i], val)
            val = jnp.where(op >= var_start, leaf, val)

            top_scr[...] = jnp.where(op != EMPTY, val, top)
            sp_scr[...] = sp + jnp.where(
                is_leaf, 1, jnp.where(is2 == 1, -1, 0)
            )
            return 0

        jax.lax.fori_loop(start, n, row, 0, unroll=False)
        y_scr[...] = top_scr[...]

    return eval_tree


def far_link_rows(trees: TreeTensors, window: int | None = None):
    """(P, m, N) bool: row has a second-child link farther than ``window``.

    Telemetry helper (the per-call interpreter kernels' windowed gather and
    its tests use it); the deep STACK eval above has no window."""
    if window is None:
        from .pallas_interpreter import GATHER_WINDOW as window
    n = trees.max_nodes
    rows = jnp.arange(n, dtype=jnp.int32)
    dist = rows - trees.c2
    return (trees.c2 >= 0) & (dist > window)


def _plane_need(trees: TreeTensors, slots):
    """Per-(candidate, tree, row) plane-ladder trip need (see
    ``deep_tile_scalars``): binary rows read plane ``sp - 2`` (``sp - 1``
    trips), leaf rows spill to ``sp - 1`` (``sp`` trips), others none."""
    from .trees import EMPTY

    used = trees.ops != EMPTY
    arity = jnp.take(jnp.asarray(slots, jnp.int32), trees.ops, axis=0)
    w = jnp.where(used, 1 - arity, 0)
    sp_after = jnp.cumsum(w, axis=-1)
    sp_before = sp_after - w
    need = jnp.where(
        used & (arity == 2), sp_before - 1,
        jnp.where(used & (arity == 0), sp_before, 0),
    ).astype(jnp.int32)  # (P, m, N)
    return jnp.maximum(need, 0)


def deep_tile_scalars(trees: TreeTensors, slots, b: int, tile: int,
                      grid: int, lp: int):
    """Per-(lane-tile, tree) SMEM streams for the deep stack kernels.

    Returns ``(row_trips (grid, m, n) int32, start_rows (grid, m, 1) int32)``
    (trailing singleton on ``start_rows`` so the per-tile SMEM block's last
    two dims equal the array's — Mosaic rejects 2-D ``(1, m)`` blocks over
    ``(grid, m)``):
    ``row_trips[g, mi, i]`` — the EXACT plane-ladder trip count at row ``i``
    over tile ``g``'s lanes: a binary row reads plane ``sp - 2`` (``sp``:
    the lane's stack pointer entering the row, the exclusive running sum of
    ``1 - arity`` over used rows), a leaf row spills to plane ``sp - 1``,
    other rows touch no plane — so the per-lane need is ``sp - 1`` / ``sp``
    / ``0`` trips respectively, maxed over lanes. Row-local bounds matter:
    a tree's max stack depth is hit on a few rows only (evolved N=128
    populations: per-row mean ~4 vs per-tree p99 ~24 — most rows' ladders
    shrink ~5x vs a per-tree cap).
    ``start_rows[g, mi]`` — the tile's first used row ``n - max(size)``
    (rows below are EMPTY padding on every lane, skipped exactly).
    ``slots`` is the function set's arity-by-opcode table. Lanes are
    candidate-major ``p * b``."""
    from .trees import EMPTY

    p, m = trees.batch_shape
    n = trees.max_nodes
    need = _plane_need(trees, slots)  # (P, m, N)
    sizes = jnp.sum(trees.ops != EMPTY, axis=-1).astype(jnp.int32)  # (P, m)
    if tile % b == 0:
        cpt = tile // b  # candidates per lane tile
        p_pad = grid * cpt
        if p_pad > p:
            need = jnp.pad(need, ((0, p_pad - p), (0, 0), (0, 0)))
            sizes = jnp.pad(sizes, ((0, p_pad - p), (0, 0)))
        row_trips = need.reshape(grid, cpt, m, n).max(axis=1)
        size_max = sizes.reshape(grid, cpt, m).max(axis=1)
    else:  # tiles straddle candidates: lane-level reduction (superset)
        lane_cand = jnp.minimum(jnp.arange(lp, dtype=jnp.int32) // b, p - 1)
        row_trips = need[lane_cand].reshape(grid, tile, m, n).max(axis=1)
        size_max = sizes[lane_cand].reshape(grid, tile, m).max(axis=1)
    start_rows = (n - size_max).astype(jnp.int32)[..., None]
    return row_trips.astype(jnp.int32), start_rows


def tile_start_rows(trees: TreeTensors, b: int, tile: int, grid: int,
                    lp: int):
    """``start_rows`` alone — the per-tile first used row ``n - max(size)``
    for the SHALLOW skip branch's ``pl.when`` gate, which never reads
    ``deep_tile_scalars``' per-row trip counts (so their arity gather +
    cumsum over ``(P, m, N)`` would be pure waste on every shallow eval)."""
    from .trees import EMPTY

    p, m = trees.batch_shape
    n = trees.max_nodes
    sizes = jnp.sum(trees.ops != EMPTY, axis=-1).astype(jnp.int32)  # (P, m)
    if tile % b == 0:
        cpt = tile // b  # candidates per lane tile
        p_pad = grid * cpt
        if p_pad > p:
            sizes = jnp.pad(sizes, ((0, p_pad - p), (0, 0)))
        size_max = sizes.reshape(grid, cpt, m).max(axis=1)
    else:  # tiles straddle candidates: lane-level reduction (superset)
        lane_cand = jnp.minimum(jnp.arange(lp, dtype=jnp.int32) // b, p - 1)
        size_max = sizes[lane_cand].reshape(grid, tile, m).max(axis=1)
    return (n - size_max).astype(jnp.int32)[..., None]


def size_sort_candidates(trees: TreeTensors, slots=None):
    """Sort candidates for lane-tile packing; returns
    ``(sorted_trees, order, inv_order)``. Per-lane results are independent,
    so evaluating sorted and inverse-permuting the outputs is bit-exact.

    Default key: total tree size (ascending) — size-homogeneous lane tiles
    make the deep kernels' per-tile ``start_rows`` bound tight.
    ``MTGP_SR_SORT`` selects alternatives for the EVOLVED-population packing
    A/B (VERDICT r3 #3; needs ``slots``, else falls back to size):

    - ``trips``      — total plane-ladder trip need: the deep kernel's
      per-row cost is ``max`` over the tile's lanes, and evolved pops are
      shape-diverse at equal size (crossover splices), so clustering by the
      ladder work itself can tighten the per-row union.
    - ``size_trips`` — size-major, trips-minor lexicographic.
    """
    import os

    from .trees import EMPTY

    sizes = jnp.sum(jnp.sum(trees.ops != EMPTY, axis=-1), axis=-1)
    # default size_trips after the r4 evolved-packing study: every ordering
    # sits ~3x over the per-lane ideal (the per-row max over a 64-candidate
    # tile is structural waste), but size-major/trips-minor measured +2.3%
    # over plain size on the evolved_deep hardware A/B and never loses on
    # the cost model (3.04x vs 3.12x). MTGP_SR_SORT=size restores r3.
    mode = os.environ.get("MTGP_SR_SORT", "size_trips")
    if slots is not None and mode in ("trips", "size_trips"):
        trips = jnp.sum(_plane_need(trees, slots), axis=(-1, -2))
        n2 = trees.max_nodes * trees.max_nodes  # > any trip total
        key = trips if mode == "trips" else sizes * n2 + trips
    else:
        key = sizes
    order = jnp.argsort(key)
    inv_order = jnp.argsort(order)
    return (
        jax.tree_util.tree_map(lambda t: t[order], trees), order, inv_order
    )


def rollout_available(
    fset: FunctionSet, trees: TreeTensors, d: int, deep_ok: bool = False
) -> bool:
    # The trajectory kernel is gated at UNROLL_MAX_NODES (unrolled SSA
    # ladder); the fitness kernel also covers deep trees up to
    # DEEP_MAX_NODES via the windowed rolled-row variant (deep_ok=True).
    limit = DEEP_MAX_NODES if deep_ok else UNROLL_MAX_NODES
    return (
        tpu_kernels_available()
        and trees.max_nodes <= limit
        and trees.batch_shape[-1] == d  # m == state dim
    )


def rollout_sr_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    fset: FunctionSet,
    substeps: int = 1,
    method: str = "rk4",
):
    """Fused SR rollout: ``dx = trees(x)`` from ``x0 (P, B, d)`` over the
    uniform grid ``ts (T,)``. trees batched ``(P, m)`` with ``m == d``.

    Returns ``(xs (T, P, B, d), alive (T, P, B))`` matching
    ``integrators.integrate`` semantics (alive is constant-extended: the
    kernel reports final liveness; intermediate rows replicate it backwards
    only where used — the SR evaluator consumes ``alive[-1]`` only).

    Differentiable: the forward is the fused kernel; the VJP (constant
    optimisation) recomputes through the unfused scan rollout, whose
    interpreter calls carry their own Pallas forward/backward kernels.
    """
    import numpy as np

    @jax.custom_vjp
    def run(ops, c1, c2, const, x0):
        return _rollout_impl(
            TreeTensors(ops, c1, c2, const), x0, ts, fset, substeps, method
        )

    def fwd(ops, c1, c2, const, x0):
        return run(ops, c1, c2, const, x0), (ops, c1, c2, const, x0)

    def bwd(res, g):
        ops, c1, c2, const, x0 = res
        g_xs, _g_alive = g

        def unfused(c, x0_):
            from ..models.integrators import integrate
            from .interpreter import evaluate_trees

            t = TreeTensors(ops, c1, c2, c)[:, None]

            def drift(tt, x):
                return evaluate_trees(t, x[:, :, None, :], fset, impl="pallas")

            xs, _ = integrate(drift, x0_, ts, method=method, substeps=substeps)
            return xs

        _, vjp = jax.vjp(unfused, const, x0)
        dconst, dx0 = vjp(g_xs)
        zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return zero(ops), zero(c1), zero(c2), dconst, dx0

    run.defvjp(fwd, bwd)
    return run(trees.ops, trees.c1, trees.c2, trees.const, x0)


def rollout_sr_fitness_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    substeps: int = 1,
    method: str = "rk4",
    process_noise_rows: Array | None = None,
    unfused_mse=None,
):
    """Fused rollout + in-kernel MSE: ``(mse (P, B), alive (P, B))``.

    ``ys`` is the ground truth ``(B, T, d)`` (the SR data-tuple layout). The
    trajectory never touches HBM — ground-truth rows stream in and the
    squared error accumulates on-core, so population fitness evaluation costs
    one HBM read of ``ys`` instead of a trajectory write + two reads
    (measured bandwidth-bound at pop 4096). ``mse`` equals
    ``mean_t sum_d (x_t - y_t)^2`` with the integrator's frozen-lane
    semantics; divergence handling (-> max_fitness) stays in the evaluator.

    With ``process_noise_rows`` ((T, B, substeps*d) exact ``integrate_sde``
    kicks; Euler stepping) the rollout is the SDE variant; the caller then
    also supplies ``unfused_mse(ops, c1, c2, const, x0) -> mse`` for the
    recompute VJP (the default recompute is the pure-ODE path).

    Differentiable via unfused recompute, like :func:`rollout_sr_pallas`.
    """
    import numpy as np

    @jax.custom_vjp
    def run(ops, c1, c2, const, x0):
        return _fitness_impl(
            TreeTensors(ops, c1, c2, const), x0, ts, ys, fset, substeps, method,
            process_noise_rows,
        )

    def fwd(ops, c1, c2, const, x0):
        return run(ops, c1, c2, const, x0), (ops, c1, c2, const, x0)

    def bwd(res, g):
        ops, c1, c2, const, x0 = res
        g_mse, _g_alive = g

        def default_unfused(c, x0_):
            from ..models.integrators import integrate
            from .interpreter import evaluate_trees

            t = TreeTensors(ops, c1, c2, c)[:, None]

            def drift(tt, x):
                return evaluate_trees(t, x[:, :, None, :], fset, impl="pallas")

            xs, _ = integrate(drift, x0_, ts, method=method, substeps=substeps)
            err = xs - jnp.transpose(ys, (1, 0, 2))[:, None, :, :]
            return jnp.mean(jnp.sum(jnp.square(err), axis=-1), axis=0)

        unfused = (
            (lambda c, x0_: unfused_mse(ops, c1, c2, c, x0_))
            if unfused_mse is not None
            else default_unfused
        )
        _, vjp = jax.vjp(unfused, const, x0)
        dconst, dx0 = vjp(g_mse)
        zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return zero(ops), zero(c1), zero(c2), dconst, dx0

    run.defvjp(fwd, bwd)
    return run(trees.ops, trees.c1, trees.c2, trees.const, x0)


def prepare_sr_fitness(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    substeps: int = 1,
    method: str = "rk4",
    process_noise_rows: Array | None = None,
    unfused_mse=None,
):
    """Split prepare/run API for CHAINED evaluations of one population
    structure (steady-state benches, constant-optimisation refinement):

    ``run, const0 = prepare_sr_fitness(trees, ...)`` hoists the size sort,
    lane layout, SMEM scalars and kernel build (57% of the per-eval wall at
    pop 4096, results_r4/pod_profile.txt) out of the evaluation;
    ``run(const_sorted) -> (mse (P, B), alive (P, B))`` — in ORIGINAL
    candidate order — pays only the constant-stream layout + the kernel
    launch. ``const0 = trees.const`` in the prepared (sorted) order: carry
    it through the chain instead of re-permuting per step (XLA's gather is
    pathological inside scans on TPU). Differentiable w.r.t. the sorted
    constants via the same unfused recompute as
    :func:`rollout_sr_fitness_pallas`. Semantics and bit-pattern identical
    to calling the one-shot API with ``trees._replace(const=
    const_sorted[inv_order])``."""
    run_const, order, inv_order = _fitness_prepare(
        trees, x0, ts, ys, fset, substeps, method, process_noise_rows
    )
    ops, c1, c2 = trees.ops, trees.c1, trees.c2
    const0 = trees.const if order is None else trees.const[order]

    @jax.custom_vjp
    def run(const_s):
        return run_const(const_s)

    def fwd(const_s):
        return run(const_s), const_s

    def bwd(const_s, g):
        g_mse, _g_alive = g

        def unfused(c_s):
            c = c_s if inv_order is None else c_s[inv_order]
            if unfused_mse is not None:
                return unfused_mse(ops, c1, c2, c, x0)
            from ..models.integrators import integrate
            from .interpreter import evaluate_trees

            t = TreeTensors(ops, c1, c2, c)[:, None]

            def drift(tt, x):
                return evaluate_trees(t, x[:, :, None, :], fset, impl="pallas")

            xs, _ = integrate(drift, x0, ts, method=method, substeps=substeps)
            err = xs - jnp.transpose(ys, (1, 0, 2))[:, None, :, :]
            return jnp.mean(jnp.sum(jnp.square(err), axis=-1), axis=0)

        _, vjp = jax.vjp(unfused, const_s)
        (dconst_s,) = vjp(g_mse)
        return (dconst_s,)

    run.defvjp(fwd, bwd)
    return run, const0


def _lane_layout(trees: TreeTensors, x0: Array, sub: int):
    """Shared lane-layout prep for the SR rollout kernels.

    Flattens the ``(P, B)`` population x trajectory axes candidate-major
    onto ``(grid, sub, LANE)`` tiles: tree streams broadcast over B (every
    trajectory of a candidate shares its trees), initial states laid out
    per-lane. Returns ``((ops, c2, const, x0) tiles, (lanes, pad, lp, grid))``.
    One definition so the fixed-step, trajectory and adaptive impls cannot
    disagree on lane order.
    """
    p, b, d = x0.shape
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    tile = sub * LANE
    lanes = p * b
    pad = (-lanes) % tile
    lp = lanes + pad
    grid = lp // tile

    def prep_tree(x, dtype):
        xt = jnp.moveaxis(x, 0, -1)  # (m, N, P)
        xt = jnp.broadcast_to(xt[..., None], (m, n, p, b)).reshape(m, n, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad))) if pad else xt
        return xt.astype(dtype).reshape(m, n, grid, sub, LANE)

    ops_l = prep_tree(trees.ops, jnp.int32)
    c2_l = prep_tree(trees.c2, jnp.int32)
    const_l = prep_tree(trees.const, jnp.float32)

    x0_l = jnp.moveaxis(x0, -1, 0).reshape(d, lanes)
    x0_l = jnp.pad(x0_l, ((0, 0), (0, pad))) if pad else x0_l
    x0_l = x0_l.astype(jnp.float32).reshape(d, grid, sub, LANE)
    return (ops_l, c2_l, const_l, x0_l), (lanes, pad, lp, grid)


def _lane_rows(y: Array, p: int, b: int, lanes: int, pad: int, grid: int,
               sub: int) -> Array:
    """(T, B, rows) per-save-point rows -> (T, rows, grid, sub, LANE) tiles,
    broadcast over the population axis (same lane order as _lane_layout)."""
    t_steps, _, rows = y.shape
    y = jnp.broadcast_to(y[:, None], (t_steps, p, b, rows)).reshape(
        t_steps, lanes, rows
    )
    y = jnp.moveaxis(y, -1, 1)  # (T, rows, lanes)
    y = jnp.pad(y, ((0, 0), (0, 0), (0, pad))) if pad else y
    return y.reshape(t_steps, rows, grid, sub, LANE)


def _fitness_prepare(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    substeps: int,
    method: str,
    process_noise_rows: Array | None = None,
):
    """Structure-dependent half of the fused SR fitness evaluation: size
    sort, lane layout of the op/child streams, ground-truth rows, per-tile
    SMEM scalars, kernel construction — everything that does NOT depend on
    the constant values. Returns ``(run_const, order, inv_order)`` where
    ``run_const(const_sorted (P, m, N)) -> (mse (P, B), alive (P, B))`` in
    ORIGINAL candidate order lays out the constants and launches.

    Motivation (r4 pod profile, results_r4/pod_profile.txt): sort+layout is
    5.28 ms of the 9.27 ms/eval at pop 4096 — 57% of the wall — and it is
    loop-invariant across chained same-structure evaluations (bench steady
    state, const-opt refinement steps). Hoisting it out of the chain's
    ``lax.scan`` makes it a scan constant XLA computes once; the per-eval
    residue is one constant-stream layout + the kernel launch. The XLA
    ``gather`` used by the size-sort permutation is also pathological
    inside scans on TPU (CLAUDE.md), which is why callers carry the
    SORTED constants instead of re-permuting per step."""
    import os

    p, b, d = x0.shape
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    t_steps = ts.shape[0]
    ts_np = jax.device_get(ts) if not isinstance(ts, jax.core.Tracer) else None
    if ts_np is None:
        raise ValueError("rollout_sr_fitness_pallas requires a concrete time grid")
    dt = float(ts_np[1] - ts_np[0])

    # MTGP_SR_FORCE_DEEP=1 routes shallow populations through the rolled-row
    # deep kernel too. Hardware A/B (r2, v5e, pop 4096, N=32): unrolled
    # 6.46e10 vs rolled 4.05e10 node-evals/s — SR evaluates ONE tree per
    # lane tile with mean size ~6, so the prefix skip saves less than the
    # dynamic row indexing costs; the unrolled ladder stays the shallow-N
    # default here (the POLICY kernel A/B went the other way, see
    # pallas_policy.py — m trees per step make the skip win 2.3x).
    deep = n > UNROLL_MAX_NODES or os.environ.get("MTGP_SR_FORCE_DEEP") == "1"
    # shallow default: pl.when row-gating on the unrolled ladder (static
    # selects + static scratch addressing, padding-prefix rows branched
    # over). MTGP_SR_NO_SKIP=1 restores the plain unrolled ladder for A/B.
    skip = not deep and os.environ.get("MTGP_SR_NO_SKIP") != "1"
    sub = SUBLANES_DEEP if deep else SUBLANES
    tile = sub * LANE

    order = inv_order = None
    if deep or skip:
        # size-sorted lanes: the deep kernel's row loop (and the shallow
        # skip kernel's pl.when gate) starts at the TILE's first used row
        # (padding-first layout), so grouping similar-sized candidates into
        # the same tile makes that bound tight
        trees, order, inv_order = size_sort_candidates(trees, fset.slots)
        x0 = x0[order]

    (ops_l, c2_l, _const_l, x0_l), (lanes, pad, lp, grid) = _lane_layout(
        trees, x0, sub
    )

    # ground truth rows: (B, T, d) -> (T, d, lanes) broadcast over P. This is
    # a per-`data` constant — under the evaluator's closure-jit it is
    # materialised once and only READ per evaluation.
    y = jnp.moveaxis(jnp.asarray(ys, jnp.float32), 1, 0)  # (T, B, d)
    if process_noise_rows is not None:
        # row t = [y_t (d) | interval-t kicks (substeps*d)]
        y = jnp.concatenate(
            [y, jnp.asarray(process_noise_rows, jnp.float32)], axis=-1
        )
    rows = y.shape[-1]
    ys_l = _lane_rows(y, p, b, lanes, pad, grid, sub)

    kernel, roll_trees = _make_fitness_kernel(
        fset, n, m, t_steps, substeps, dt, method,
        process_noise=process_noise_rows is not None, sub=sub, deep=deep,
        skip=skip,
    )
    tree_spec = pl.BlockSpec(
        (m, n, 1, sub, LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    lane_out = pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    x0_spec = pl.BlockSpec((d, 1, sub, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    ys_spec = pl.BlockSpec(memory_space=pl.ANY)  # ys rows stream via DMA
    smem_scalar = pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)
    scratch = [
        pltpu.VMEM((m, sub, LANE), jnp.float32),
        pltpu.VMEM((sub, LANE), jnp.float32),
        pltpu.VMEM((2, rows, sub, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if deep:
        # per-(tile, tree, row) ladder-trip counts + per-(tile, tree)
        # first-used-row scalars in SMEM; the stack eval reads no child
        # indices, so c2 is not shipped at all
        row_trips, start_rows = deep_tile_scalars(
            trees, fset.slots, b, tile, grid, lp
        )
        smem_rows = pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM)
        in_specs = [tree_spec, tree_spec, x0_spec, ys_spec,
                    smem_rows, smem_scalar]
        # const_l spliced at index 1 by run_const
        pre, post = [ops_l], [x0_l, ys_l, row_trips, start_rows]
        scratch += [
            pltpu.VMEM((m, sub, LANE), jnp.float32),  # tree_scr
            pltpu.VMEM((stack_planes(n), sub, LANE), jnp.float32),  # planes
            pltpu.VMEM((sub, LANE), jnp.int32),  # sp_scr
            pltpu.VMEM((sub, LANE), jnp.float32),  # top_scr
            pltpu.VMEM((sub, LANE), jnp.float32),  # ysel_scr
        ]
    elif skip:
        start_rows = tile_start_rows(trees, b, tile, grid, lp)
        in_specs = [tree_spec, tree_spec, tree_spec, x0_spec, ys_spec,
                    smem_scalar]
        pre, post = [ops_l, c2_l], [x0_l, ys_l, start_rows]
        if roll_trees:
            scratch += [pltpu.VMEM((m, sub, LANE), jnp.float32)]  # tree_scr
        scratch += [pltpu.VMEM((n, sub, LANE), jnp.float32)]  # vals planes
    else:
        in_specs = [tree_spec, tree_spec, tree_spec, x0_spec, ys_spec]
        pre, post = [ops_l, c2_l], [x0_l, ys_l]
        if roll_trees:
            scratch += [pltpu.VMEM((m, sub, LANE), jnp.float32)]

    def run_const(const_sorted):
        # constant-stream layout — the ONLY structure-independent operand;
        # must match _lane_layout's prep_tree bit-for-bit
        xt = jnp.moveaxis(const_sorted, 0, -1)  # (m, N, P)
        xt = jnp.broadcast_to(xt[..., None], (m, n, p, b)).reshape(m, n, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad))) if pad else xt
        const_l = xt.astype(jnp.float32).reshape(m, n, grid, sub, LANE)

        err, alive = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(lane_out, lane_out),
            out_shape=(
                jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
                jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
            ),
            scratch_shapes=scratch,
        )(*(pre + [const_l] + post))

        mse = (err.reshape(lp)[:lanes] / t_steps).reshape(p, b)
        alive_last = alive.reshape(lp)[:lanes].reshape(p, b) > 0.5
        if inv_order is not None:  # undo the size-sort lane permutation
            mse = mse[inv_order]
            alive_last = alive_last[inv_order]
        return mse, alive_last

    return run_const, order, inv_order


def _fitness_impl(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    substeps: int,
    method: str,
    process_noise_rows: Array | None = None,
):
    run_const, order, _inv = _fitness_prepare(
        trees, x0, ts, ys, fset, substeps, method, process_noise_rows
    )
    const_s = trees.const if order is None else trees.const[order]
    return run_const(const_s)


def _rollout_impl(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    fset: FunctionSet,
    substeps: int = 1,
    method: str = "rk4",
):
    p, b, d = x0.shape
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    t_steps = ts.shape[0]
    ts_np = jax.device_get(ts) if not isinstance(ts, jax.core.Tracer) else None
    dt = float(ts_np[1] - ts_np[0]) if ts_np is not None else None
    if dt is None:
        raise ValueError("rollout_sr_pallas requires a concrete uniform time grid")

    sub = SUBLANES
    (ops_l, c2_l, const_l, x0_l), (lanes, pad, lp, grid) = _lane_layout(
        trees, x0, sub
    )

    kernel, roll_trees = _make_rollout_kernel(
        fset, n, m, t_steps, substeps, dt, method
    )
    tree_spec = pl.BlockSpec(
        (m, n, 1, sub, LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )

    xs, alive = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            tree_spec, tree_spec, tree_spec,
            pl.BlockSpec((d, 1, sub, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # trajectory stays in HBM
            pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, m, grid, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, sub, LANE), jnp.float32),
            pltpu.VMEM((sub, LANE), jnp.float32),
            pltpu.VMEM((2, m, sub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((m, sub, LANE), jnp.float32)] if roll_trees else []),
    )(ops_l, c2_l, const_l, x0_l)

    xs = xs.reshape(t_steps, m, lp)[:, :, :lanes].reshape(t_steps, m, p, b)
    xs = jnp.moveaxis(xs, 1, -1)  # (T, P, B, d)
    alive_last = alive.reshape(lp)[:lanes].reshape(p, b) > 0.5
    alive_t = jnp.broadcast_to(alive_last[None], (t_steps, p, b))
    return xs, alive_t


# ------------------------------------------------------- adaptive (PID) path
#
# The notebooks' actual solver configuration is ADAPTIVE (Dopri5 +
# PIDController, SymbolicRegression.ipynb cell 2 / SR_evaluator.py:76-79);
# the general path batches it as integrators.integrate_adaptive (per-lane
# (t, dt), masked accept/reject). That path relaunches a per-call
# interpreter kernel for EVERY drift evaluation — hundreds of launches and
# tree-stream HBM reads per population evaluation. This kernel fuses the
# whole thing: the embedded RK pair, the per-lane step controller, and the
# MSE accumulation run in ONE launch with the tree streams VMEM-resident.
#
# It mirrors integrate_adaptive's expressions exactly (same tableau
# constants, same mask algebra, same controller clamps), so short-horizon
# parity with the general path is ~fp-exact. Always uses the rolled-row
# deep tree eval (windowed gather + dynamic row start + size-sorted tiles):
# one code path for every N <= DEEP_MAX_NODES, with the padding-prefix
# skipping the adaptive path needs even more (its drift count per lane is
# data-dependent, so wasted rows multiply).
#
# ``ts`` streams through SMEM — the grid may be TRACED and non-uniform
# (unlike the fixed-step kernels, which bake dt into the schedule).


def _make_adaptive_fitness_kernel(fset: FunctionSet, n: int, m: int,
                                  t_steps: int, max_steps: int, rtol: float,
                                  atol: float, safety: float, method: str,
                                  sub: int, shallow: bool = False):
    from ..models.integrators import _BS_A, _BS_B_LOW, _DP_A, _DP_B4, _DP_B5

    import os

    if method not in ("bosh3", "dopri5"):
        # match integrate_adaptive: an unknown method must error, not
        # silently integrate with the dopri5 tableau
        raise ValueError(f"unknown adaptive method: {method!r}")
    err_exponent = -1.0 / 3.0 if method == "bosh3" else -0.2
    dt_reset = os.environ.get("MTGP_ADAPTIVE_DT_RESET") == "1"
    # FSAL (first-same-as-last): both tableaus evaluate their LAST stage at
    # x_hi (dopri5's A row 7 == b5[:6] float-for-float above; bosh3's x_hi
    # uses _BS_A[2] directly), so an ACCEPTED step's last k is exactly the
    # next step's k1 = drift(x_hi), and a rejected step leaves x (hence
    # drift(x)) unchanged. Carrying k1 in VMEM drops the per-attempt drift
    # count 7->6 (dopri5) / 4->3 (bosh3), bit-exact vs recomputing (on
    # accept, err finiteness forces the last k finite; the only divergence
    # is a +-0.0 sign corner through dopri5's literal +0.0*k7 term).
    # MTGP_ADAPTIVE_NO_FSAL=1 restores the recompute for A/B.
    fsal = (os.environ.get("MTGP_ADAPTIVE_NO_FSAL") != "1"
            and os.environ.get("MTGP_ADAPTIVE_FSAL", "1") == "1")
    if shallow:
        eval_shallow = _make_sr_tree_eval_when(fset, n, sub)
    else:
        eval_deep = _make_deep_tree_eval(fset, n, sub)

    def kernel(*refs):
        if shallow:
            (ops_ref, c2_ref, const_ref, x0_ref, ts_ref, ys_ref, depth_ref,
             start_ref, err_ref, alive_ref, steps_ref, x_ref, live_ref,
             t_scr, dt_scr, y_scr, ysem, tree_scr, vals_scr, k1_scr,
             go_scr) = refs
        else:
            (ops_ref, const_ref, x0_ref, ts_ref, ys_ref, depth_ref,
             start_ref, err_ref, alive_ref, steps_ref, x_ref, live_ref,
             t_scr, dt_scr, y_scr, ysem, tree_scr, planes_scr, sp_scr,
             top_scr, ysel_scr, k1_scr, go_scr) = refs
        gi = pl.program_id(0)

        if shallow:
            # N <= UNROLL_MAX_NODES: the static-index pl.when ladder the
            # fixed-step SR fitness kernel uses (r2 A/B: 6.46e10 vs the
            # rolled eval's 4.05e10 at N=32 — dynamic row indexing costs
            # more than the skip saves on shallow tiles)
            def drift(x_tiles):
                def body(mi, _):
                    eval_shallow(
                        _RefRows(ops_ref, mi), _RefRows(c2_ref, mi),
                        _RefRows(const_ref, mi), x_tiles,
                        vals_scr, start_ref[0, mi, 0],
                    )
                    tree_scr[mi] = vals_scr[n - 1]
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        else:
            def drift(x_tiles):
                def body(mi, _):
                    eval_deep(
                        _RefRows(ops_ref, mi), _RefRows(const_ref, mi),
                        x_tiles, planes_scr, sp_scr, top_scr, ysel_scr,
                        start=start_ref[0, mi, 0],
                        depth_cap=lambda i, mi=mi: depth_ref[0, mi, i],
                    )
                    tree_scr[mi] = ysel_scr[...]
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]

        def y_copy(row, slot):
            return pltpu.make_async_copy(
                ys_ref.at[row, :, gi], y_scr.at[slot], ysem.at[slot]
            )

        def finite_tiles(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            return good

        def sq_err(x_tiles, slot):
            e = jnp.zeros((sub, LANE), jnp.float32)
            for mi in range(m):
                dlt = x_tiles[mi] - y_scr[slot, mi]
                e = e + dlt * dlt
            return e

        def rk_step(x, dt_c):
            """One embedded step; returns (x_hi tiles, err_norm tile,
            k_last tiles — the FSAL candidate for the next step's k1).
            Expression-for-expression the same arithmetic as
            integrate_adaptive's rk_step_{bosh3,dopri5}."""
            if method == "bosh3":
                k1 = ([k1_scr[i] for i in range(m)] if fsal else drift(x))
                k2 = drift([x[i] + 0.5 * dt_c * k1[i] for i in range(m)])
                k3 = drift([x[i] + 0.75 * dt_c * k2[i] for i in range(m)])
                x_hi = [
                    x[i] + dt_c * (_BS_A[2][0] * k1[i] + _BS_A[2][1] * k2[i]
                                   + _BS_A[2][2] * k3[i])
                    for i in range(m)
                ]
                k4 = drift(x_hi)
                x_lo = [
                    x[i] + dt_c * (_BS_B_LOW[0] * k1[i] + _BS_B_LOW[1] * k2[i]
                                   + _BS_B_LOW[2] * k3[i] + _BS_B_LOW[3] * k4[i])
                    for i in range(m)
                ]
                k_last = k4
            else:  # dopri5
                ks = [[k1_scr[i] for i in range(m)] if fsal else drift(x)]
                for ai in _DP_A:
                    xi = [
                        x[i] + dt_c * sum(a * k[i] for a, k in zip(ai, ks))
                        for i in range(m)
                    ]
                    ks.append(drift(xi))
                x_hi = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B5, ks))
                    for i in range(m)
                ]
                x_lo = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B4, ks))
                    for i in range(m)
                ]
                k_last = ks[6]
            acc = jnp.zeros((sub, LANE), jnp.float32)
            for i in range(m):
                scale = atol + rtol * jnp.maximum(jnp.abs(x[i]), jnp.abs(x_hi[i]))
                r = (x_hi[i] - x_lo[i]) / scale
                acc = acc + r * r
            err_norm = jnp.sqrt(acc * (1.0 / m))
            return x_hi, err_norm, k_last

        x = [x0_ref[mi, 0] for mi in range(m)]
        live_ref[...] = finite_tiles(x).astype(jnp.float32)
        for mi in range(m):
            x_ref[mi] = x[mi]
        if fsal and t_steps > 1:
            k1 = drift(x)  # the one up-front eval the FSAL carry amortizes
            for mi in range(m):
                k1_scr[mi] = k1[mi]
        y_copy(0, 0).start()
        if t_steps > 1:
            y_copy(1, 1).start()
        y_copy(0, 0).wait()
        err_ref[0] = sq_err(x, 0)
        steps_ref[0] = jnp.zeros((sub, LANE), jnp.float32)
        if not dt_reset:
            # diffrax PID semantics (mirrors integrate_adaptive): dt carries
            # across save intervals; seed at the first interval's span/4
            dt_scr[...] = jnp.zeros((sub, LANE), jnp.float32) + (
                (ts_ref[1] - ts_ref[0]) / 4.0 if t_steps > 1 else 1.0
            )

        def save_step(ti, _):
            y_copy(ti + 1, (ti + 1) % 2).wait()
            t0 = ts_ref[ti]
            t1 = ts_ref[ti + 1]
            span = t1 - t0
            zero = jnp.zeros((sub, LANE), jnp.float32)
            t_scr[...] = zero + t0
            if dt_reset:  # r1-r3 semantics (MTGP_ADAPTIVE_DT_RESET=1 A/B)
                dt_scr[...] = zero + span / 4.0
            else:
                # clamp the carried dt to this interval's bounds — the same
                # expression integrate_adaptive applies to its carry
                dt_scr[...] = jnp.clip(dt_scr[...], span * 1e-3, span)

            def step(_s, _c):
                t = t_scr[...]
                dt = dt_scr[...]
                alive = live_ref[...] > 0.5
                x = [x_ref[mi] for mi in range(m)]
                active = alive & (t < t1 - 1e-12)
                dt_c = jnp.minimum(dt, t1 - t)
                x_hi, err, k_last = rk_step(x, dt_c)
                ok = finite_tiles(x_hi) & jnp.isfinite(err)
                accept = active & ok & (err <= 1.0)
                for mi in range(m):
                    x_ref[mi] = jnp.where(accept, x_hi[mi], x[mi])
                if fsal:
                    # maintain k1_scr == drift(x_ref): x only moves on accept
                    for mi in range(m):
                        k1_scr[mi] = jnp.where(accept, k_last[mi], k1_scr[mi])
                t_scr[...] = jnp.where(accept, t + dt_c, t)
                # I controller: grow/shrink by err^(-1/order), clamped 0.2..5x
                factor = jnp.where(
                    jnp.isfinite(err) & (err > 0.0),
                    jnp.clip(safety * err ** err_exponent, 0.2, 5.0),
                    jnp.where(ok, 5.0, 0.2),
                )
                dt_scr[...] = jnp.where(
                    active, jnp.clip(dt_c * factor, span * 1e-3, span), dt
                )
                # a lane that produced NaN at minimum dt is dead
                live_ref[...] = (
                    alive & (ok | ~active | (dt_c > span * 1.5e-3))
                ).astype(jnp.float32)
                # per-LANE attempted-step telemetry: lane activity is a
                # prefix of the tile's iterations (a finished/dead lane never
                # reactivates), so the per-tile max over lanes equals the
                # tile's executed trip count, and the per-lane counts feed
                # the stiffness-probe lane sort (VERDICT r2 #6)
                steps_ref[0] = steps_ref[0] + active.astype(jnp.float32)
                return 0

            # data-dependent early exit: once every lane of the tile has
            # reached t1 (or died), remaining controller iterations are exact
            # no-ops (accept=False leaves x/t/dt/live untouched).
            #
            # MEASURED OUTCOME (r4, tools/mosaic_branch_probe.py /
            # results_r4/mosaic_branch_probe.txt): Mosaic PREDICATES
            # data-dependent control flow, it never skips — this pl.when
            # wrapper lands at 0.86x of always-execute (ideal skip would be
            # 0.12x), and all three alternatives (lax.while_loop, dynamic
            # fori bounds, predicated fori) measure 0.86-1.0x. The
            # vector-reduce-written SMEM predicate is lowered to per-spin
            # predication, so wall still scales with max_steps
            # (results_r4/adaptive_profile_fixed.txt: 692 ms at ms32 vs
            # 348 ms at ms16). The wrapper is KEPT for its measured ~14% and
            # because it is bit-exact by the no-op argument above; the real
            # fix for the fixed per-spin overhead is structural — fewer
            # total spins (the global-budget kernel below: one budget-long
            # loop instead of (T-1)*max_steps predicated spins).
            def w_body(s, _):
                @pl.when(go_scr[0] > 0)
                def _():
                    step(s, 0)
                    go_scr[0] = jnp.any(
                        (live_ref[...] > 0.5) & (t_scr[...] < t1 - 1e-12)
                    ).astype(jnp.int32)
                return 0

            go_scr[0] = jnp.any(
                (live_ref[...] > 0.5) & (t_scr[...] < t1 - 1e-12)
            ).astype(jnp.int32)
            jax.lax.fori_loop(0, max_steps, w_body, 0, unroll=False)
            # lanes that never reached t1 ran out of steps -> dead (max_steps)
            reached = t_scr[...] >= t1 - 1e-9 * jnp.maximum(jnp.abs(t1), 1.0)
            live_ref[...] = ((live_ref[...] > 0.5) & reached).astype(jnp.float32)
            err_ref[0] = err_ref[0] + sq_err(
                [x_ref[mi] for mi in range(m)], (ti + 1) % 2
            )

            @pl.when(ti + 2 <= t_steps - 1)
            def _():
                y_copy(ti + 2, ti % 2).start()
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        alive_ref[0] = live_ref[...]

    return kernel


def adaptive_rollout_available(fset: FunctionSet, trees: TreeTensors,
                               d: int) -> bool:
    n = trees.max_nodes
    m = trees.batch_shape[-1]
    return (
        tpu_kernels_available()
        and n <= DEEP_MAX_NODES
        # VMEM cap at 4 KB/row (8 sublanes): 2 tree streams + the stack
        # plane scratch within 10 MB — admits m=3 (Lorenz) at N=256, which
        # the 3-stream-era m*n <= 512 cap rejected
        and (2 * m * n + stack_planes(n)) <= 2560
        and m == d  # m == state dim (SR semantics)
    )


def adaptive_global_available(fset: FunctionSet, trees: TreeTensors, d: int,
                              t_steps: int) -> bool:
    """VMEM gate for :func:`rollout_sr_fitness_adaptive_global_pallas` — the
    per-interval gate plus the global kernel's extra residents: the FULL
    ground-truth block ``(t_steps, d, 1, sub, LANE)`` (the per-interval twin
    double-buffers 2 rows of it) and the save-state accounting tiles. Rows
    are 4 KB (8 sublanes x 128 lanes x f32); budget 10 MB = 2560 rows."""
    n = trees.max_nodes
    m = trees.batch_shape[-1]
    rows = (
        2 * m * n                      # op + const tree streams
        + max(n, stack_planes(n))      # eval scratch (ladder or stack)
        + (t_steps + 1) * d            # resident ys + x0
        + 8 * m + 16                   # x/tree/k1 scratch + control tiles
    )
    return adaptive_rollout_available(fset, trees, d) and rows <= 2560


def rollout_sr_fitness_adaptive_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    max_steps: int = 32,
    method: str = "bosh3",
    safety: float = 0.9,
):
    """Fused adaptive rollout + in-kernel MSE: ``(mse (P, B), alive (P, B))``.

    The adaptive twin of :func:`rollout_sr_fitness_pallas` for the notebooks'
    Dopri5(+PID) / Bosh3 configurations (``SR_evaluator.py:76-79``): embedded
    RK pair with per-lane ``(t, dt)`` step control entirely in register
    tiles, semantics of ``integrators.integrate_adaptive`` (accept/reject
    masks, controller clamps, max-steps death). ``ts`` may be traced and
    non-uniform (streamed via SMEM). Differentiable via unfused
    ``integrate_adaptive`` recompute.

    Lane tiling: a tile steps while ANY of its lanes is active, so tile
    composition sets the attempted-step waste. ``MTGP_ADAPTIVE_SORT=probe``
    replaces the default size sort with a stiffness probe — the first two
    save intervals are integrated once (~2/(T-1) of the work) and candidates
    are re-sorted by their measured per-lane attempted steps, clustering
    stiff candidates into the same tiles (VERDICT r2 #6). Bit-exact per
    lane: results are inverse-permuted, lanes are independent."""
    import os

    import numpy as np

    probe = os.environ.get("MTGP_ADAPTIVE_SORT") == "probe"

    @jax.custom_vjp
    def run(ops, c1, c2, const, x0):
        trees = TreeTensors(ops, c1, c2, const)
        order = None
        if probe and ts.shape[0] > 2:
            k = 2  # probe horizon: first two save intervals
            _, _, (_tile_steps, lane_steps) = _adaptive_fitness_impl(
                trees, x0, ts[: k + 1], ys[:, : k + 1], fset, rtol, atol,
                max_steps, method, safety, return_steps="lane",
            )
            order = jnp.argsort(jnp.sum(lane_steps, axis=1))
        return _adaptive_fitness_impl(
            trees, x0, ts, ys, fset, rtol, atol,
            max_steps, method, safety, order=order,
        )

    def fwd(ops, c1, c2, const, x0):
        return run(ops, c1, c2, const, x0), (ops, c1, c2, const, x0)

    def bwd(res, g):
        ops, c1, c2, const, x0 = res
        g_mse, _g_alive = g

        def unfused(c, x0_):
            from ..models.integrators import integrate_adaptive
            from .interpreter import evaluate_trees

            t = TreeTensors(ops, c1, c2, c)[:, None]

            def drift(tt, x):
                return evaluate_trees(t, x[:, :, None, :], fset, impl="pallas")

            xs, _ = integrate_adaptive(
                drift, x0_, ts, rtol=rtol, atol=atol,
                max_steps_per_interval=max_steps, method=method,
                safety=safety,
            )
            err = xs - jnp.transpose(ys, (1, 0, 2))[:, None, :, :]
            return jnp.mean(jnp.sum(jnp.square(err), axis=-1), axis=0)

        _, vjp = jax.vjp(unfused, const, x0)
        dconst, dx0 = vjp(g_mse)
        zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return zero(ops), zero(c1), zero(c2), dconst, dx0

    run.defvjp(fwd, bwd)
    return run(trees.ops, trees.c1, trees.c2, trees.const, x0)


def adaptive_solver_stats(trees, x0, ts, ys, fset, rtol=1e-4, atol=1e-6,
                          max_steps=32, method="bosh3", safety=0.9):
    """Controller-effort telemetry for the fused adaptive kernel: returns
    ``(mse, alive, steps)`` where ``steps`` is the per-lane-tile count of
    ATTEMPTED embedded steps (accepted + rejected, summed over the save
    grid) — the whole tile executes a step while any of its lanes is
    active, so ``sum(steps) * stages * m * max_nodes * tile_lanes`` is the
    work the chip actually performed. Mirrors ``diffrax``'s solver stats
    (``num_steps``), which the reference discards; the bench uses it to
    count adaptive node-evals honestly instead of assuming the 4-step
    minimum. Honors ``MTGP_ADAPTIVE_SORT=probe`` (same lane ordering as the
    fused fitness path, so the counted work matches the timed work — probe
    intervals included). Not differentiable (use
    ``rollout_sr_fitness_adaptive_pallas`` for gradients)."""
    import os

    order = None
    extra_steps = 0.0
    if os.environ.get("MTGP_ADAPTIVE_SORT") == "probe" and ts.shape[0] > 2:
        k = 2
        _, _, (probe_tile_steps, lane_steps) = _adaptive_fitness_impl(
            trees, x0, ts[: k + 1], ys[:, : k + 1], fset, rtol, atol,
            max_steps, method, safety, return_steps="lane",
        )
        extra_steps = jnp.sum(probe_tile_steps)
        order = jnp.argsort(jnp.sum(lane_steps, axis=1))
    mse, alive, steps = _adaptive_fitness_impl(
        trees, x0, ts, ys, fset, rtol, atol, max_steps, method, safety,
        return_steps=True, order=order,
    )
    # the probe's own attempted steps are real chip work: fold them in
    return mse, alive, steps + extra_steps / steps.shape[0]


def _adaptive_fitness_impl(trees, x0, ts, ys, fset, rtol, atol, max_steps,
                           method, safety, return_steps=False, order=None):
    p, b, d = x0.shape
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    t_steps = ts.shape[0]

    sub = SUBLANES_DEEP
    tile = sub * LANE

    if order is None:
        trees, order, inv_order = size_sort_candidates(trees, fset.slots)
    else:
        # caller-supplied lane order (stiffness probe): cluster candidates
        # by expected controller effort so a tile's lanes finish together
        inv_order = jnp.argsort(order)
        trees = trees[order]
    x0 = x0[order]

    (ops_l, c2_l, const_l, x0_l), (lanes, pad, lp, grid) = _lane_layout(
        trees, x0, sub
    )

    y = jnp.moveaxis(jnp.asarray(ys, jnp.float32), 1, 0)  # (T, B, d)
    ys_l = _lane_rows(y, p, b, lanes, pad, grid, sub)

    row_trips, start_rows = deep_tile_scalars(
        trees, fset.slots, b, tile, grid, lp
    )

    # shallow drift eval (static-index pl.when ladder) vs the rolled stack
    # machine: the ladder won the r2 fixed-step A/B at N <= UNROLL_MAX_NODES;
    # MTGP_ADAPTIVE_EVAL=stack|ladder overrides the gate for hardware A/Bs
    import os as _os

    _ev = _os.environ.get("MTGP_ADAPTIVE_EVAL", "auto")
    from .pallas_interpreter import UNROLL_MAX_NODES as _UNROLL_N

    shallow = (_ev == "ladder" or (_ev == "auto" and n <= _UNROLL_N))

    kernel = _make_adaptive_fitness_kernel(
        fset, n, m, t_steps, max_steps, rtol, atol, safety, method, sub,
        shallow=shallow,
    )
    tree_spec = pl.BlockSpec(
        (m, n, 1, sub, LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    lane_out = pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem_scalar = pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM)
    smem_rows = pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)

    eval_scratch = (
        [pltpu.VMEM((n, sub, LANE), jnp.float32)]  # vals_scr (ladder planes)
        if shallow else
        [pltpu.VMEM((stack_planes(n), sub, LANE), jnp.float32),  # planes
         pltpu.VMEM((sub, LANE), jnp.int32),  # sp_scr
         pltpu.VMEM((sub, LANE), jnp.float32),  # top_scr
         pltpu.VMEM((sub, LANE), jnp.float32)]  # ysel_scr
    )
    err, alive, steps = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=(
            [tree_spec] + ([tree_spec] if shallow else []) + [tree_spec]
            + [
                pl.BlockSpec((d, 1, sub, LANE), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # ts (T,)
                pl.BlockSpec(memory_space=pl.ANY),  # ys rows stream via DMA
                smem_rows,  # per-row ladder-trip counts
                smem_scalar,  # first-used-row starts
            ]
        ),
        out_specs=(lane_out, lane_out, lane_out),
        out_shape=(
            jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),  # steps
        ),
        scratch_shapes=[
            pltpu.VMEM((m, sub, LANE), jnp.float32),  # x_ref
            pltpu.VMEM((sub, LANE), jnp.float32),  # live_ref
            pltpu.VMEM((sub, LANE), jnp.float32),  # t_scr
            pltpu.VMEM((sub, LANE), jnp.float32),  # dt_scr
            pltpu.VMEM((2, d, sub, LANE), jnp.float32),  # y staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((m, sub, LANE), jnp.float32),  # tree_scr
        ] + eval_scratch + [
            pltpu.VMEM((m, sub, LANE), jnp.float32),  # k1_scr (FSAL carry)
            pltpu.SMEM((1,), jnp.int32),  # go_scr (early-exit scalar)
        ],
    )(*([ops_l] + ([c2_l] if shallow else []) + [const_l, x0_l,
        jnp.asarray(ts, jnp.float32), ys_l, row_trips, start_rows]))

    mse = (err.reshape(lp)[:lanes] / t_steps).reshape(p, b)
    alive_last = alive.reshape(lp)[:lanes].reshape(p, b) > 0.5
    mse = mse[inv_order]
    alive_last = alive_last[inv_order]
    if return_steps == "lane":
        # (per-tile executed trips, per-lane attempted counts in the
        # CALLER's candidate order) — tile counts feed honest work
        # accounting, lane counts are the stiffness-probe sort key
        lane_steps = steps.reshape(lp)[:lanes].reshape(p, b)[inv_order]
        return mse, alive_last, (steps.max(axis=(1, 2)), lane_steps)
    if return_steps:
        # per-tile attempted embedded steps (max over lanes == the tile's
        # executed trip count): the honest controller-effort count for
        # benchmarking
        return mse, alive_last, steps.max(axis=(1, 2))
    return mse, alive_last


# ----------------------------------------------- adaptive (PID), GLOBAL budget
#
# The reference's diffrax configuration budgets the WHOLE SOLVE, not each
# save interval: ``diffeqsolve(..., max_steps=500)`` with 100 save points
# (``SR_evaluator.py:76-79``) — a lane fails when its TOTAL attempted steps
# exceed 500. The per-interval kernel above spends (T-1) * max_steps
# predicated spins per tile (the r4 Mosaic probe showed data-dependent
# control flow never skips, `tools/mosaic_branch_probe.py`), i.e. 1568 at
# the bench shape where the reference's own budget implies ~500. This twin
# restructures the solve as ONE loop over the global budget with a per-lane
# save INDEX: lanes cross save boundaries asynchronously, the full
# ground-truth block sits resident in VMEM, and the spin count is the
# reference's budget by construction (~3x fewer predicated spins).
#
# Per-lane trajectories are BIT-IDENTICAL to the per-interval kernel
# whenever neither budget binds (same seed dt, same controller clamps with
# the lane's current interval span, save times snapped to the SMEM ts
# values); the budgets differ only in WHICH lanes they kill: per-interval
# kills a lane that spends > max_steps inside one interval, global kills
# when the running total crosses the budget (diffrax semantics).
# Engages on CONCRETE ts grids (the ts ladder is indexed per lane).


def _make_adaptive_global_kernel(fset: FunctionSet, n: int, m: int,
                                 t_steps: int, budget: int, rtol: float,
                                 atol: float, safety: float, method: str,
                                 sub: int, shallow: bool):
    from ..models.integrators import _BS_A, _BS_B_LOW, _DP_A, _DP_B4, _DP_B5

    import os

    if method not in ("bosh3", "dopri5"):
        raise ValueError(f"unknown adaptive method: {method!r}")
    err_exponent = -1.0 / 3.0 if method == "bosh3" else -0.2
    fsal = (os.environ.get("MTGP_ADAPTIVE_NO_FSAL") != "1"
            and os.environ.get("MTGP_ADAPTIVE_FSAL", "1") == "1")
    if shallow:
        eval_shallow = _make_sr_tree_eval_when(fset, n, sub)
    else:
        eval_deep = _make_deep_tree_eval(fset, n, sub)

    def kernel(*refs):
        if shallow:
            (ops_ref, c2_ref, const_ref, x0_ref, ts_ref, ys_ref, depth_ref,
             start_ref, err_ref, alive_ref, steps_ref, x_ref, live_ref,
             t_scr, dt_scr, idx_scr, tree_scr, vals_scr, k1_scr) = refs
        else:
            (ops_ref, const_ref, x0_ref, ts_ref, ys_ref, depth_ref,
             start_ref, err_ref, alive_ref, steps_ref, x_ref, live_ref,
             t_scr, dt_scr, idx_scr, tree_scr, planes_scr, sp_scr,
             top_scr, ysel_scr, k1_scr) = refs

        if shallow:
            def drift(x_tiles):
                def body(mi, _):
                    eval_shallow(
                        _RefRows(ops_ref, mi), _RefRows(c2_ref, mi),
                        _RefRows(const_ref, mi), x_tiles,
                        vals_scr, start_ref[0, mi, 0],
                    )
                    tree_scr[mi] = vals_scr[n - 1]
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]
        else:
            def drift(x_tiles):
                def body(mi, _):
                    eval_deep(
                        _RefRows(ops_ref, mi), _RefRows(const_ref, mi),
                        x_tiles, planes_scr, sp_scr, top_scr, ysel_scr,
                        start=start_ref[0, mi, 0],
                        depth_cap=lambda i, mi=mi: depth_ref[0, mi, i],
                    )
                    tree_scr[mi] = ysel_scr[...]
                    return 0

                jax.lax.fori_loop(0, m, body, 0)
                return [tree_scr[mi] for mi in range(m)]

        def finite_tiles(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            return good

        def sq_err_at(k):
            e = jnp.zeros((sub, LANE), jnp.float32)
            for mi in range(m):
                dlt = x_ref[mi] - ys_ref[k, mi, 0]
                e = e + dlt * dlt
            return e

        def rk_step(x, dt_c):
            # expression-for-expression the per-interval kernel's rk_step
            if method == "bosh3":
                k1 = ([k1_scr[i] for i in range(m)] if fsal else drift(x))
                k2 = drift([x[i] + 0.5 * dt_c * k1[i] for i in range(m)])
                k3 = drift([x[i] + 0.75 * dt_c * k2[i] for i in range(m)])
                x_hi = [
                    x[i] + dt_c * (_BS_A[2][0] * k1[i] + _BS_A[2][1] * k2[i]
                                   + _BS_A[2][2] * k3[i])
                    for i in range(m)
                ]
                k4 = drift(x_hi)
                x_lo = [
                    x[i] + dt_c * (_BS_B_LOW[0] * k1[i] + _BS_B_LOW[1] * k2[i]
                                   + _BS_B_LOW[2] * k3[i] + _BS_B_LOW[3] * k4[i])
                    for i in range(m)
                ]
                k_last = k4
            else:
                ks = [[k1_scr[i] for i in range(m)] if fsal else drift(x)]
                for ai in _DP_A:
                    xi = [
                        x[i] + dt_c * sum(a * k[i] for a, k in zip(ai, ks))
                        for i in range(m)
                    ]
                    ks.append(drift(xi))
                x_hi = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B5, ks))
                    for i in range(m)
                ]
                x_lo = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B4, ks))
                    for i in range(m)
                ]
                k_last = ks[6]
            acc = jnp.zeros((sub, LANE), jnp.float32)
            for i in range(m):
                scale = atol + rtol * jnp.maximum(jnp.abs(x[i]), jnp.abs(x_hi[i]))
                r = (x_hi[i] - x_lo[i]) / scale
                acc = acc + r * r
            err_norm = jnp.sqrt(acc * (1.0 / m))
            return x_hi, err_norm, k_last

        def ts_ladder(idx_t, lo):
            """ts[idx_t] per lane via a select ladder (idx_t clamped by
            construction to [lo, T-1]); arange ts values are NOT multiples
            of dt in f32, so the SMEM values are authoritative."""
            v = jnp.zeros((sub, LANE), jnp.float32) + ts_ref[lo]
            for k in range(lo + 1, t_steps):
                v = jnp.where(idx_t == k, ts_ref[k], v)
            return v

        x = [x0_ref[mi, 0] for mi in range(m)]
        live_ref[...] = finite_tiles(x).astype(jnp.float32)
        for mi in range(m):
            x_ref[mi] = x[mi]
        if fsal and t_steps > 1:
            k1 = drift(x)
            for mi in range(m):
                k1_scr[mi] = k1[mi]
        err_ref[0] = sq_err_at(0)
        steps_ref[0] = jnp.zeros((sub, LANE), jnp.float32)
        zero = jnp.zeros((sub, LANE), jnp.float32)
        izero = jnp.zeros((sub, LANE), jnp.int32)
        t_scr[...] = zero + ts_ref[0]
        idx_scr[...] = izero
        dt_scr[...] = zero + (
            (ts_ref[1] - ts_ref[0]) / 4.0 if t_steps > 1 else 1.0
        )

        last = t_steps - 1

        def spin(_s, _c):
            idx = idx_scr[...]
            not_done = idx < last
            alive = live_ref[...] > 0.5
            active = alive & not_done
            t = t_scr[...]
            dt = dt_scr[...]
            idx0 = jnp.minimum(idx, last - 1)     # current interval start
            t0l = ts_ladder(idx0, 0)
            t1l = ts_ladder(idx0 + 1, 1)
            span = t1l - t0l
            x = [x_ref[mi] for mi in range(m)]
            dt_c = jnp.minimum(dt, t1l - t)
            x_hi, err, k_last = rk_step(x, dt_c)
            ok = finite_tiles(x_hi) & jnp.isfinite(err)
            accept = active & ok & (err <= 1.0)
            for mi in range(m):
                x_ref[mi] = jnp.where(accept, x_hi[mi], x[mi])
            if fsal:
                for mi in range(m):
                    k1_scr[mi] = jnp.where(accept, k_last[mi], k1_scr[mi])
            # the per-interval kernel's ACTIVE test is t < t1 - 1e-12: a
            # lane stays in its interval (micro-stepping dt_c = t1 - t)
            # until t passes that threshold, so crossing uses the same
            # constant — NOT the looser end-of-interval reached test
            t_new = jnp.where(accept, t + dt_c, t)
            crossed = accept & (t_new >= t1l - 1e-12)
            # snap to the save time: the per-interval kernel re-reads ts at
            # every interval entry, so exactness requires the same value
            t_scr[...] = jnp.where(crossed, t1l, t_new)
            factor = jnp.where(
                jnp.isfinite(err) & (err > 0.0),
                jnp.clip(safety * err ** err_exponent, 0.2, 5.0),
                jnp.where(ok, 5.0, 0.2),
            )
            dt_n = jnp.where(
                active, jnp.clip(dt_c * factor, span * 1e-3, span), dt
            )
            # interval-entry clamp with the NEW interval's span (the
            # per-interval kernel applies it at the top of each interval).
            # n_t0 needs no ladder: a non-crossed lane keeps t0l, a crossed
            # lane's new interval starts at t1l (at idx == last-1 the values
            # differ from a fresh ladder, but such lanes fail the
            # idx_n < last gate below, so the clamp result is unselected —
            # outputs bit-identical).
            idx_n = idx + crossed.astype(jnp.int32)
            nxt0 = jnp.minimum(idx_n, last - 1)
            n_t0 = jnp.where(crossed, t1l, t0l)
            n_t1 = ts_ladder(nxt0 + 1, 1)
            n_span = n_t1 - n_t0
            dt_scr[...] = jnp.where(
                crossed & (idx_n < last),
                jnp.clip(dt_n, n_span * 1e-3, n_span), dt_n,
            )
            live_ref[...] = (
                alive & (ok | ~active | (dt_c > span * 1.5e-3))
            ).astype(jnp.float32)
            steps_ref[0] = steps_ref[0] + active.astype(jnp.float32)
            # save-point MSE accumulation for lanes that just crossed:
            # select the crossing lane's ground-truth ROW first (one
            # m-stream ladder), then ONE sq_err — instead of evaluating a
            # full sq_err_at(k) inside every rung (O(T*m) multiply-adds per
            # spin -> O(T*m) selects + one sq_err). Bit-exact: a crossed
            # lane has exactly one k == idx_n, its selected row IS ys[k],
            # so the addend's fp expression is unchanged.
            ysel = [jnp.zeros((sub, LANE), jnp.float32) for _ in range(m)]
            for k in range(1, t_steps):
                sel_k = idx_n == k
                for mi in range(m):
                    ysel[mi] = jnp.where(sel_k, ys_ref[k, mi, 0], ysel[mi])
            e = jnp.zeros((sub, LANE), jnp.float32)
            for mi in range(m):
                dlt = x_ref[mi] - ysel[mi]
                e = e + dlt * dlt
            err_ref[0] = jnp.where(crossed, err_ref[0] + e, err_ref[0])
            idx_scr[...] = idx_n
            return 0

        jax.lax.fori_loop(0, budget, spin, 0, unroll=False)
        # diffrax max_steps semantics: a lane that has not produced every
        # save when the budget ends is a failed solve
        alive_ref[0] = (
            (live_ref[...] > 0.5) & (idx_scr[...] >= last)
        ).astype(jnp.float32)

    return kernel


def rollout_sr_fitness_adaptive_global_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    ys: Array,
    fset: FunctionSet,
    rtol: float = 1e-4,
    atol: float = 1e-6,
    budget: int = 500,
    method: str = "dopri5",
    safety: float = 0.9,
    return_steps: bool = False,
):
    """Global-budget twin of :func:`rollout_sr_fitness_adaptive_pallas`:
    ``diffeqsolve(..., max_steps=budget)`` semantics (`SR_evaluator.py:76-79`
    budgets the whole solve at 500, not each interval). Returns
    ``(mse (P, B), alive (P, B))`` (+ per-tile attempted steps with
    ``return_steps``, which is NOT differentiable — telemetry only, single
    launch). Requires a CONCRETE ``ts``.

    Differentiable via unfused ``integrate_adaptive`` recompute with
    ``max_steps_per_interval = budget // (T-1)`` — a per-interval
    APPROXIMATION of the forward's global budget: gradients are exact only
    for lanes whose budgets never bind (the common case; budget-killed lanes
    are dead and masked out of the fitness anyway).

    VMEM: keeps the whole ground-truth block resident
    (``(T, d, 1, sub, LANE)`` f32); callers must gate on
    :func:`adaptive_global_available` — long-horizon grids over the 10 MB
    row budget raise ``ValueError`` here rather than failing in Mosaic."""
    import numpy as np

    p, b, d = x0.shape
    if not adaptive_global_available(fset, trees, d, int(ts.shape[0])):
        raise ValueError(
            "global-budget adaptive kernel over the VMEM row budget "
            f"(T={int(ts.shape[0])}, d={d}, n={trees.max_nodes}); use "
            "rollout_sr_fitness_adaptive_pallas (per-interval, double-"
            "buffered ys) instead"
        )
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    t_steps = int(ts.shape[0])
    sub = SUBLANES_DEEP

    def impl(trees, x0):
        trees_s, order, inv_order = size_sort_candidates(trees, fset.slots)
        x0_s = x0[order]
        (ops_l, c2_l, const_l, x0_l), (lanes, pad, lp, grid) = _lane_layout(
            trees_s, x0_s, sub
        )
        y = jnp.moveaxis(jnp.asarray(ys, jnp.float32), 1, 0)  # (T, B, d)
        ys_l = _lane_rows(y, p, b, lanes, pad, grid, sub)
        row_trips, start_rows = deep_tile_scalars(
            trees_s, fset.slots, b, sub * LANE, grid, lp
        )

        import os as _os

        _ev = _os.environ.get("MTGP_ADAPTIVE_EVAL", "auto")
        from .pallas_interpreter import UNROLL_MAX_NODES as _UNROLL_N

        shallow = (_ev == "ladder" or (_ev == "auto" and n <= _UNROLL_N))

        kernel = _make_adaptive_global_kernel(
            fset, n, m, t_steps, budget, rtol, atol, safety, method, sub,
            shallow,
        )
        tree_spec = pl.BlockSpec(
            (m, n, 1, sub, LANE), lambda i: (0, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        lane_out = pl.BlockSpec((1, sub, LANE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        smem_scalar = pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.SMEM)
        smem_rows = pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM)
        eval_scratch = (
            [pltpu.VMEM((n, sub, LANE), jnp.float32)]
            if shallow else
            [pltpu.VMEM((stack_planes(n), sub, LANE), jnp.float32),
             pltpu.VMEM((sub, LANE), jnp.int32),
             pltpu.VMEM((sub, LANE), jnp.float32),
             pltpu.VMEM((sub, LANE), jnp.float32)]
        )
        err, alive, steps = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=(
                [tree_spec] + ([tree_spec] if shallow else []) + [tree_spec]
                + [
                    pl.BlockSpec((d, 1, sub, LANE), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),  # ts (T,)
                    pl.BlockSpec((t_steps, d, 1, sub, LANE),
                                 lambda i: (0, 0, i, 0, 0),
                                 memory_space=pltpu.VMEM),  # ys resident
                    smem_rows,
                    smem_scalar,
                ]
            ),
            out_specs=(lane_out, lane_out, lane_out),
            out_shape=(
                jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
                jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
                jax.ShapeDtypeStruct((grid, sub, LANE), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((m, sub, LANE), jnp.float32),  # x_ref
                pltpu.VMEM((sub, LANE), jnp.float32),  # live_ref
                pltpu.VMEM((sub, LANE), jnp.float32),  # t_scr
                pltpu.VMEM((sub, LANE), jnp.float32),  # dt_scr
                pltpu.VMEM((sub, LANE), jnp.int32),  # idx_scr
                pltpu.VMEM((m, sub, LANE), jnp.float32),  # tree_scr
            ] + eval_scratch + [
                pltpu.VMEM((m, sub, LANE), jnp.float32),  # k1_scr
            ],
        )(*([ops_l] + ([c2_l] if shallow else []) + [const_l, x0_l,
            jnp.asarray(ts, jnp.float32), ys_l, row_trips, start_rows]))
        mse = (err.reshape(lp)[:lanes] / t_steps).reshape(p, b)[inv_order]
        alive_l = (alive.reshape(lp)[:lanes].reshape(p, b) > 0.5)[inv_order]
        return mse, alive_l, steps.max(axis=(1, 2))

    @jax.custom_vjp
    def run(ops, c1, c2, const, x0):
        mse, alive, _ = impl(TreeTensors(ops, c1, c2, const), x0)
        return mse, alive

    def fwd(ops, c1, c2, const, x0):
        return run(ops, c1, c2, const, x0), (ops, c1, c2, const, x0)

    def bwd(res, g):
        ops, c1, c2, const, x0 = res
        g_mse, _g_alive = g

        def unfused(c, x0_):
            from ..models.integrators import integrate_adaptive
            from .interpreter import evaluate_trees

            t = TreeTensors(ops, c1, c2, c)[:, None]

            def drift(tt, x):
                return evaluate_trees(t, x[:, :, None, :], fset, impl="pallas")

            xs, _ = integrate_adaptive(
                drift, x0_, ts, rtol=rtol, atol=atol,
                max_steps_per_interval=max(budget // max(t_steps - 1, 1), 4),
                method=method, safety=safety,
            )
            err = xs - jnp.transpose(ys, (1, 0, 2))[:, None, :, :]
            return jnp.mean(jnp.sum(jnp.square(err), axis=-1), axis=0)

        _, vjp = jax.vjp(unfused, const, x0)
        dconst, dx0 = vjp(g_mse)
        zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return zero(ops), zero(c1), zero(c2), dconst, dx0

    run.defvjp(fwd, bwd)
    if return_steps:
        # telemetry path: ONE kernel launch, not differentiable (mirrors
        # adaptive_solver_stats for the per-interval twin)
        return impl(trees, x0)
    return run(trees.ops, trees.c1, trees.c2, trees.const, x0)
