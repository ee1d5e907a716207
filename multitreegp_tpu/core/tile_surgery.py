"""Lane-parallel tree surgery on (N, L) tiles — the reproduction kernel's core.

Layout: a *tile* stacks L independent trees as lanes; rows are node rows in
the usual root-last / padding-first order (:mod:`trees`). Every function here
is pure jnp on whole tiles — no refs, no pallas imports — so the exact same
code runs (a) inside the Pallas reproduction kernel on TPU tiles and (b) on
CPU in tests, where outputs are checked row-for-row against the per-tree
:mod:`ops.splice` / :mod:`ops.mutation` / :mod:`ops.crossover` implementations.

Two deliberate representation deltas from the XLA ops make this kernel-shaped
(SURVEY.md §7 design deltas 1-2):

* only ``(ops, const)`` are carried — child pointers are redundant for
  root-last/children-first trees and are rebuilt once at the end from opcode
  arities (:func:`trees.rebuild_pointers`), so surgery never fixes pointers;
* all per-lane dynamic row movement is dense VPU work instead of XLA
  gathers — structural moves are log2(N)-stage cyclic shifts
  (:func:`shift_rows`), point reads are masked reduces (:func:`row_at`),
  categorical draws are Gumbel-argmax ladders — which is what makes the
  fused kernel fast where the vmapped-``lax.switch`` XLA reproduce path is
  launch/gather-bound (measured 540 ms/generation at pop 4096; see
  ``ops/pallas_evolve.py``).

Randomness is injected: every sampling function takes ``urand(rows) ->
(rows, L) float32 in [0, 1)``. The Pallas kernel feeds it from
``pltpu.prng_random_bits``; CPU tests feed it from ``jax.random``. Categorical
draws use the Gumbel trick, which realises exactly the law of the reference's
``jr.choice(p=weights)`` (weights need not be normalised).

Behavioural spec mirrored from the reference (file:line cited per function):
``MultiTreeGP/genetic_operators/{crossover,mutation,initialization}.py``.
"""
from __future__ import annotations

from typing import Callable, List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from .trees import CONST, EMPTY, OP_START

Rand = Callable[[int], Array]  # urand(rows) -> (rows, L) f32 in [0, 1)

# NOTE: no module/trace-level jnp array constants anywhere in this file —
# pallas kernels reject captured constants, so every table is rebuilt from
# broadcasted_iota + python-float immediates.
_NEG = -1e30


class SurgeryConfig(NamedTuple):
    """Static tables shared by all tile surgery (host numpy, baked into jit)."""

    n: int  # max_nodes
    var_start: int
    num_vars: int
    slots: np.ndarray  # (num_opcodes,) arity by opcode
    operator_probs: np.ndarray  # (K,) unnormalised sampling weights
    coefficient_sd: float
    max_init_depth: int
    cx_retries: int = 8
    mut_retries: int = 8


def make_config(fset, max_nodes: int, max_init_depth: int, coefficient_sd: float = 1.0) -> SurgeryConfig:
    return SurgeryConfig(
        n=max_nodes,
        var_start=fset.var_start,
        num_vars=fset.num_variables,
        slots=np.asarray(fset.slots),
        operator_probs=np.asarray(fset.operator_probs, np.float32),
        coefficient_sd=float(coefficient_sd),
        max_init_depth=int(max_init_depth),
    )


# --------------------------------------------------------------------- basics


def rows_iota(n: int, l: int) -> Array:
    return jax.lax.broadcasted_iota(jnp.int32, (n, l), 0)


def arity_tile(ops: Array, cfg: SurgeryConfig) -> Array:
    """Per-row arity; ladder over the (small) static opcode table."""
    ar = jnp.zeros_like(ops)
    for code in range(OP_START, cfg.var_start):
        a = int(cfg.slots[code])
        if a:
            ar = jnp.where(ops == code, jnp.int32(a), ar)
    return ar


def sizes_tile(ops: Array) -> Array:
    """(1, L) non-empty row count per lane."""
    return jnp.sum((ops != EMPTY).astype(jnp.int32), axis=0, keepdims=True)


def csum_w(ops: Array, cfg: SurgeryConfig) -> Array:
    """Inclusive cumsum over rows of w = 1 - arity, as f32 matmul (MXU).

    csum[j, l] = sum_{i <= j} (1 - arity[i, l]); the substrate of all span
    computations (``trees.subtree_spans`` docstring derives the formula).
    """
    n = ops.shape[0]
    w = (1 - arity_tile(ops, cfg)).astype(jnp.float32)
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (ri >= ci).astype(jnp.float32)
    return jax.lax.dot_general(
        tri, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)


def row_at(tile: Array, idx: Array) -> Array:
    """(1, L) value of per-lane row ``idx`` ((1, L) int32): one masked reduce."""
    n, l = tile.shape
    ri = rows_iota(n, l)
    return jnp.sum(jnp.where(ri == idx, tile, jnp.zeros_like(tile)), axis=0, keepdims=True)


def span_at(ops: Array, idx: Array, cfg: SurgeryConfig, csum: Array | None = None) -> Array:
    """(1, L) subtree size rooted at per-lane row ``idx``.

    Same closed form as ``trees.subtree_span_at``: bottom(idx) = max k <= idx
    with csum[idx] - csum[k-1] == 1.
    """
    n, l = ops.shape
    if csum is None:
        csum = csum_w(ops, cfg)
    ri = rows_iota(n, l)
    c_at = row_at(csum, idx)  # (1, L)
    w = (1 - arity_tile(ops, cfg)).astype(jnp.int32)
    csum_excl = csum - w  # csum[k-1] aligned at row k
    valid = (c_at - csum_excl == 1) & (ri <= idx)
    k = jnp.max(jnp.where(valid, ri, -1), axis=0, keepdims=True)
    return (idx - k + 1).astype(jnp.int32)


def shift_rows(tile: Array, delta: Array, valid: Array, fill) -> Array:
    """out[j, l] = tile[j + delta[l], l] where valid and in-range else fill.

    Every structural move in the surgery is a ROW-RANGE SHIFT: ``delta`` is
    constant down each lane (a subtree extraction/splice/composition moves a
    contiguous block by one per-lane offset). That makes an O(N) per-row
    select ladder unnecessary — a cyclic shift by ``delta`` decomposes into
    log2(N) static roll stages (slice+concat, which Mosaic lowers as sublane
    copies), each applied per lane where the corresponding bit of
    ``delta mod N`` is set. Out-of-range sources (which the cyclic roll
    would wrap) are masked to ``fill``.
    """
    n, l = tile.shape
    ri = rows_iota(n, l)
    delta = jnp.broadcast_to(jnp.asarray(delta, jnp.int32), (1, l))
    src = ri + delta
    ok = valid & (src >= 0) & (src < n)
    s = jnp.mod(delta, n)  # cyclic amount, [0, n)
    x = tile
    k = 1
    while k < n:
        bit = (s // k) % 2 == 1  # (1, L): apply this stage's roll per lane
        rolled = jnp.concatenate([x[k:], x[:k]], axis=0)
        x = jnp.where(bit, rolled, x)
        k *= 2
    return jnp.where(ok, x, jnp.full_like(tile, fill))


# ------------------------------------------------------- structural primitives


def extract_block(
    ops: Array, const: Array, idx: Array, span: Array
) -> Tuple[Array, Array]:
    """Pull the subtree at per-lane row ``idx`` into a root-last block
    (semantics of ``ops.splice.extract_subtree`` minus pointers)."""
    n, l = ops.shape
    ri = rows_iota(n, l)
    valid = ri > (n - 1 - span)
    delta = idx - (n - 1)
    return (
        shift_rows(ops, delta, valid, EMPTY),
        shift_rows(const, delta, valid, 0.0),
    )


def splice_tiles(
    ops: Array,
    const: Array,
    idx: Array,
    old_size: Array,
    b_ops: Array,
    b_const: Array,
    bs: Array,
) -> Tuple[Array, Array]:
    """Replace the subtree at ``idx`` (``old_size`` rows) with the block
    (``bs`` rows) — ``ops.splice.splice`` on tiles, minus pointer fixups."""
    n, l = ops.shape
    ri = rows_iota(n, l)
    delta = bs - old_size
    in_above = ri > idx
    in_block = (ri > idx - bs) & ~in_above

    below_valid = (ri + delta <= idx - old_size) & ~in_block & ~in_above
    sh_ops = shift_rows(ops, delta, below_valid, EMPTY)
    sh_const = shift_rows(const, delta, below_valid, 0.0)
    t_ops = jnp.where(in_above, ops, sh_ops)
    t_const = jnp.where(in_above, const, sh_const)

    blk_delta = (n - 1) - idx
    blk_ops = shift_rows(b_ops, blk_delta, in_block, EMPTY)
    blk_const = shift_rows(b_const, blk_delta, in_block, 0.0)
    return (
        jnp.where(in_block, blk_ops, t_ops),
        jnp.where(in_block, blk_const, t_const),
    )


def leaf_block_tiles(n: int, op: Array, const: Array) -> Tuple[Array, Array]:
    """(N, L) block holding one leaf at the root row; op/const are (1, L)."""
    l = op.shape[-1]
    ri = rows_iota(n, l)
    root = ri == n - 1
    return (
        jnp.where(root, op, EMPTY),
        jnp.where(root & (op == CONST), const, 0.0),
    )


def compose1_tiles(
    op: Array, b_ops: Array, b_const: Array, b_size: Array
) -> Tuple[Array, Array, Array]:
    """Block for unary ``op(child)``: child shifts down one row (static)."""
    n, l = b_ops.shape
    ri = rows_iota(n, l)
    root = ri == n - 1
    valid = (ri > n - 2 - b_size) & ~root
    sh_ops = jnp.concatenate([b_ops[1:], jnp.zeros((1, l), b_ops.dtype)], axis=0)
    sh_const = jnp.concatenate([b_const[1:], jnp.zeros((1, l), b_const.dtype)], axis=0)
    return (
        jnp.where(root, op, jnp.where(valid, sh_ops, EMPTY)),
        jnp.where(root | ~valid, 0.0, sh_const),
        b_size + 1,
    )


def compose2_tiles(
    op: Array,
    a_ops: Array,
    a_const: Array,
    a_size: Array,
    b_ops: Array,
    b_const: Array,
    b_size: Array,
) -> Tuple[Array, Array, Array]:
    """Block for binary ``op(first, second)``: first directly below the root,
    second below it (``ops.splice.compose2`` layout)."""
    n, l = a_ops.shape
    ri = rows_iota(n, l)
    root = ri == n - 1
    a_valid = (ri > n - 2 - a_size) & ~root
    a_sh_ops = jnp.concatenate([a_ops[1:], jnp.zeros((1, l), a_ops.dtype)], axis=0)
    a_sh_const = jnp.concatenate([a_const[1:], jnp.zeros((1, l), a_const.dtype)], axis=0)

    off = 1 + a_size
    in_b = (ri > n - 1 - off - b_size) & (ri <= n - 1 - off)
    b_sh_ops = shift_rows(b_ops, off, in_b, EMPTY)
    b_sh_const = shift_rows(b_const, off, in_b, 0.0)

    out_ops = jnp.where(
        root, op, jnp.where(in_b, b_sh_ops, jnp.where(a_valid, a_sh_ops, EMPTY))
    )
    out_const = jnp.where(
        root, 0.0, jnp.where(in_b, b_sh_const, jnp.where(a_valid, a_sh_const, 0.0))
    )
    return out_ops, out_const, a_size + b_size + 1


# -------------------------------------------------------------- random draws


def _gumbel(u: Array) -> Array:
    u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
    return -jnp.log(-jnp.log(u))


def choose_row(weights: Array, u: Array) -> Array:
    """(1, L) categorical row draw with per-lane weights >= 0 (Gumbel argmax;
    equals the law of ``jr.choice(p=weights/sum)``). All-zero weight lanes
    return an arbitrary row — callers gate on a has-candidates flag exactly
    like the XLA ops do."""
    n, l = weights.shape
    score = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)) + _gumbel(u), _NEG)
    m = jnp.max(score, axis=0, keepdims=True)
    ri = rows_iota(n, l)
    return jnp.max(jnp.where(score == m, ri, -1), axis=0, keepdims=True).astype(jnp.int32)


def normal_rows(urand: Rand, rows: int) -> Array:
    """(rows, L) standard normals via Box-Muller."""
    u1 = jnp.clip(urand(rows), 1e-7, 1.0)
    u2 = urand(rows)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)


def leaf_rows_mask(ops: Array, cfg: SurgeryConfig) -> Array:
    return (ops == CONST) | (ops >= cfg.var_start)


def operator_rows_mask(ops: Array, cfg: SurgeryConfig) -> Array:
    return (ops >= OP_START) & (ops < cfg.var_start)


def sample_operator(urand: Rand, cfg: SurgeryConfig, l: int) -> Array:
    """(1, L) operator opcode ~ operator_probs (reference sampling weights)."""
    k = cfg.var_start - OP_START
    ki = jax.lax.broadcasted_iota(jnp.int32, (k, l), 0)
    w = jnp.zeros((k, l), jnp.float32)
    for i in range(k):
        w = jnp.where(ki == i, float(cfg.operator_probs[i]), w)
    return choose_row(w, urand(k)) + OP_START


def sample_leaf(
    urand: Rand,
    vmask: Array,
    cfg: SurgeryConfig,
    exclude_var: Array | None = None,
) -> Tuple[Array, Array]:
    """50/50 constant-vs-variable leaf per lane (reference
    ``initialization.py:32``; exclusion semantics of ``mutation.py:64-78`` —
    ``exclude_var`` (1, L) removes one variable opcode from the draw, falling
    back to a constant when no variable remains). Returns (op, const) (1, L)."""
    v, l = vmask.shape
    p = vmask
    if exclude_var is not None:
        var_ids = jax.lax.broadcasted_iota(jnp.int32, (v, l), 0) + cfg.var_start
        p = jnp.where(var_ids == exclude_var, 0.0, p)
    has_var = jnp.sum(p, axis=0, keepdims=True) > 0
    var_row = choose_row(jnp.where(has_var, p, jnp.ones_like(p)), urand(v))
    coeff = normal_rows(urand, 1) * cfg.coefficient_sd
    take_const = (urand(1) < 0.5) | ~has_var
    op = jnp.where(take_const, jnp.int32(CONST), var_row + cfg.var_start)
    return op, jnp.where(take_const, coeff, 0.0)


def compact_rows(ops: Array, const: Array) -> Tuple[Array, Array]:
    """Stable-pack non-EMPTY rows to the bottom (root-last / padding-first
    form, the ``prune_tree`` invariant) in log2(N) butterfly stages.

    Each kept row must move DOWN by the number of EMPTY rows below it; those
    shift amounts are non-increasing from top to bottom, and monotone
    shift-down routing is collision-free when executed bit-serially
    LSB->MSB: for rows i above j the remainders satisfy r_i >= r_j at every
    stage (if bit k is set in r_i but not r_j, evenness mod 2^{k+1} forces
    r_i >= r_j + 2^k), while distinct final slots force
    p_j - p_i > r_i - r_j >= 2^k — so a mover can neither land on nor
    overtake a stayer. This replaces an O(N) per-row select scatter (the
    dominant cost of tree sampling inside the reproduction kernel at deep
    max_nodes) with ~log2(N) shift+select stages.
    """
    n, l = ops.shape
    ri = rows_iota(n, l)
    kept = (ops != EMPTY).astype(jnp.int32)
    # prefix-exclusive kept count via the csum_w matmul trick (MXU):
    # pref[j] = sum_{i < j} kept[i]
    rik = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cik = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = (rik < cik).astype(jnp.float32)
    pref = jax.lax.dot_general(
        tri, kept.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    total = jnp.sum(kept, axis=0, keepdims=True)
    kept_below = total - pref - kept  # kept rows strictly below j
    rem = jnp.where(kept != 0, (n - 1 - ri) - kept_below, 0)

    x_ops, x_const = ops, const
    sk = 1
    while sk < n:
        move = jnp.where((rem // sk) % 2 == 1, kept, 0)
        zi = jnp.zeros((sk, l), jnp.int32)
        sh = lambda t, fill: jnp.concatenate([fill, t[:-sk]], axis=0)
        a_move = sh(move, zi)
        a_ops = sh(x_ops, jnp.full((sk, l), EMPTY, jnp.int32))
        a_const = sh(x_const, jnp.zeros((sk, l), x_const.dtype))
        a_rem = sh(rem, zi)
        arrived = a_move != 0
        vacated = (move != 0) & ~arrived
        x_ops = jnp.where(arrived, a_ops, jnp.where(vacated, EMPTY, x_ops))
        x_const = jnp.where(arrived, a_const, jnp.where(vacated, 0.0, x_const))
        rem = jnp.where(arrived, a_rem - sk, jnp.where(vacated, 0, rem))
        kept = jnp.where(arrived, 1, jnp.where(vacated, 0, kept))
        sk *= 2
    return x_ops, x_const


# ------------------------------------------------------------- grow sampling


def _bfs_tables_np(depth: int):
    """Host BFS layout tables (mirrors ``ops.initialization.make_bfs_tables``)."""
    s = 2**depth - 1
    pos = np.zeros(s, np.int64)
    dep = np.zeros(s, np.int64)
    pos[0] = s - 1
    for i in range(s):
        lft, r = 2 * i + 1, 2 * i + 2
        if lft < s:
            dep[lft] = dep[r] = dep[i] + 1
            child_span = 2 ** (depth - dep[i] - 1) - 1
            pos[lft] = pos[i] - 1
            pos[r] = pos[i] - 1 - child_span
    parent = [(i + (i % 2) - 2) // 2 if i > 0 else 0 for i in range(s)]
    is_left = [i % 2 == 1 for i in range(s)]
    return s, pos, dep, parent, is_left


def sample_tree_tile(
    urand: Rand,
    vmask: Array,
    cfg: SurgeryConfig,
    depth_limit: int,
) -> Tuple[Array, Array, Array]:
    """Grow-sample one tree per lane; returns (ops, const, size) —
    (N, L), (N, L), (1, L).

    Static-depth unrolled port of ``ops.initialization.make_tree_sampler``'s
    scan body (itself mirroring reference ``initialization.py:9-54``): BFS
    order, operator probability decays 0.7**depth, leaves 50/50 const/var,
    children forced EMPTY when the parent has no open slot or the
    ``max_nodes`` budget is exhausted; then compacted to root-last /
    padding-first (reference ``prune_tree``, ``initialization.py:82-98``).
    """
    n = cfg.n
    v, l = vmask.shape
    s, dfs_pos, dep, parent, is_left = _bfs_tables_np(depth_limit)
    base = n - s  # dfs row of BFS buffer row 0 inside the (N, L) tile

    rows_ops: List[Array] = [None] * s  # type: ignore[list-item]
    rows_const: List[Array] = [None] * s  # type: ignore[list-item]
    open_slots = jnp.ones((1, l), jnp.int32)
    for i in range(s):
        coeff = normal_rows(urand, 1) * cfg.coefficient_sd
        has_var = jnp.sum(vmask, axis=0, keepdims=True) > 0
        var_row = choose_row(jnp.where(has_var, vmask, jnp.ones_like(vmask)), urand(v))
        take_const = (urand(1) < 0.5) | ~has_var
        leaf = jnp.where(take_const, jnp.int32(CONST), var_row + cfg.var_start)
        operator = sample_operator(urand, cfg, l)

        grow = (open_slots < n - i - 1) & (dep[i] + 1 < depth_limit)
        decay = float(0.7 ** dep[i])
        index = jnp.where(grow & (urand(1) < decay), operator, leaf)
        index = jnp.where(open_slots == 0, EMPTY, index)
        if i > 0:
            parent_op = rows_ops[dfs_pos[parent[i]]]
            parent_ar = arity_tile(parent_op, cfg)
            has_slot = parent_ar + (1 if is_left[i] else 0) > 1
            index = jnp.where(~has_slot, EMPTY, index)

        rows_ops[dfs_pos[i]] = index
        rows_const[dfs_pos[i]] = jnp.where(index == CONST, coeff, 0.0)
        ar = arity_tile(index, cfg)
        open_slots = jnp.where(
            index == EMPTY, open_slots, jnp.maximum(0, open_slots + ar - 1)
        )

    # compact: DFS row i lands at n - (# kept rows at dfs positions >= i).
    # Materialise the DFS-ordered buffer in tile rows [n-s, n) and butterfly-
    # pack the kept rows to the bottom (O(log N) stages, see compact_rows).
    pad_ops = [jnp.full((n - s, l), EMPTY, jnp.int32)] if n > s else []
    pad_const = [jnp.zeros((n - s, l), jnp.float32)] if n > s else []
    buf_ops = jnp.concatenate(pad_ops + rows_ops, axis=0)
    buf_const = jnp.concatenate(pad_const + rows_const, axis=0)
    out_ops, out_const = compact_rows(buf_ops, buf_const)
    size = jnp.sum((buf_ops != EMPTY).astype(jnp.int32), axis=0, keepdims=True)
    return out_ops, out_const, size


# ----------------------------------------------------------------- crossover


def node_probs_tile(ops: Array, cfg: SurgeryConfig) -> Array:
    """Crossover node weights: operators 2, leaves 1, padding 0
    (reference ``crossover.py:110-116``)."""
    nonempty = (ops != EMPTY).astype(jnp.float32)
    is_op = operator_rows_mask(ops, cfg).astype(jnp.float32)
    return nonempty + is_op


def _subtrees_equal_tile(
    ops1, const1, n1, s1, ops2, const2, n2, s2, cfg: SurgeryConfig,
    size1, size2,
) -> Array:
    """Reference equality semantics (``crossover.py:42-58,84-88``) on tiles."""
    n, l = ops1.shape
    ri = rows_iota(n, l)
    # align t2 rows so that t2s[j] = t2[j - n1 + n2]
    inrange = (ri > n1 - s1) & (ri <= n1)
    t2s_ops = shift_rows(ops2, n2 - n1, inrange, -1)
    t2s_const = shift_rows(const2, n2 - n1, inrange, 0.0)
    same_leaf = (ops1 == CONST) & (t2s_ops == CONST) & (const1 == t2s_const)
    rows_eq = ((ops1 == t2s_ops) & (ops1 > CONST)) | same_leaf
    # int-valued selects only: mosaic mishandles bool-valued jnp.where here
    any_bad = jnp.max(
        jnp.where(inrange & ~rows_eq, jnp.int32(1), jnp.int32(0)), axis=0, keepdims=True
    )
    multi = (size1 > 1) | (size2 > 1)
    return (s1 == s2) & multi & (any_bad == 0)


def crossover_tiles(
    ops1: Array,
    const1: Array,
    ops2: Array,
    const2: Array,
    urand: Rand,
    cfg: SurgeryConfig,
) -> Tuple[Array, Array, Array, Array]:
    """Subtree exchange with bounded rejection (``ops.crossover.crossover_trees``
    semantics: CX_RETRIES pre-sampled node pairs, first valid wins, identity on
    total failure)."""
    n, l = ops1.shape
    csum1 = csum_w(ops1, cfg)
    csum2 = csum_w(ops2, cfg)
    w1 = node_probs_tile(ops1, cfg)
    w2 = node_probs_tile(ops2, cfg)
    size1 = sizes_tile(ops1)
    size2 = sizes_tile(ops2)
    empty1 = n - size1
    empty2 = n - size2

    done = jnp.zeros((1, l), jnp.bool_)
    idx1 = jnp.zeros((1, l), jnp.int32)
    idx2 = jnp.zeros((1, l), jnp.int32)
    for _ in range(cfg.cx_retries):
        c1 = choose_row(w1, urand(n))
        c2 = choose_row(w2, urand(n))
        s1 = span_at(ops1, c1, cfg, csum1)
        s2 = span_at(ops2, c2, cfg, csum2)
        fits = (empty1 >= s2 - s1) & (empty2 >= s1 - s2)
        eq = _subtrees_equal_tile(
            ops1, const1, c1, s1, ops2, const2, c2, s2, cfg, size1, size2
        )
        valid = fits & ~eq
        take = valid & ~done
        idx1 = jnp.where(take, c1, idx1)
        idx2 = jnp.where(take, c2, idx2)
        done = done | valid

    s1 = span_at(ops1, idx1, cfg, csum1)
    s2 = span_at(ops2, idx2, cfg, csum2)
    b1_ops, b1_const = extract_block(ops1, const1, idx1, s1)
    b2_ops, b2_const = extract_block(ops2, const2, idx2, s2)
    o1_ops, o1_const = splice_tiles(ops1, const1, idx1, s1, b2_ops, b2_const, s2)
    o2_ops, o2_const = splice_tiles(ops2, const2, idx2, s2, b1_ops, b1_const, s1)
    return (
        jnp.where(done, o1_ops, ops1),
        jnp.where(done, o1_const, const1),
        jnp.where(done, o2_ops, ops2),
        jnp.where(done, o2_const, const2),
    )


# ------------------------------------------------------------------ mutation

# applicability tables (reference get_mutations, mutation.py:534-537)
_PROBS_DEFAULT = np.ones(7, np.float32)
_PROBS_FULL = np.asarray([0, 1, 1, 1, 0, 0, 1], np.float32)
_PROBS_SMALL = np.asarray([1, 1, 1, 0, 1, 0, 1], np.float32)
_PROBS_LEAF = np.asarray([1, 1, 0, 0, 1, 0, 1], np.float32)


def mutation_probs_tile(ops: Array, cfg: SurgeryConfig) -> Array:
    """(7, L) per-lane mutation-operator weights by tree size class."""
    l = ops.shape[1]
    size = sizes_tile(ops)
    empty = cfg.n - size
    ri7 = jax.lax.broadcasted_iota(jnp.int32, (7, l), 0)
    w = jnp.zeros((7, l), jnp.float32)
    for r in range(7):
        wr = jnp.where(
            size == 1,
            float(_PROBS_LEAF[r]),
            jnp.where(
                size <= 3,
                float(_PROBS_SMALL[r]),
                jnp.where(empty < 8, float(_PROBS_FULL[r]), float(_PROBS_DEFAULT[r])),
            ),
        )
        w = jnp.where(ri7 == r, wr, w)
    return w


def mutate_tiles(
    ops: Array,
    const: Array,
    vmask: Array,
    urand: Rand,
    cfg: SurgeryConfig,
    fresh_ops: Array,
    fresh_const: Array,
) -> Tuple[Array, Array]:
    """One mutation per lane: draw ``which`` ~ applicability weights, then the
    seven reference operators as a single parametrised splice (all cases share
    one ladder; ``which`` selects idx/span/block). ``fresh_*`` is a
    pre-sampled full-depth tree used by replace_tree — callers that also need
    a fresh-resample branch can reuse the same draw, since exactly one path
    consumes it per lane.

    Semantics per case follow ``ops.mutation.make_mutators`` one-for-one
    (see that module's docstring for the reference mutation.py line map).
    """
    n, l = ops.shape
    ri = rows_iota(n, l)
    csum = csum_w(ops, cfg)
    size = sizes_tile(ops)
    empty = n - size

    which = choose_row(mutation_probs_tile(ops, cfg), urand(7))  # (1, L) in 0..6

    # shared draws -----------------------------------------------------------
    b2_ops, b2_const, b2_size = sample_tree_tile(urand, vmask, cfg, 2)
    leafmask = leaf_rows_mask(ops, cfg).astype(jnp.float32)
    opmask = operator_rows_mask(ops, cfg).astype(jnp.float32)
    opmask_nonroot = opmask * (ri < n - 1).astype(jnp.float32)
    has_op = jnp.sum(opmask, axis=0, keepdims=True) > 0
    has_nonroot = jnp.sum(opmask_nonroot, axis=0, keepdims=True) > 0

    # -- 0: add_subtree — leaf -> depth-2 subtree
    idx_add = choose_row(leafmask, urand(n))
    add_fits = empty >= b2_size - 1

    # -- 1: mutate_leaf — leaf -> different leaf
    idx_ml = choose_row(leafmask, urand(n))
    old_leaf = row_at(ops, idx_ml)
    ml_op, ml_const = sample_leaf(urand, vmask, cfg, exclude_var=old_leaf)

    # -- 2: mutate_operator — bounded retries over (node, new_op) pairs
    w_mo = jnp.where(has_op, opmask, jnp.ones_like(opmask))
    mo_done = jnp.zeros((1, l), jnp.bool_)
    mo_idx = jnp.zeros((1, l), jnp.int32)
    mo_op = jnp.zeros((1, l), jnp.int32)
    for _ in range(cfg.mut_retries):
        cand = choose_row(w_mo, urand(n))
        new_op = sample_operator(urand, cfg, l)
        spn = span_at(ops, cand, cfg, csum)
        # arity of the sampled operator (static table ladder)
        new_ar = jnp.zeros((1, l), jnp.int32)
        for code in range(OP_START, cfg.var_start):
            new_ar = jnp.where(new_op == code, jnp.int32(int(cfg.slots[code])), new_ar)
        need = jnp.where(new_ar == 2, 7, 8)  # reference mutation.py:99
        ok = has_op & (row_at(ops, cand) != new_op) & (empty + spn >= need)
        take = ok & ~mo_done
        mo_idx = jnp.where(take, cand, mo_idx)
        mo_op = jnp.where(take, new_op, mo_op)
        mo_done = mo_done | ok
    mo_span = span_at(ops, mo_idx, cfg, csum)
    mo_old_ar = row_at(arity_tile(ops, cfg), mo_idx)
    mo_new_ar = jnp.zeros((1, l), jnp.int32)
    for code in range(OP_START, cfg.var_start):
        mo_new_ar = jnp.where(mo_op == code, jnp.int32(int(cfg.slots[code])), mo_new_ar)
    same_arity = mo_old_ar == mo_new_ar
    # 2 -> 1: fresh depth-2 subtree under the unary op
    mo1_ops, mo1_const, mo1_size = compose1_tiles(mo_op, b2_ops, b2_const, b2_size)
    # 1 -> 2: two fresh depth-1 leaves under the binary op
    la_op, la_const = sample_leaf(urand, vmask, cfg)
    lb_op, lb_const = sample_leaf(urand, vmask, cfg)
    la_ops_blk, la_const_blk = leaf_block_tiles(n, la_op, la_const)
    lb_ops_blk, lb_const_blk = leaf_block_tiles(n, lb_op, lb_const)
    one = jnp.ones((1, l), jnp.int32)
    mo2_ops, mo2_const, mo2_size = compose2_tiles(
        mo_op, la_ops_blk, la_const_blk, one, lb_ops_blk, lb_const_blk, one
    )

    # -- 3: delete_operator — non-root operator subtree -> leaf
    idx_del = choose_row(jnp.where(has_nonroot, opmask_nonroot, jnp.ones_like(opmask)), urand(n))
    del_span = span_at(ops, idx_del, cfg, csum)
    del_op, del_const = sample_leaf(urand, vmask, cfg)
    del_blk_ops, del_blk_const = leaf_block_tiles(n, del_op, del_const)

    # -- 4: prepend_operator — new root above the whole tree
    pre_op = sample_operator(urand, cfg, l)
    pre_ar = jnp.zeros((1, l), jnp.int32)
    for code in range(OP_START, cfg.var_start):
        pre_ar = jnp.where(pre_op == code, jnp.int32(int(cfg.slots[code])), pre_ar)
    pre_side = urand(1) < 0.5  # True: sampled subtree is the first operand
    pre1_ops, pre1_const, pre1_size = compose1_tiles(pre_op, ops, const, size)
    pre_first_ops = jnp.where(pre_side, b2_ops, ops)
    pre_first_const = jnp.where(pre_side, b2_const, const)
    pre_first_size = jnp.where(pre_side, b2_size, size)
    pre_second_ops = jnp.where(pre_side, ops, b2_ops)
    pre_second_const = jnp.where(pre_side, const, b2_const)
    pre_second_size = jnp.where(pre_side, size, b2_size)
    pre2_ops, pre2_const, pre2_size = compose2_tiles(
        pre_op, pre_first_ops, pre_first_const, pre_first_size,
        pre_second_ops, pre_second_const, pre_second_size,
    )
    pre_blk_ops = jnp.where(pre_ar == 1, pre1_ops, pre2_ops)
    pre_blk_const = jnp.where(pre_ar == 1, pre1_const, pre2_const)
    pre_bs = jnp.where(pre_ar == 1, pre1_size, pre2_size)
    pre_fits = pre_bs <= n

    # -- 5: insert_operator — new operator spliced above a non-root node
    idx_ins = choose_row(jnp.where(has_nonroot, opmask_nonroot, jnp.ones_like(opmask)), urand(n))
    ins_span = span_at(ops, idx_ins, cfg, csum)
    ins_op = sample_operator(urand, cfg, l)
    ins_ar = jnp.zeros((1, l), jnp.int32)
    for code in range(OP_START, cfg.var_start):
        ins_ar = jnp.where(ins_op == code, jnp.int32(int(cfg.slots[code])), ins_ar)
    old_blk_ops, old_blk_const = extract_block(ops, const, idx_ins, ins_span)
    ins_side = urand(1) < 0.5
    ins1_ops, ins1_const, ins1_size = compose1_tiles(ins_op, old_blk_ops, old_blk_const, ins_span)
    ins_first_ops = jnp.where(ins_side, b2_ops, old_blk_ops)
    ins_first_const = jnp.where(ins_side, b2_const, old_blk_const)
    ins_first_size = jnp.where(ins_side, b2_size, ins_span)
    ins_second_ops = jnp.where(ins_side, old_blk_ops, b2_ops)
    ins_second_const = jnp.where(ins_side, old_blk_const, b2_const)
    ins_second_size = jnp.where(ins_side, ins_span, b2_size)
    ins2_ops, ins2_const, ins2_size = compose2_tiles(
        ins_op, ins_first_ops, ins_first_const, ins_first_size,
        ins_second_ops, ins_second_const, ins_second_size,
    )
    ins_blk_ops = jnp.where(ins_ar == 1, ins1_ops, ins2_ops)
    ins_blk_const = jnp.where(ins_ar == 1, ins1_const, ins2_const)
    ins_bs = jnp.where(ins_ar == 1, ins1_size, ins2_size)
    ins_fits = empty >= ins_bs - ins_span

    # ------------------------------------------------- one parametrised splice
    def pick(case_vals, default):
        out = default
        for c, v in case_vals:
            out = jnp.where(which == c, v, out)
        return out

    sp_idx = pick(
        [(0, idx_add), (1, idx_ml), (2, mo_idx), (3, idx_del), (5, idx_ins)],
        jnp.full((1, l), n - 1, jnp.int32),  # case 4 splices at the root
    )
    sp_old = pick(
        [(0, one), (1, one), (2, mo_span), (3, del_span), (5, ins_span)], size
    )
    ml_blk_ops, ml_blk_const = leaf_block_tiles(n, ml_op, ml_const)
    mo_blk_ops = jnp.where(mo_new_ar == 1, mo1_ops, mo2_ops)
    mo_blk_const = jnp.where(mo_new_ar == 1, mo1_const, mo2_const)
    mo_bs = jnp.where(mo_new_ar == 1, mo1_size, mo2_size)

    def pick_tile(case_vals, default):
        out = default
        for c, v in case_vals:
            out = jnp.where(which == c, v, out)
        return out

    sp_blk_ops = pick_tile(
        [(0, b2_ops), (1, ml_blk_ops), (2, mo_blk_ops), (3, del_blk_ops), (5, ins_blk_ops)],
        pre_blk_ops,
    )
    sp_blk_const = pick_tile(
        [(0, b2_const), (1, ml_blk_const), (2, mo_blk_const), (3, del_blk_const), (5, ins_blk_const)],
        pre_blk_const,
    )
    sp_bs = pick(
        [(0, b2_size), (1, one), (2, mo_bs), (3, one), (5, ins_bs)], pre_bs
    )

    out_ops, out_const = splice_tiles(ops, const, sp_idx, sp_old, sp_blk_ops, sp_blk_const, sp_bs)

    # per-case validity: fall back to the unmutated tree (reference no-ops).
    # int-valued selects only — mosaic cannot legalize bool-valued jnp.where
    # (i8->i1 trunci), same workaround as _subtrees_equal_tile.
    as_i = lambda b: b.astype(jnp.int32)
    valid = pick(
        [
            (0, as_i(add_fits)),
            (1, jnp.ones((1, l), jnp.int32)),
            (2, as_i(mo_done & ~same_arity)),
            (3, as_i(has_nonroot)),
            (4, as_i(pre_fits)),
            (5, as_i(has_nonroot & ins_fits)),
        ],
        jnp.zeros((1, l), jnp.int32),
    ) != 0
    out_ops = jnp.where(valid, out_ops, ops)
    out_const = jnp.where(valid, out_const, const)

    # mutate_operator same-arity: in-place opcode swap
    swap = (which == 2) & mo_done & same_arity
    out_ops = jnp.where(swap & (ri == mo_idx), mo_op, out_ops)

    # replace_tree: the pre-sampled fresh tree
    out_ops = jnp.where(which == 6, fresh_ops, out_ops)
    out_const = jnp.where(which == 6, fresh_const, out_const)
    return out_ops, out_const


# ----------------------------------------------------------- full reproduce


def reproduce_tiles(
    p1_ops: Array,
    p1_const: Array,
    p2_ops: Array,
    p2_const: Array,
    cxflag: Array,  # (1, L) bool: exchange subtrees at this tree slot
    act1: Array,  # (1, L) int32: child-1 action 0=pass 1=mutate 2=fresh
    act2: Array,  # (1, L) int32: child-2 action
    vmask: Array,  # (V, L) per-lane variable weights
    urand: Rand,
    cfg: SurgeryConfig,
) -> Tuple[Array, Array, Array, Array]:
    """Produce two children per lane from two parents + per-lane actions.

    This is the whole reproduction step of ``ops.reproduction.make_evolve_island``
    minus selection/elitism (done outside): crossover pairs exchange subtrees,
    mutate actions apply one of the seven operators, fresh actions resample at
    ``max_init_depth`` (the reference ``sample_pair``), pass-through lanes copy
    the parent (Bernoulli tree-mask semantics are encoded in the actions).
    """
    f1_ops, f1_const, _ = sample_tree_tile(urand, vmask, cfg, cfg.max_init_depth)
    f2_ops, f2_const, _ = sample_tree_tile(urand, vmask, cfg, cfg.max_init_depth)

    x1_ops, x1_const, x2_ops, x2_const = crossover_tiles(
        p1_ops, p1_const, p2_ops, p2_const, urand, cfg
    )
    m1_ops, m1_const = mutate_tiles(p1_ops, p1_const, vmask, urand, cfg, f1_ops, f1_const)
    m2_ops, m2_const = mutate_tiles(p2_ops, p2_const, vmask, urand, cfg, f2_ops, f2_const)

    def out(parent_ops, parent_const, cx_ops, cx_const, m_ops, m_const, f_ops, f_const, act):
        o_ops = jnp.where(act == 1, m_ops, jnp.where(act == 2, f_ops, parent_ops))
        o_const = jnp.where(act == 1, m_const, jnp.where(act == 2, f_const, parent_const))
        return (
            jnp.where(cxflag, cx_ops, o_ops),
            jnp.where(cxflag, cx_const, o_const),
        )

    c1_ops, c1_const = out(p1_ops, p1_const, x1_ops, x1_const, m1_ops, m1_const, f1_ops, f1_const, act1)
    c2_ops, c2_const = out(p2_ops, p2_const, x2_ops, x2_const, m2_ops, m2_const, f2_ops, f2_const, act2)
    return c1_ops, c1_const, c2_ops, c2_const


def make_host_rand(key: Array, l: int) -> Rand:
    """CPU/test ``urand``: a fresh jr stream per call (statically unrolled)."""
    import jax.random as jr

    state = {"key": key}

    def urand(rows: int) -> Array:
        state["key"], sub = jr.split(state["key"])
        return jr.uniform(sub, (rows, l), jnp.float32)

    return urand
