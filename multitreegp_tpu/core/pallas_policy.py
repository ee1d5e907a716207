"""Fused whole-rollout Pallas kernels for symbolic-policy fitness.

Extends the SR rollout kernel (:mod:`pallas_rollout`) to closed-loop control:
the environment's ``drift``/``cond_alive`` — written as elementwise ops over
an indexed state vector — trace UNCHANGED on stacked ``(latent, S, 128)``
register tiles inside the kernel (the env tile protocol,
``environments.base.ControlEnvironmentBase.tile_safe_drift``). One kernel
launch per population evaluation runs the full closed loop:

    static  (feedforward_evaluate.py:104-110):  u = trees([y, tgt]);  dx = env.drift
    dynamic (dynamic_evaluate.py:107-118):      u = readout([0, a, 0, tgt]);
                                                dx = env.drift; da = state_eq([y, a, u, tgt])

per RK stage, per substep, per save step — tree streams, targets and physics
parameters resident in VMEM for the whole trajectory.

Engages only when: TPU + concrete uniform grid + ``env.tile_safe_drift`` +
zero observation/process noise + per-trajectory scalar params (Constant /
Different modes) + ``max_nodes <= UNROLL_MAX_NODES``. The general scan path
covers everything else. The post-hoc observation/control replay and the cost
function stay outside the kernel (they are O(T) work on saved states, not the
O(T x substeps x stages) hot loop).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from .registry import FunctionSet
from .trees import CONST, OP_START, TreeTensors

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from .pallas_interpreter import LANE, SUBLANES, TILE, UNROLL_MAX_NODES
from .pallas_rollout import DIVERGENCE_BOUND, _RK_TABLES


def _make_tree_eval(fset: FunctionSet, n: int):
    """Unrolled SSA stack interpreter over (S, 128) tiles; ``data_tiles`` maps
    variable id -> tile."""
    var_start = fset.var_start

    def eval_tree(ops_tile, c2_tile, const_tile, data_tiles):
        zero = jnp.zeros((SUBLANES, LANE), jnp.float32)
        one = jnp.ones((SUBLANES, LANE), jnp.float32)
        vals = []
        for i in range(n):
            op = ops_tile[i]
            c2 = c2_tile[i]
            x = vals[i - 1] if i else zero
            y = zero
            for j in range(i - 1):
                y = jnp.where(c2 == j, vals[j], y)
            leaf = zero
            for var, tile in enumerate(data_tiles):
                leaf = jnp.where(op == var_start + var, tile, leaf)
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


def _make_policy_kernel(env, fset: FunctionSet, n: int, m: int, latent: int,
                        state_size: int, n_targets: int, params_treedef,
                        n_params: int, t_steps: int, substeps: int, dt: float,
                        method: str):
    stages, final_scale = _RK_TABLES[method]
    eval_tree = _make_tree_eval(fset, n)
    n_control = m - state_size
    d_aug = latent + state_size
    dynamic = state_size > 0
    n_obs = env.n_obs

    def kernel(ops_ref, c2_ref, const_ref, x0_ref, tgt_ref, par_ref,
               xs_ref, alive_ref, x_scr, live_scr, stage_ref, sem):
        # xs_ref lives in HBM (the whole (T, d_aug, grid, S, L) array): a
        # VMEM-resident trajectory buffer would blow the 16 MB budget at the
        # notebook horizons (T=250). Saved states go out through a
        # double-buffered staging tile + async DMA per save step.
        gi = pl.program_id(0)
        zero = jnp.zeros((SUBLANES, LANE), jnp.float32)

        def copy_out(t_row, slot):
            return pltpu.make_async_copy(
                stage_ref.at[slot], xs_ref.at[t_row, :, gi], sem.at[slot]
            )
        ops = [[ops_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
        c2s = [[c2_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
        consts = [[const_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
        tgt = [tgt_ref[i, 0] for i in range(n_targets)]
        params = jax.tree_util.tree_unflatten(
            params_treedef, [par_ref[i, 0] for i in range(n_params)]
        )

        def drift(x_tiles):
            x_stack = jnp.stack(x_tiles[:latent])
            y = env.obs_tiles(x_stack)  # (n_obs, S, 128)
            y_tiles = [y[i] for i in range(n_obs)]
            if dynamic:
                a = x_tiles[latent:]
                data_r = (
                    [zero] * n_obs + a + [zero] * n_control + tgt
                )  # readout bottleneck: zeros for y and u (reference :113)
                u = [
                    eval_tree(ops[state_size + ci], c2s[state_size + ci],
                              consts[state_size + ci], data_r)
                    for ci in range(n_control)
                ]
            else:
                data = y_tiles + tgt
                u = [
                    eval_tree(ops[ci], c2s[ci], consts[ci], data)
                    for ci in range(n_control)
                ]
            u_stack = jnp.stack(u)
            dx = env.drift(jnp.float32(0.0), x_stack, u_stack, params)
            out = [dx[i] for i in range(latent)]
            if dynamic:
                data_s = y_tiles + a + u + tgt
                out += [
                    eval_tree(ops[si], c2s[si], consts[si], data_s)
                    for si in range(state_size)
                ]
            return out

        def ok_mask(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            good = good & env.cond_alive(jnp.float32(0.0), jnp.stack(x_tiles[:latent]))
            return good.astype(jnp.float32)

        x = [x0_ref[i, 0] for i in range(d_aug)]
        live_scr[...] = ok_mask(x)
        for i in range(d_aug):
            stage_ref[0, i] = x[i]
            x_scr[i] = x[i]
        copy_out(0, 0).start()

        h = dt / substeps

        def save_step(t, _):
            x = [x_scr[i] for i in range(d_aug)]
            alive = live_scr[...]
            for _s in range(substeps):
                acc = [jnp.zeros((SUBLANES, LANE), jnp.float32) for _ in range(d_aug)]
                k = None
                for c, w in stages:
                    x_stage = x if k is None else [
                        x[i] + (h * c) * k[i] for i in range(d_aug)
                    ]
                    k = drift(x_stage)
                    acc = [acc[i] + w * k[i] for i in range(d_aug)]
                x_new = [x[i] + (h * final_scale) * acc[i] for i in range(d_aug)]
                alive = alive * ok_mask(x_new)
                x = [jnp.where(alive > 0.5, x_new[i], x[i]) for i in range(d_aug)]

            slot = (t + 1) % 2
            # the slot's previous DMA (row t-1) must land before reuse
            @pl.when(t >= 1)
            def _():
                copy_out(t - 1, slot).wait()

            for i in range(d_aug):
                stage_ref[slot, i] = x[i]
                x_scr[i] = x[i]
            copy_out(t + 1, slot).start()
            live_scr[...] = alive
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        # drain both in-flight DMAs (rows t_steps-1 and t_steps-2)
        copy_out(t_steps - 1, (t_steps - 1) % 2).wait()
        if t_steps >= 2:
            copy_out(t_steps - 2, (t_steps - 2) % 2).wait()
        alive_ref[0] = live_scr[...]

    return kernel


def policy_rollout_available(env, fset: FunctionSet, trees: TreeTensors,
                             params, obs_noise_active: bool) -> bool:
    if not (_HAS_PALLAS and jax.default_backend() == "tpu"):
        return False
    if not getattr(env, "tile_safe_drift", False) or obs_noise_active:
        return False
    if trees.max_nodes > UNROLL_MAX_NODES:
        return False
    leaves = jax.tree_util.tree_leaves(params)
    return all(getattr(p, "ndim", 0) <= 1 for p in leaves)  # python scalars ok


def rollout_policy_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    targets: Array,
    params,
    env,
    fset: FunctionSet,
    substeps: int = 1,
    method: str = "rk4",
    state_size: int = 0,
) -> Tuple[Array, Array]:
    """Fused closed-loop rollout. trees batched ``(P, m)``; ``x0 (B, latent)``;
    ``targets (B, n_targets)``; params: pytree of per-trajectory scalars
    ``(B,)`` (or python scalars). Returns ``(xas (T, P, B, latent+state_size),
    alive (T, P, B))``; differentiable via unfused-recompute VJP is NOT wired
    here — the policy evaluators only use this path outside gradient contexts
    (constant optimisation routes through the general path)."""
    p, m = trees.batch_shape
    b, latent = x0.shape
    n = trees.max_nodes
    t_steps = ts.shape[0]
    if isinstance(ts, jax.core.Tracer):
        raise ValueError("fused policy rollout needs a concrete time grid")
    ts_np = jax.device_get(ts)
    dt = float(ts_np[1] - ts_np[0])

    lanes = p * b
    pad = (-lanes) % TILE
    lp = lanes + pad
    grid = lp // TILE
    d_aug = latent + state_size
    n_targets = targets.shape[-1]

    def prep_tree(x, dtype):
        xt = jnp.moveaxis(x, 0, -1)  # (m, N, P)
        xt = jnp.broadcast_to(xt[..., None], (m, n, p, b)).reshape(m, n, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad))) if pad else xt
        return xt.astype(dtype).reshape(m, n, grid, SUBLANES, LANE)

    def prep_b(x):  # (B, k) -> (k, grid, S, L): per-trajectory, broadcast over P
        k = x.shape[-1]
        xt = jnp.broadcast_to(x.T[:, None, :], (k, p, b)).reshape(k, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, pad))) if pad else xt
        return xt.astype(jnp.float32).reshape(k, grid, SUBLANES, LANE)

    ops_l = prep_tree(trees.ops, jnp.int32)
    c2_l = prep_tree(trees.c2, jnp.int32)
    const_l = prep_tree(trees.const, jnp.float32)

    xa0 = jnp.concatenate([x0, jnp.zeros((b, state_size))], axis=-1)
    x0_l = prep_b(xa0)  # (d_aug, grid, S, L)

    # targets may be empty (n_targets == 0): keep a dummy row for block specs
    tgt_src = targets if n_targets else jnp.zeros((b, 1))
    tgt_l = prep_b(tgt_src)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [jnp.broadcast_to(jnp.asarray(v, jnp.float32), (b,)) for v in leaves]
    n_params = max(len(leaves), 1)
    par_src = jnp.stack(leaves, axis=-1) if leaves else jnp.zeros((b, 1))
    par_l = prep_b(par_src)

    kernel = _make_policy_kernel(
        env, fset, n, m, latent, state_size, n_targets, treedef,
        len(leaves), t_steps, substeps, dt, method,
    )

    tree_spec = pl.BlockSpec(
        (m, n, 1, SUBLANES, LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = lambda k: pl.BlockSpec(
        (k, 1, SUBLANES, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    xs, alive = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            tree_spec, tree_spec, tree_spec,
            vec_spec(d_aug), vec_spec(tgt_l.shape[0]), vec_spec(par_l.shape[0]),
        ],
        out_specs=(
            # full trajectory stays in HBM; the kernel DMAs one save row at a
            # time from a double-buffered VMEM staging tile
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, SUBLANES, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, d_aug, grid, SUBLANES, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUBLANES, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d_aug, SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((2, d_aug, SUBLANES, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(ops_l, c2_l, const_l, x0_l, tgt_l, par_l)

    xs = xs.reshape(t_steps, d_aug, lp)[:, :, :lanes].reshape(t_steps, d_aug, p, b)
    xs = jnp.moveaxis(xs, 1, -1)  # (T, P, B, d_aug)
    alive_last = alive.reshape(lp)[:lanes].reshape(p, b) > 0.5
    alive_t = jnp.broadcast_to(alive_last[None], (t_steps, p, b))
    return xs, alive_t
