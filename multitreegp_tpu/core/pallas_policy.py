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
``max_nodes <= DEEP_MAX_NODES`` with the VMEM byte gate of
:func:`policy_rollout_available` (2 tree streams + the stack-plane scratch
under 10 MB at 16 KB/row, i.e. ``2*m*N + stack_planes(N) <= 640``). The
rolled-row eval (stack machine + per-tile dynamic row start over
size-sorted lanes) is the default at every N after the r2 hardware A/B
(2.3x over the unrolled ladder); ``MTGP_POLICY_UNROLLED=1`` restores the
fully-unrolled ladder for N <= UNROLL_MAX_NODES. The general scan path
covers everything else. Three exogenous-input classes stream from HBM through a double-buffered
staging tile:

* physics parameters — scalars / per-trajectory ``(B,)`` values resident in
  VMEM, or per-save-point ``(B, T)`` series (Switch/Decay modes) linearly
  interpolated at every RK stage time in-register (the equivalent of
  ``params_at`` / ``integrators.linear_interp``);
* observation noise — the general path's draws are deterministic in
  (key, solver time), so ``evaluators.noise.make_obs_noise_rows``
  materialises the exact per-stage draws up front and the kernel adds them
  via the env's ``obs_tiles_noisy`` — bit-identical noise to the scan path
  and the post-hoc replay;
* process noise (``stochastic=True`` Euler-Maruyama) — same determinism
  argument: ``make_process_noise_rows`` precomputes the per-substep
  ``V @ dW`` kicks of ``integrators.integrate_sde`` and the kernel adds them
  to the latent block after each Euler substep.

The post-hoc observation/control replay and the cost function stay outside
the kernel (they are O(T) work on saved states, not the O(T x substeps x
stages) hot loop).
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

from .pallas_interpreter import (
    LANE,
    SUBLANES,
    TILE,
    UNROLL_MAX_NODES,
    tpu_kernels_available,
)
from .pallas_rollout import (
    DEEP_MAX_NODES,
    DIVERGENCE_BOUND,
    _make_deep_tree_eval,
    _RefRows,
    _RK_TABLES,
    deep_tile_scalars,
    size_sort_candidates,
    stack_planes,
)


def _make_tree_eval(fset: FunctionSet, n: int):
    """Unrolled SSA stack interpreter over (S, 128) tiles; ``data_tiles`` maps
    variable id -> tile. ``ops_tile``/``c2_tile``/``const_tile`` are
    row-indexable (lists of SSA tiles OR a ``ref[mi]`` lambda-view) so the
    same ladder serves the statically-unrolled and the fori-rolled tree
    loops."""
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
                        method: str, streamed: bool = False,
                        obs_noise: bool = False, process_noise: bool = False,
                        deep: bool = False, stream_controls: bool = False):
    stages, final_scale = _RK_TABLES[method]
    n_stages = len(stages)
    if deep:
        eval_deep = _make_deep_tree_eval(fset, n, SUBLANES)
    else:
        eval_tree = _make_tree_eval(fset, n)
    n_control = m - state_size
    d_aug = latent + state_size
    dynamic = state_size > 0
    n_obs = env.n_obs

    # compile-time control: the traced kernel body is O(substeps x stages x
    # m x N^2) select ops when fully unrolled — 12+ min Mosaic compiles at
    # m=2, substeps=4. Rolling the tree loop (dynamic VMEM row indexing) and
    # the substep loop (state carried in scratch refs — Mosaic cannot
    # legalize multi-tile tuple fori carries) divides the body by m*substeps.
    # ``deep`` additionally rolls the ROW loop (stack-machine eval + dynamic
    # start, pallas_rollout._make_deep_tree_eval) — covers N > the unroll
    # gate and skips the all-padding row prefix.
    roll_trees = m >= 2 or deep
    roll_sub = substeps >= 2

    def kernel(*refs):
        # xs_ref lives in HBM (the whole (T, d_aug, grid, S, L) array): a
        # VMEM-resident trajectory buffer would blow the 16 MB budget at the
        # notebook horizons (T=250). Saved states go out through a
        # double-buffered staging tile + async DMA per save step.
        if deep:
            (ops_ref, const_ref, x0_ref, tgt_ref, par_ref, depth_ref,
             start_ref, xs_ref, alive_ref, x_scr, live_scr, stage_ref, sem,
             *extra) = refs
            planes_scr, sp_scr, top_scr, ysel_scr = extra[-4:]
        else:
            (ops_ref, c2_ref, const_ref, x0_ref, tgt_ref, par_ref,
             xs_ref, alive_ref, x_scr, live_scr, stage_ref, sem,
             *extra) = refs
        ei = 0
        if streamed:
            par_scr, psem = extra[0], extra[1]
            ei = 2
        if roll_trees:
            tree_scr = extra[ei]
        gi = pl.program_id(0)
        zero = jnp.zeros((SUBLANES, LANE), jnp.float32)

        def copy_out(t_row, slot):
            return pltpu.make_async_copy(
                stage_ref.at[slot], xs_ref.at[t_row, :, gi], sem.at[slot]
            )

        if deep:
            def trees_eval(first, count, data_tiles, out_base):
                def body(ci, _):
                    mi = first + ci
                    eval_deep(
                        _RefRows(ops_ref, mi), _RefRows(const_ref, mi),
                        data_tiles, planes_scr, sp_scr, top_scr, ysel_scr,
                        start=start_ref[0, mi, 0],
                        depth_cap=lambda i, mi=mi: depth_ref[0, mi, i],
                    )
                    tree_scr[out_base + ci] = ysel_scr[...]
                    return 0

                jax.lax.fori_loop(0, count, body, 0)
                return [tree_scr[out_base + i] for i in range(count)]
        elif roll_trees:
            def trees_eval(first, count, data_tiles, out_base):
                def body(ci, _):
                    tree_scr[out_base + ci] = eval_tree(
                        _RefRows(ops_ref, first + ci),
                        _RefRows(c2_ref, first + ci),
                        _RefRows(const_ref, first + ci),
                        data_tiles,
                    )
                    return 0

                jax.lax.fori_loop(0, count, body, 0)
                return [tree_scr[out_base + i] for i in range(count)]
        else:
            ops = [[ops_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            c2s = [[c2_ref[mi, i, 0] for i in range(n)] for mi in range(m)]
            consts = [[const_ref[mi, i, 0] for i in range(n)] for mi in range(m)]

            def trees_eval(first, count, data_tiles, out_base):
                return [
                    eval_tree(ops[first + i], c2s[first + i], consts[first + i],
                              data_tiles)
                    for i in range(count)
                ]

        tgt = [tgt_ref[i, 0] for i in range(n_targets)]
        if streamed:
            # exogenous per-save-point rows (param values + pre-scaled obs
            # noise draws) stream in from HBM through a double-buffered
            # staging tile (mirror of the outbound xs path). Param values at
            # stage times are linear interpolations between rows t and t+1 —
            # exactly ``integrators.linear_interp`` on the uniform grid; the
            # noise block of row t holds every stage draw of interval
            # [ts[t], ts[t+1]) (``obs_noise_rows`` layout, exact draws).
            def par_copy(row, slot):
                return pltpu.make_async_copy(
                    par_ref.at[row, :, gi], par_scr.at[slot], psem.at[slot]
                )
        else:
            params_const = jax.tree_util.tree_unflatten(
                params_treedef, [par_ref[i, 0] for i in range(n_params)]
            )

        def params_at_step(t, frac: float):
            """Resolved params pytree at solver time ts[t] + frac * dt."""
            if not streamed:
                return params_const
            lo = [par_scr[t % 2, i] for i in range(n_params)]
            hi = [par_scr[(t + 1) % 2, i] for i in range(n_params)]
            return jax.tree_util.tree_unflatten(
                params_treedef,
                [l * (1.0 - frac) + h * frac for l, h in zip(lo, hi)],
            )

        def noise_at(t, substep: int, stage: int):
            """(n_obs,) noise tiles for one stage drift, or None."""
            if not obs_noise:
                return None
            base = n_params + (substep * n_stages + stage) * n_obs
            return [par_scr[t % 2, base + i] for i in range(n_obs)]

        def kick_at(t, substep: int):
            """(latent,) Euler-Maruyama kick tiles for one substep, or None."""
            if not process_noise:
                return None
            base = n_params + (substeps * n_stages * n_obs if obs_noise else 0)
            return [par_scr[t % 2, base + substep * latent + i] for i in range(latent)]

        def save_u(x_tiles, t_row):
            """Controls at a SAVE point — the post-hoc replay's semantics
            (reference feedforward :96-97 / dynamic :99-101): observation at
            save time ``ts[t_row]`` (noise draw = the interval's
            (substep 0, stage 0) slot, which IS the save-time draw; row T-1
            carries it explicitly), REAL observations fed to the trees (the
            dynamic readout zero-feeds only u)."""
            # save-time draw = stage (0, 0) of the row's noise block
            noise = noise_at(t_row, 0, 0) if obs_noise else None
            x_stack = jnp.stack(x_tiles[:latent])
            if noise is None:
                y = env.obs_tiles(x_stack)
            else:
                y = env.obs_tiles_noisy(x_stack, jnp.stack(noise))
            y_tiles = [y[i] for i in range(n_obs)]
            if dynamic:
                a = x_tiles[latent:]
                data_r = y_tiles + a + [zero] * n_control + tgt
                return trees_eval(state_size, n_control, data_r, 0)
            return trees_eval(0, n_control, y_tiles + tgt, 0)

        def drift(x_tiles, params, noise):
            x_stack = jnp.stack(x_tiles[:latent])
            if noise is None:
                y = env.obs_tiles(x_stack)  # (n_obs, S, 128)
            else:
                y = env.obs_tiles_noisy(x_stack, jnp.stack(noise))
            y_tiles = [y[i] for i in range(n_obs)]
            if dynamic:
                a = x_tiles[latent:]
                data_r = (
                    [zero] * n_obs + a + [zero] * n_control + tgt
                )  # readout bottleneck: zeros for y and u (reference :113)
                u = trees_eval(state_size, n_control, data_r, 0)
            else:
                u = trees_eval(0, n_control, y_tiles + tgt, 0)
            u_stack = jnp.stack(u)
            dx = env.drift(jnp.float32(0.0), x_stack, u_stack, params)
            out = [dx[i] for i in range(latent)]
            if dynamic:
                data_s = y_tiles + a + u + tgt
                out += trees_eval(0, state_size, data_s, n_control)
            return out

        def ok_mask(x_tiles):
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            good = good & env.cond_alive(jnp.float32(0.0), jnp.stack(x_tiles[:latent]))
            return good.astype(jnp.float32)

        # inbound param/noise rows first: save_u(x0, 0) below reads row 0's
        # save-time noise slot
        if streamed and t_steps > 1:
            par_copy(0, 0).start()
            par_copy(1, 1).start()
            par_copy(0, 0).wait()
        x = [x0_ref[i, 0] for i in range(d_aug)]
        live_scr[...] = ok_mask(x)
        for i in range(d_aug):
            stage_ref[0, i] = x[i]
            x_scr[i] = x[i]
        if stream_controls:
            u0 = save_u(x, 0)
            for j in range(n_control):
                stage_ref[0, d_aug + j] = u0[j]
        copy_out(0, 0).start()
        # alive output = COUNT of alive save rows (alive is monotone, so the
        # host reconstructs the per-save mask as ``t < count``; the reference
        # needs per-save liveness to inf-fill post-event saves like diffrax)
        alive_ref[0] = live_scr[...]

        h = dt / substeps

        def one_substep(t, s, frac_of):
            """Advance x_scr/live_scr by one RK(+kick) substep. ``s`` may be a
            python int (unrolled) or a traced fori index (rolled); ``frac_of``
            maps a stage offset c to the save-interval fraction (s + c)/substeps
            in whichever arithmetic matches."""
            x = [x_scr[i] for i in range(d_aug)]
            alive = live_scr[...]
            acc = [jnp.zeros((SUBLANES, LANE), jnp.float32) for _ in range(d_aug)]
            k = None
            for _j, (c, w) in enumerate(stages):
                x_stage = x if k is None else [
                    x[i] + (h * c) * k[i] for i in range(d_aug)
                ]
                k = drift(
                    x_stage, params_at_step(t, frac_of(c)), noise_at(t, s, _j)
                )
                acc = [acc[i] + w * k[i] for i in range(d_aug)]
            x_new = [x[i] + (h * final_scale) * acc[i] for i in range(d_aug)]
            kick = kick_at(t, s)
            if kick is not None:
                # Euler-Maruyama: additive precomputed V @ dW on the env
                # latent block (hidden policy state carries no noise),
                # applied before the liveness check — integrate_sde order
                x_new = [
                    x_new[i] + kick[i] if i < latent else x_new[i]
                    for i in range(d_aug)
                ]
            alive = alive * ok_mask(x_new)
            for i in range(d_aug):
                x_scr[i] = jnp.where(alive > 0.5, x_new[i], x[i])
            live_scr[...] = alive

        def save_step(t, _):
            # params: rows t and t+1 must be resident. Row t+1's inbound DMA
            # was started at step t-1 (rows 0/1 pre-loop); each row is waited
            # exactly once, at the start of the step that first reads it.
            if streamed:
                par_copy(t + 1, (t + 1) % 2).wait()
            if roll_sub:
                def sub_body(s, _c):
                    one_substep(
                        t, s,
                        lambda c: (s.astype(jnp.float32) + c) * (1.0 / substeps),
                    )
                    return 0

                jax.lax.fori_loop(0, substeps, sub_body, 0)
            else:
                for _s in range(substeps):
                    one_substep(t, _s, lambda c, _s=_s: (_s + c) / substeps)
            x = [x_scr[i] for i in range(d_aug)]
            alive = live_scr[...]

            slot = (t + 1) % 2
            # the slot's previous DMA (row t-1) must land before reuse
            @pl.when(t >= 1)
            def _():
                copy_out(t - 1, slot).wait()

            for i in range(d_aug):
                stage_ref[slot, i] = x[i]
                x_scr[i] = x[i]
            if stream_controls:
                # save row t+1's controls: noise row t+1 is resident (waited
                # at the top of this step)
                u = save_u(x, t + 1)
                for j in range(n_control):
                    stage_ref[slot, d_aug + j] = u[j]
            copy_out(t + 1, slot).start()
            if streamed:
                # row t+2 overwrites row t's slot once this step no longer
                # needs it
                @pl.when(t + 2 <= t_steps - 1)
                def _():
                    par_copy(t + 2, t % 2).start()
            live_scr[...] = alive
            alive_ref[0] = alive_ref[0] + alive  # save row t+1's liveness
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        # drain both in-flight DMAs (rows t_steps-1 and t_steps-2)
        copy_out(t_steps - 1, (t_steps - 1) % 2).wait()
        if t_steps >= 2:
            copy_out(t_steps - 2, (t_steps - 2) % 2).wait()

    return kernel


def policy_rollout_available(env, fset: FunctionSet, trees: TreeTensors,
                             params) -> bool:
    if not tpu_kernels_available():
        return False
    if not getattr(env, "tile_safe_drift", False):
        return False
    m = trees.batch_shape[-1]
    n = trees.max_nodes
    if n > DEEP_MAX_NODES:
        return False
    # VMEM gate (applies at every N — the rolled path is the default): the
    # kernel keeps 2 tree streams (m, n, SUBLANES, LANE) resident (the stack
    # eval reads no child indices) plus the stack-plane scratch. At 32
    # sublanes a row is 16 KB — 4x the SR deep kernel's 8-sublane rows, so
    # the SR m*n<=512 cap would admit ~24 MB of tree streams against the
    # ~16 MB VMEM budget. Keep streams+scratch under 10 MB, leaving headroom
    # for the state/staging tiles.
    row_bytes = 32 * 128 * 4
    if (2 * m * n + stack_planes(n)) * row_bytes > 10 * 2**20:
        return False
    # scalars / per-trajectory (B,) / per-save-point series (B, T) — series
    # stream into the kernel and are linearly interpolated at stage times
    leaves = jax.tree_util.tree_leaves(params)
    return all(getattr(p, "ndim", 0) <= 2 for p in leaves)


def stage_times(ts: Array, substeps: int, method: str) -> Array:
    """(T-1, substeps, n_stages) solver times of every drift evaluation.

    Computed with the EXACT f32 expressions of ``integrators._STEPPERS``
    (``t0 + i*dt`` then ``t + c*dt``), so ``fold_in(key, bitcast(t))`` noise
    precomputed at these times bit-matches the general scan path's draws.
    """
    offs = jnp.asarray([c for c, _w in _RK_TABLES[method][0]], jnp.float32)
    t0, t1 = ts[:-1], ts[1:]
    dtv = (t1 - t0) / substeps
    tb = t0[:, None] + jnp.arange(substeps, dtype=jnp.float32)[None, :] * dtv[:, None]
    return tb[:, :, None] + offs[None, None, :] * dtv[:, None, None]


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
    obs_noise_rows: Array | None = None,
    process_noise_rows: Array | None = None,
    stream_controls: bool = False,
) -> Tuple[Array, ...]:
    """Fused closed-loop rollout. trees batched ``(P, m)``; ``x0 (B, latent)``;
    ``targets (B, n_targets)``; params: pytree of per-trajectory scalars
    ``(B,)`` / python scalars / per-save-point series ``(B, T)``.
    ``obs_noise_rows`` (optional) carries the pre-scaled observation-noise
    draws ``obs_noise_at(key, tau) @ W`` for every stage time of
    :func:`stage_times`, laid out ``(T, B, substeps * n_stages * n_obs)``
    with row ``t`` holding interval ``[ts[t], ts[t+1])`` (row ``T-1``:
    save-time slot only); the evaluators build it so the kernel reproduces
    the general path's deterministic noise exactly. Returns ``(xas (T, P, B,
    latent+state_size), alive (T, P, B))``; with ``stream_controls=True``
    the kernel ALSO evaluates the post-hoc replay's controls at every save
    point (save-time observation noise, real observations — reference
    feedforward :96-97 / dynamic :99-101) and streams them out with the
    states: returns ``(xas, us (T, P, B, n_control), alive)``, making the
    separate replay interpreter pass unnecessary (measured 45% of the
    policy evaluation wall-clock at pop 4096). Differentiable via
    unfused-recompute VJP is NOT wired here — the policy evaluators only use
    this path outside gradient contexts (constant optimisation routes through
    the general path)."""
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

    # Rolled-row eval (windowed gather + per-tile dynamic row start over
    # size-sorted lanes) is the DEFAULT for all N: the dynamic start skips
    # the all-padding row prefix, so each tile pays ~max-used-size rows
    # instead of N. Hardware A/B (r2, v5e, pop 4096): rolled 3.07e10 vs
    # unrolled 1.35e10 node-evals/s at N=32 (2.3x), 2.53e10 vs 1.31e10 at
    # the notebook config — the unrolled SSA ladder always pays all N rows.
    # x0/targets/params are per-trajectory (candidate-independent), so only
    # the trees permute in and the outputs permute back.
    # MTGP_POLICY_UNROLLED=1 restores the fully-unrolled ladder for A/B
    # (shallow N only); MTGP_POLICY_FORCE_DEEP is accepted but redundant.
    import os

    deep = (n > UNROLL_MAX_NODES
            or os.environ.get("MTGP_POLICY_UNROLLED") != "1")
    inv_order = None
    if deep:
        trees, _order, inv_order = size_sort_candidates(trees)

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
    time_varying = any(getattr(v, "ndim", 0) >= 2 for v in leaves) and t_steps > 1
    obs_noise = obs_noise_rows is not None and t_steps > 1
    process_noise = process_noise_rows is not None and t_steps > 1
    if process_noise and method != "euler":
        raise ValueError("process noise requires Euler stepping (integrate_sde)")
    streamed = time_varying or obs_noise or process_noise
    if streamed:
        # per-save-point rows (T, B) per leaf: (B, T) series transpose,
        # constants broadcast — the kernel interpolates between rows in VMEM.
        # Obs-noise rows (exact stage-time draws, ``obs_noise_rows`` layout)
        # ride the same streamed block after the param rows.
        rows = [
            jnp.asarray(v, jnp.float32).T
            if getattr(v, "ndim", 0) == 2
            else jnp.broadcast_to(
                jnp.asarray(v, jnp.float32).reshape(-1)[:b], (t_steps, b)
            )
            for v in leaves
        ]
        par_src = (
            jnp.stack(rows, axis=-1) if rows else jnp.zeros((t_steps, b, 0))
        )  # (T, B, n_params)
        if obs_noise:
            par_src = jnp.concatenate(
                [par_src, jnp.asarray(obs_noise_rows, jnp.float32)], axis=-1
            )
        if process_noise:
            par_src = jnp.concatenate(
                [par_src, jnp.asarray(process_noise_rows, jnp.float32)], axis=-1
            )
        par_l = jax.vmap(prep_b)(par_src)  # (T, rows, grid, S, L)
    else:
        leaves_b = [jnp.broadcast_to(jnp.asarray(v, jnp.float32), (b,)) for v in leaves]
        par_src = jnp.stack(leaves_b, axis=-1) if leaves_b else jnp.zeros((b, 1))
        par_l = prep_b(par_src)

    if stream_controls and t_steps <= 1:
        # a single save point has no interval rows to carry the save-time
        # noise draw; ValueError routes the evaluator to the general path
        raise ValueError("stream_controls needs >= 2 save points")
    n_control = m - state_size
    out_rows = d_aug + (n_control if stream_controls else 0)
    kernel = _make_policy_kernel(
        env, fset, n, m, latent, state_size, n_targets, treedef,
        len(leaves), t_steps, substeps, dt, method, streamed, obs_noise,
        process_noise, deep=deep, stream_controls=stream_controls,
    )

    tree_spec = pl.BlockSpec(
        (m, n, 1, SUBLANES, LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    vec_spec = lambda k: pl.BlockSpec(
        (k, 1, SUBLANES, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    # streamed exogenous rows (time-varying params / obs noise) stay in HBM
    # (full (T, rows, ...) array) and stream through a 2-slot VMEM staging
    # tile; constant params are one VMEM-resident row
    par_spec = (
        pl.BlockSpec(memory_space=pl.ANY)
        if streamed
        else vec_spec(par_l.shape[0])
    )
    scratch = [
        pltpu.VMEM((d_aug, SUBLANES, LANE), jnp.float32),
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),
        pltpu.VMEM((2, out_rows, SUBLANES, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if streamed:
        scratch += [
            pltpu.VMEM((2, par_l.shape[1], SUBLANES, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if m >= 2 or deep:  # tree-eval results scratch (kernel roll_trees flag)
        scratch += [pltpu.VMEM((m, SUBLANES, LANE), jnp.float32)]
    if deep:
        row_trips, start_rows = deep_tile_scalars(
            trees, fset.slots, b, TILE, grid, lp
        )
        in_specs = [
            tree_spec, tree_spec,
            vec_spec(d_aug), vec_spec(tgt_l.shape[0]), par_spec,
            pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # per-row ladder trips
            pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ]
        operands = [ops_l, const_l, x0_l, tgt_l, par_l, row_trips,
                    start_rows]
        scratch += [
            pltpu.VMEM((stack_planes(n), SUBLANES, LANE), jnp.float32),
            pltpu.VMEM((SUBLANES, LANE), jnp.int32),  # sp_scr
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # top_scr
            pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # ysel_scr
        ]
    else:
        in_specs = [
            tree_spec, tree_spec, tree_spec,
            vec_spec(d_aug), vec_spec(tgt_l.shape[0]), par_spec,
        ]
        operands = [ops_l, c2_l, const_l, x0_l, tgt_l, par_l]
    xs, alive = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            # full trajectory stays in HBM; the kernel DMAs one save row at a
            # time from a double-buffered VMEM staging tile
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, SUBLANES, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, out_rows, grid, SUBLANES, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUBLANES, LANE), jnp.float32),
        ),
        scratch_shapes=scratch,
    )(*operands)

    xs = xs.reshape(t_steps, out_rows, lp)[:, :, :lanes].reshape(
        t_steps, out_rows, p, b
    )
    xs = jnp.moveaxis(xs, 1, -1)  # (T, P, B, out_rows)
    alive_cnt = alive.reshape(lp)[:lanes].reshape(p, b)
    if inv_order is not None:  # undo the size-sort lane permutation
        xs = xs[:, inv_order]
        alive_cnt = alive_cnt[inv_order]
    # the kernel emits the COUNT of alive save rows; liveness is monotone, so
    # save t is alive iff t < count — exactly the general path's per-save mask
    alive_t = (
        jnp.arange(t_steps, dtype=jnp.float32)[:, None, None] < alive_cnt[None]
    )
    if stream_controls:
        return xs[..., :d_aug], xs[..., d_aug:], alive_t
    return xs, alive_t


def _make_adaptive_policy_kernel(env, fset: FunctionSet, n: int, m: int,
                                 latent: int, state_size: int,
                                 n_targets: int, params_treedef,
                                 n_params: int, t_steps: int, rtol: float,
                                 atol: float, max_steps: int, method: str,
                                 safety: float, stream_controls: bool):
    """Adaptive (embedded RK + per-lane PID step control) twin of
    :func:`_make_policy_kernel` — the fused path for the policy notebooks'
    ACTUAL solver configuration (``StaticPolicy.ipynb`` cell 4:
    ``Dopri5 + PIDController(atol=1e-4, rtol=1e-4)``,
    ``feedforward_evaluate.py:11``). Per-interval budget structure (the
    per-interval SR adaptive kernel's controller, expression-for-expression
    ``integrators.integrate_adaptive`` incl. the ``cond_alive``
    step-REJECTION semantics), so saves stay synchronized tile-wide and the
    fixed-step kernel's double-buffered HBM staging works unchanged. NB the
    per-interval structure is also the CHEAPER static spin count here:
    Mosaic predicates budget loops (results_r4/mosaic_branch_probe.txt), and
    (T-1) * max_steps(16) < the reference's whole-solve max_steps=1000 at
    the notebook shapes.

    Constant params only, no observation/process noise (their draws are
    deterministic in SOLVER time, which is data-dependent under PID — they
    cannot be precomputed and streamed; noisy configs keep the general
    path). Deep (rolled stack-machine) tree eval only — the policy default.
    """
    import os

    from ..models.integrators import _BS_A, _BS_B_LOW, _DP_A, _DP_B4, _DP_B5

    if method not in ("bosh3", "dopri5"):
        raise ValueError(f"unknown adaptive method: {method!r}")
    err_exponent = -1.0 / 3.0 if method == "bosh3" else -0.2
    dt_reset = os.environ.get("MTGP_ADAPTIVE_DT_RESET") == "1"
    fsal = (os.environ.get("MTGP_ADAPTIVE_NO_FSAL") != "1"
            and os.environ.get("MTGP_ADAPTIVE_FSAL", "1") == "1")
    eval_deep = _make_deep_tree_eval(fset, n, SUBLANES)
    n_control = m - state_size
    d_aug = latent + state_size
    dynamic = state_size > 0
    n_obs = env.n_obs

    def kernel(ops_ref, const_ref, x0_ref, tgt_ref, par_ref, ts_ref,
               depth_ref, start_ref, xs_ref, alive_ref, steps_ref, x_scr,
               live_scr, stage_ref, sem, tree_scr, planes_scr, sp_scr,
               top_scr, ysel_scr, t_scr, dt_scr, k1_scr, go_scr):
        gi = pl.program_id(0)
        zero = jnp.zeros((SUBLANES, LANE), jnp.float32)

        def copy_out(t_row, slot):
            return pltpu.make_async_copy(
                stage_ref.at[slot], xs_ref.at[t_row, :, gi], sem.at[slot]
            )

        def trees_eval(first, count, data_tiles, out_base):
            def body(ci, _):
                mi = first + ci
                eval_deep(
                    _RefRows(ops_ref, mi), _RefRows(const_ref, mi),
                    data_tiles, planes_scr, sp_scr, top_scr, ysel_scr,
                    start=start_ref[0, mi, 0],
                    depth_cap=lambda i, mi=mi: depth_ref[0, mi, i],
                )
                tree_scr[out_base + ci] = ysel_scr[...]
                return 0

            jax.lax.fori_loop(0, count, body, 0)
            return [tree_scr[out_base + i] for i in range(count)]

        tgt = [tgt_ref[i, 0] for i in range(n_targets)]
        params_const = jax.tree_util.tree_unflatten(
            params_treedef, [par_ref[i, 0] for i in range(n_params)]
        )

        def save_u(x_tiles):
            """Controls at a SAVE point (the replay's semantics, noise-free:
            real observations fed to the trees; dynamic readout zero-feeds
            only u — reference feedforward :96-97 / dynamic :99-101)."""
            x_stack = jnp.stack(x_tiles[:latent])
            y = env.obs_tiles(x_stack)
            y_tiles = [y[i] for i in range(n_obs)]
            if dynamic:
                a = x_tiles[latent:]
                data_r = y_tiles + a + [zero] * n_control + tgt
                return trees_eval(state_size, n_control, data_r, 0)
            return trees_eval(0, n_control, y_tiles + tgt, 0)

        def drift(x_tiles):
            x_stack = jnp.stack(x_tiles[:latent])
            y = env.obs_tiles(x_stack)  # (n_obs, S, 128)
            y_tiles = [y[i] for i in range(n_obs)]
            if dynamic:
                a = x_tiles[latent:]
                data_r = [zero] * n_obs + a + [zero] * n_control + tgt
                u = trees_eval(state_size, n_control, data_r, 0)
            else:
                u = trees_eval(0, n_control, y_tiles + tgt, 0)
            u_stack = jnp.stack(u)
            dx = env.drift(jnp.float32(0.0), x_stack, u_stack, params_const)
            out = [dx[i] for i in range(latent)]
            if dynamic:
                data_s = y_tiles + a + u + tgt
                out += trees_eval(0, state_size, data_s, n_control)
            return out

        def finite_tiles(x_tiles):
            """integrators._finite over the stacked tiles (NO cond_alive —
            the adaptive path uses cond to REJECT steps, not to flag
            divergence; see integrate_adaptive's body)."""
            good = None
            for xt in x_tiles:
                g = jnp.isfinite(xt) & (jnp.abs(xt) < DIVERGENCE_BOUND)
                good = g if good is None else (good & g)
            return good

        def cond_tile(x_tiles):
            return env.cond_alive(jnp.float32(0.0), jnp.stack(x_tiles[:latent]))

        def rk_step(x, dt_c):
            """Embedded pair, expression-for-expression
            integrate_adaptive's rk_step_{bosh3,dopri5} (err mean over the
            full augmented state)."""
            if method == "bosh3":
                k1 = ([k1_scr[i] for i in range(d_aug)] if fsal else drift(x))
                k2 = drift([x[i] + 0.5 * dt_c * k1[i] for i in range(d_aug)])
                k3 = drift([x[i] + 0.75 * dt_c * k2[i] for i in range(d_aug)])
                x_hi = [
                    x[i] + dt_c * (_BS_A[2][0] * k1[i] + _BS_A[2][1] * k2[i]
                                   + _BS_A[2][2] * k3[i])
                    for i in range(d_aug)
                ]
                k4 = drift(x_hi)
                x_lo = [
                    x[i] + dt_c * (_BS_B_LOW[0] * k1[i] + _BS_B_LOW[1] * k2[i]
                                   + _BS_B_LOW[2] * k3[i] + _BS_B_LOW[3] * k4[i])
                    for i in range(d_aug)
                ]
                k_last = k4
            else:  # dopri5
                ks = [[k1_scr[i] for i in range(d_aug)] if fsal else drift(x)]
                for ai in _DP_A:
                    xi = [
                        x[i] + dt_c * sum(a * k[i] for a, k in zip(ai, ks))
                        for i in range(d_aug)
                    ]
                    ks.append(drift(xi))
                x_hi = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B5, ks))
                    for i in range(d_aug)
                ]
                x_lo = [
                    x[i] + dt_c * sum(b * k[i] for b, k in zip(_DP_B4, ks))
                    for i in range(d_aug)
                ]
                k_last = ks[6]
            acc = jnp.zeros((SUBLANES, LANE), jnp.float32)
            for i in range(d_aug):
                scale = atol + rtol * jnp.maximum(jnp.abs(x[i]), jnp.abs(x_hi[i]))
                r = (x_hi[i] - x_lo[i]) / scale
                acc = acc + r * r
            err_norm = jnp.sqrt(acc * (1.0 / d_aug))
            return x_hi, err_norm, k_last

        x = [x0_ref[i, 0] for i in range(d_aug)]
        live_scr[...] = (finite_tiles(x) & cond_tile(x)).astype(jnp.float32)
        for i in range(d_aug):
            x_scr[i] = x[i]
            stage_ref[0, i] = x[i]
        if stream_controls:
            u0 = save_u(x)
            for j in range(n_control):
                stage_ref[0, d_aug + j] = u0[j]
        copy_out(0, 0).start()
        alive_ref[0] = live_scr[...]
        steps_ref[0] = zero  # per-LANE attempted-step telemetry (bench)
        if fsal and t_steps > 1:
            k1 = drift(x)
            for i in range(d_aug):
                k1_scr[i] = k1[i]
        if not dt_reset and t_steps > 1:
            dt_scr[...] = zero + (ts_ref[1] - ts_ref[0]) / 4.0

        def save_step(ti, _):
            t0 = ts_ref[ti]
            t1 = ts_ref[ti + 1]
            span = t1 - t0
            t_scr[...] = zero + t0
            if dt_reset:
                dt_scr[...] = zero + span / 4.0
            else:
                dt_scr[...] = jnp.clip(dt_scr[...], span * 1e-3, span)

            def step(_s, _c):
                t = t_scr[...]
                dt = dt_scr[...]
                alive = live_scr[...] > 0.5
                x = [x_scr[i] for i in range(d_aug)]
                active = alive & (t < t1 - 1e-12)
                dt_c = jnp.minimum(dt, t1 - t)
                x_hi, err, k_last = rk_step(x, dt_c)
                ok = finite_tiles(x_hi) & jnp.isfinite(err)
                # cond_alive REJECTS the step (integrate_adaptive's accept)
                accept = active & ok & (err <= 1.0) & cond_tile(x_hi)
                for i in range(d_aug):
                    x_scr[i] = jnp.where(accept, x_hi[i], x[i])
                if fsal:
                    for i in range(d_aug):
                        k1_scr[i] = jnp.where(accept, k_last[i], k1_scr[i])
                t_scr[...] = jnp.where(accept, t + dt_c, t)
                factor = jnp.where(
                    jnp.isfinite(err) & (err > 0.0),
                    jnp.clip(safety * err ** err_exponent, 0.2, 5.0),
                    jnp.where(ok, 5.0, 0.2),
                )
                dt_scr[...] = jnp.where(
                    active, jnp.clip(dt_c * factor, span * 1e-3, span), dt
                )
                live_scr[...] = (
                    alive & (ok | ~active | (dt_c > span * 1.5e-3))
                ).astype(jnp.float32)
                steps_ref[0] = steps_ref[0] + active.astype(jnp.float32)
                return 0

            # early-exit via pl.when on an SMEM scalar: Mosaic PREDICATES
            # (never skips — probe afdd2e8 class result), the wrapper is
            # kept for its measured ~14% and bit-exactness
            def w_body(s, _):
                @pl.when(go_scr[0] > 0)
                def _():
                    step(s, 0)
                    go_scr[0] = jnp.any(
                        (live_scr[...] > 0.5) & (t_scr[...] < t1 - 1e-12)
                    ).astype(jnp.int32)
                return 0

            go_scr[0] = jnp.any(
                (live_scr[...] > 0.5) & (t_scr[...] < t1 - 1e-12)
            ).astype(jnp.int32)
            jax.lax.fori_loop(0, max_steps, w_body, 0, unroll=False)
            # lanes that never reached t1 ran out of steps -> dead
            reached = t_scr[...] >= t1 - 1e-9 * jnp.maximum(jnp.abs(t1), 1.0)
            live_scr[...] = ((live_scr[...] > 0.5) & reached).astype(jnp.float32)

            x = [x_scr[i] for i in range(d_aug)]
            slot = (ti + 1) % 2

            @pl.when(ti >= 1)
            def _():
                copy_out(ti - 1, slot).wait()

            for i in range(d_aug):
                stage_ref[slot, i] = x[i]
            if stream_controls:
                u = save_u(x)
                for j in range(n_control):
                    stage_ref[slot, d_aug + j] = u[j]
            copy_out(ti + 1, slot).start()
            alive_ref[0] = alive_ref[0] + live_scr[...]
            return 0

        jax.lax.fori_loop(0, t_steps - 1, save_step, 0, unroll=False)
        copy_out(t_steps - 1, (t_steps - 1) % 2).wait()
        if t_steps >= 2:
            copy_out(t_steps - 2, (t_steps - 2) % 2).wait()

    return kernel


def policy_adaptive_rollout_available(env, fset: FunctionSet,
                                      trees: TreeTensors, params) -> bool:
    """Gate for the fused ADAPTIVE policy rollout: the fixed-step gate plus
    constant params only (per-lane solver times make series interpolation a
    parity hazard — general path covers it) and no observation noise
    (draws are deterministic in data-dependent solver time; cannot be
    precomputed/streamed)."""
    if not policy_rollout_available(env, fset, trees, params):
        return False
    if getattr(env, "obs_noise", 0.0) != 0.0:
        return False
    leaves = jax.tree_util.tree_leaves(params)
    return all(getattr(p, "ndim", 0) <= 1 for p in leaves)


def rollout_policy_adaptive_pallas(
    trees: TreeTensors,
    x0: Array,
    ts: Array,
    targets: Array,
    params,
    env,
    fset: FunctionSet,
    rtol: float = 1e-4,
    atol: float = 1e-4,
    max_steps: int = 16,
    method: str = "dopri5",
    safety: float = 0.9,
    state_size: int = 0,
    stream_controls: bool = False,
    return_steps: bool = False,
) -> Tuple[Array, ...]:
    """Fused closed-loop ADAPTIVE rollout (Dopri5/Bosh3 + per-lane PID) —
    the policy notebooks' solver configuration
    (``StaticPolicy.ipynb`` cell 4, ``feedforward_evaluate.py:11``),
    semantics of ``integrators.integrate_adaptive(cond_alive=...)``. Same
    outputs as :func:`rollout_policy_pallas`. Callers gate on
    :func:`policy_adaptive_rollout_available` (constant params, no noise)."""
    p, m = trees.batch_shape
    b, latent = x0.shape
    n = trees.max_nodes
    t_steps = ts.shape[0]
    if isinstance(ts, jax.core.Tracer):
        raise ValueError("fused adaptive policy rollout needs a concrete time grid")

    lanes = p * b
    pad = (-lanes) % TILE
    lp = lanes + pad
    grid = lp // TILE
    d_aug = latent + state_size
    n_targets = targets.shape[-1]

    trees, _order, inv_order = size_sort_candidates(trees)

    def prep_tree(x, dtype):
        xt = jnp.moveaxis(x, 0, -1)  # (m, N, P)
        xt = jnp.broadcast_to(xt[..., None], (m, n, p, b)).reshape(m, n, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, pad))) if pad else xt
        return xt.astype(dtype).reshape(m, n, grid, SUBLANES, LANE)

    def prep_b(x):  # (B, k) -> (k, grid, S, L)
        k = x.shape[-1]
        xt = jnp.broadcast_to(x.T[:, None, :], (k, p, b)).reshape(k, lanes)
        xt = jnp.pad(xt, ((0, 0), (0, pad))) if pad else xt
        return xt.astype(jnp.float32).reshape(k, grid, SUBLANES, LANE)

    ops_l = prep_tree(trees.ops, jnp.int32)
    const_l = prep_tree(trees.const, jnp.float32)

    xa0 = jnp.concatenate([x0, jnp.zeros((b, state_size))], axis=-1)
    x0_l = prep_b(xa0)
    tgt_src = targets if n_targets else jnp.zeros((b, 1))
    tgt_l = prep_b(tgt_src)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    if any(getattr(v, "ndim", 0) >= 2 for v in leaves):
        raise ValueError("fused adaptive policy rollout: constant params only")
    leaves_b = [jnp.broadcast_to(jnp.asarray(v, jnp.float32), (b,)) for v in leaves]
    par_src = jnp.stack(leaves_b, axis=-1) if leaves_b else jnp.zeros((b, 1))
    par_l = prep_b(par_src)

    n_control = m - state_size
    out_rows = d_aug + (n_control if stream_controls else 0)
    kernel = _make_adaptive_policy_kernel(
        env, fset, n, m, latent, state_size, n_targets, treedef, len(leaves),
        t_steps, rtol, atol, max_steps, method, safety, stream_controls,
    )

    tree_spec = pl.BlockSpec(
        (m, n, 1, SUBLANES, LANE), lambda i: (0, 0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vec_spec = lambda k: pl.BlockSpec(
        (k, 1, SUBLANES, LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    row_trips, start_rows = deep_tile_scalars(
        trees, fset.slots, b, TILE, grid, lp
    )
    in_specs = [
        tree_spec, tree_spec,
        vec_spec(d_aug), vec_spec(tgt_l.shape[0]), vec_spec(par_l.shape[0]),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # ts (T,)
        pl.BlockSpec((1, m, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, m, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    operands = [ops_l, const_l, x0_l, tgt_l, par_l,
                jnp.asarray(ts, jnp.float32), row_trips, start_rows]
    scratch = [
        pltpu.VMEM((d_aug, SUBLANES, LANE), jnp.float32),  # x_scr
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # live_scr
        pltpu.VMEM((2, out_rows, SUBLANES, LANE), jnp.float32),  # stage
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.VMEM((m, SUBLANES, LANE), jnp.float32),  # tree_scr
        pltpu.VMEM((stack_planes(n), SUBLANES, LANE), jnp.float32),
        pltpu.VMEM((SUBLANES, LANE), jnp.int32),  # sp_scr
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # top_scr
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # ysel_scr
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # t_scr
        pltpu.VMEM((SUBLANES, LANE), jnp.float32),  # dt_scr
        pltpu.VMEM((d_aug, SUBLANES, LANE), jnp.float32),  # k1_scr
        pltpu.SMEM((1,), jnp.int32),  # go_scr
    ]
    lane_out = pl.BlockSpec((1, SUBLANES, LANE), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    xs, alive, steps = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY), lane_out, lane_out),
        out_shape=(
            jax.ShapeDtypeStruct(
                (t_steps, out_rows, grid, SUBLANES, LANE), jnp.float32
            ),
            jax.ShapeDtypeStruct((grid, SUBLANES, LANE), jnp.float32),
            jax.ShapeDtypeStruct((grid, SUBLANES, LANE), jnp.float32),
        ),
        scratch_shapes=scratch,
    )(*operands)

    xs = xs.reshape(t_steps, out_rows, lp)[:, :, :lanes].reshape(
        t_steps, out_rows, p, b
    )
    xs = jnp.moveaxis(xs, 1, -1)  # (T, P, B, out_rows)
    alive_cnt = alive.reshape(lp)[:lanes].reshape(p, b)
    xs = xs[:, inv_order]
    alive_cnt = alive_cnt[inv_order]
    alive_t = (
        jnp.arange(t_steps, dtype=jnp.float32)[:, None, None] < alive_cnt[None]
    )
    out = ((xs[..., :d_aug], xs[..., d_aug:], alive_t) if stream_controls
           else (xs, alive_t))
    if return_steps:
        # per-tile attempted embedded steps (max over lanes = the tile's
        # executed trip count) — bench/profiling telemetry
        return out + (steps.max(axis=(1, 2)),)
    return out
