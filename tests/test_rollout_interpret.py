"""SR fitness-fused kernel vs the general path — CPU interpret mode, exact.

``rollout_sr_fitness_pallas`` accumulates the MSE in-kernel (the trajectory
never reaches HBM); this pins its per-lane error sums and liveness against
the ladder rollout + host reduction it replaces.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

try:
    from jax.experimental.pallas import tpu as pltpu

    HAS_INTERPRET = hasattr(pltpu, "force_tpu_interpret_mode")
except Exception:  # pragma: no cover
    HAS_INTERPRET = False

pytestmark = pytest.mark.skipif(
    not HAS_INTERPRET, reason="needs pallas TPU interpret mode"
)


def test_fitness_kernel_matches_general():
    from multitreegp_tpu.core.pallas_rollout import rollout_sr_fitness_pallas
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    x0s, _, ys, keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    p, b, d = 8, 4, 2
    with pltpu.force_tpu_interpret_mode():
        mse, alive = rollout_sr_fitness_pallas(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset, substeps=2
        )
    ev = SREvaluator(fset, substeps=2, interpreter="ladder")
    xs, alive_l = ev._rollout(pop, x0s, ts, keys)
    err = np.asarray(xs) - np.asarray(jnp.transpose(ys, (1, 0, 2)))[:, None]
    mse_ref = np.mean(np.sum(err**2, axis=-1), axis=0)
    af, al = np.asarray(alive), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    dd = np.abs(np.asarray(mse)[m] - mse_ref[m]) / (np.abs(mse_ref[m]) + 1e-9)
    assert dd.max() < 1e-5, dd.max()


def test_trajectory_kernel_matches_ladder_rollout():
    """``rollout_sr_pallas`` (trajectory variant, HBM-streamed save rows) vs
    the ladder scan rollout — exact on live lanes, liveness masks equal."""
    from multitreegp_tpu.core.pallas_rollout import rollout_sr_pallas
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    x0s, _, _ys, keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    p, b, d = 8, 4, 2
    with pltpu.force_tpu_interpret_mode():
        xs_k, alive_k = rollout_sr_pallas(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, fset, substeps=2
        )
    ev = SREvaluator(fset, substeps=2, interpreter="ladder")
    xs, alive_l = ev._rollout(pop, x0s, ts, keys)
    ak, al = np.asarray(alive_k[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(ak, al)
    live = ak & al
    diff = np.abs(np.asarray(xs_k) - np.asarray(xs))[:, live]
    assert diff.max() < 1e-5, diff.max()


def test_fitness_kernel_sde_matches_integrate_sde():
    """SR SDE variant: exact integrate_sde V dW kicks streamed with the
    ground truth -> parity with the general Euler-Maruyama path."""
    from multitreegp_tpu.core.pallas_rollout import rollout_sr_fitness_pallas
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.models.evaluators.noise import make_sr_kick_rows
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)], [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    x0s, _, ys, keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    p, b, d = 8, 4, 2
    pn = 0.15
    kicks = make_sr_kick_rows(pn, ts, keys, 2, d)
    with pltpu.force_tpu_interpret_mode():
        mse, alive = rollout_sr_fitness_pallas(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset,
            substeps=2, method="euler", process_noise_rows=kicks,
        )
    ev = SREvaluator(fset, substeps=2, interpreter="ladder", process_noise=pn)
    xs, alive_l = ev._rollout(pop, x0s, ts, keys)
    err = np.asarray(xs) - np.asarray(jnp.transpose(ys, (1, 0, 2)))[:, None]
    mse_ref = np.mean(np.sum(err**2, axis=-1), axis=0)
    af, al = np.asarray(alive), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    dd = np.abs(np.asarray(mse)[m] - mse_ref[m]) / (np.abs(mse_ref[m]) + 1e-9)
    assert dd.max() < 1e-5, dd.max()


def test_deep_fitness_kernel_matches_general(monkeypatch):
    """Deep-tree fitness kernel (stack machine, rolled rows) vs the ladder
    rollout — exact. Interpret mode is too slow for real N>64 shapes, so the
    deep path is engaged at N=16 by shrinking the unroll gate; the grown
    population must include multi-level trees so the plane ladder (stack
    depth >= 3) actually executes."""
    import numpy as _np

    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    monkeypatch.setattr(prl, "UNROLL_MAX_NODES", 8)

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.6, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(3), 4)
    ar = _np.asarray(fset.slots)[_np.asarray(pop.ops)] * (
        _np.asarray(pop.ops) != 0
    )
    depth = _np.cumsum(
        _np.where(_np.asarray(pop.ops) == 0, 0, 1 - ar), axis=-1
    ).max()
    assert depth >= 3, "population too shallow to exercise the plane ladder"
    p, b, d = 4, 2, 2
    with pltpu.force_tpu_interpret_mode():
        mse, alive = prl.rollout_sr_fitness_pallas(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset,
            substeps=1,
        )
    ev = SREvaluator(fset, substeps=1, interpreter="ladder")
    xs, alive_l = ev._rollout(pop, x0s, ts, keys)
    err = np.asarray(xs) - np.asarray(jnp.transpose(ys, (1, 0, 2)))[:, None]
    mse_ref = np.mean(np.sum(err**2, axis=-1), axis=0)
    af, al = np.asarray(alive), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    mask = af & al
    dd = np.abs(np.asarray(mse)[mask] - mse_ref[mask]) / (np.abs(mse_ref[mask]) + 1e-9)
    assert dd.max() < 1e-5, dd.max()


def test_interpreter_rolled_kernel_windowed_gather(monkeypatch):
    """Per-call interpreter kernels (rolled forward for N > unroll gate, and
    the backward reverse-sweep) with the windowed gather + far fallback:
    exact vs the ladder XLA path and its AD. Window shrunk so both gather
    paths execute."""
    from multitreegp_tpu.core import pallas_interpreter as pi
    from multitreegp_tpu.core.interpreter import evaluate_trees_ladder
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.ops.initialization import make_population_sampler

    monkeypatch.setattr(pi, "UNROLL_MAX_NODES", 8)
    monkeypatch.setattr(pi, "GATHER_WINDOW", 3)

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("sin", jnp.sin, 1, 0.2)],
        [["x0", "x1"]], [2],
    )
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(5), 6)
    from multitreegp_tpu.core.pallas_rollout import far_link_rows

    assert bool(far_link_rows(pop, window=3).any()), "need far links"
    data = jr.normal(jr.PRNGKey(6), (6, 2, 2))

    want = evaluate_trees_ladder(pop, data, fset)
    with pltpu.force_tpu_interpret_mode():
        got = pi.evaluate_trees_pallas(pop, data, fset)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )

    # backward: d(sum of finite roots)/dconst and /ddata
    def loss_ladder(const, d):
        out = evaluate_trees_ladder(pop._replace(const=const), d, fset)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    def loss_kernel(const, d):
        out = pi.evaluate_trees_pallas(pop._replace(const=const), d, fset)
        return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

    gl_c, gl_d = jax.grad(loss_ladder, argnums=(0, 1))(pop.const, data)
    with pltpu.force_tpu_interpret_mode():
        gk_c, gk_d = jax.grad(loss_kernel, argnums=(0, 1))(pop.const, data)
    np.testing.assert_allclose(np.asarray(gk_c), np.asarray(gl_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_d), np.asarray(gl_d),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("adaptive_method", ["bosh3", "dopri5"])
def test_adaptive_fitness_kernel_matches_general(adaptive_method):
    """Fused adaptive (embedded RK + per-lane PID step control + in-kernel
    MSE) vs the general integrate_adaptive path through the evaluator: the
    kernel mirrors integrate_adaptive's expressions, so short-horizon parity
    is ~fp-exact. Runs the REAL kernel in interpret mode; max-steps budget
    kept small (substeps=8) so some lanes exercise the out-of-steps death."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.6, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(3), 4)
    p, b, d = 4, 2, 2

    with pltpu.force_tpu_interpret_mode():
        assert prl.adaptive_rollout_available(fset, pop, d)
        mse, alive = prl.rollout_sr_fitness_adaptive_pallas(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset,
            rtol=1e-3, atol=1e-5, max_steps=8, method=adaptive_method,
        )
        # controller-effort telemetry: same fitness, plus per-tile attempted
        # step counts in [intervals, intervals * max_steps]
        mse_s, alive_s, steps = prl.adaptive_solver_stats(
            pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset,
            rtol=1e-3, atol=1e-5, max_steps=8, method=adaptive_method,
        )
        np.testing.assert_array_equal(np.asarray(mse_s), np.asarray(mse))
        np.testing.assert_array_equal(np.asarray(alive_s), np.asarray(alive))
        intervals = ts.shape[0] - 1
        st = np.asarray(steps)
        assert st.shape == (1,)  # 8 lanes -> one (8, 128) tile
        assert (st >= intervals).all() and (st <= intervals * 8).all(), st

    ev = SREvaluator(fset, substeps=8, method="adaptive", rtol=1e-3,
                     atol=1e-5, adaptive_method=adaptive_method,
                     interpreter="ladder")
    xs, alive_l = ev._rollout(pop, x0s, ts)
    err = np.asarray(xs) - np.asarray(jnp.transpose(ys, (1, 0, 2)))[:, None]
    mse_ref = np.mean(np.sum(err**2, axis=-1), axis=0)
    af, al = np.asarray(alive), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    mask = af & al
    dd = np.abs(np.asarray(mse)[mask] - mse_ref[mask]) / (
        np.abs(mse_ref[mask]) + 1e-9
    )
    assert dd.max() < 1e-4, dd.max()


@pytest.mark.parametrize("adaptive_method", ["bosh3", "dopri5"])
def test_adaptive_global_budget_matches_interval(adaptive_method):
    """The global-budget adaptive kernel (diffrax max_steps semantics: one
    budget for the whole solve, lanes cross saves asynchronously) must be
    BIT-identical to the per-interval kernel on every lane whose budgets
    never bind: same seed dt, same controller expressions with the lane's
    current interval span, save times snapped to the SMEM ts values. Dead
    lanes may differ in mse (the per-interval kernel keeps accumulating the
    frozen state's error; both mask them via alive) but not in aliveness."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.2, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(5), 4)
    x0 = jnp.broadcast_to(x0s[None], (4, 2, 2))
    per_interval = 32  # generous: no sound lane exhausts it

    with pltpu.force_tpu_interpret_mode():
        mse_i, alive_i = prl.rollout_sr_fitness_adaptive_pallas(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5,
            max_steps=per_interval, method=adaptive_method,
        )
        mse_g, alive_g = prl.rollout_sr_fitness_adaptive_global_pallas(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5,
            budget=per_interval * (ts.shape[0] - 1), method=adaptive_method,
        )
    np.testing.assert_array_equal(np.asarray(alive_g), np.asarray(alive_i))
    a = np.asarray(alive_i)
    np.testing.assert_array_equal(np.asarray(mse_g)[a], np.asarray(mse_i)[a])

    # budget-binding: with a tiny global budget every surviving lane must
    # have produced all its saves; lanes that ran out are dead. budget=5 is
    # strictly below the attainable minimum for BOTH methods (5 intervals
    # need >= 6 attempts even at dopri5's largest accepted steps: dt0=span/4
    # plus 5x growth gives 2 attempts for interval 1, then 1 per interval).
    with pltpu.force_tpu_interpret_mode():
        mse_t, alive_t = prl.rollout_sr_fitness_adaptive_global_pallas(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5,
            budget=5, method=adaptive_method,
        )
    at = np.asarray(alive_t)
    assert at.sum() < a.sum()  # the budget genuinely binds for some lanes
    assert np.isfinite(np.asarray(mse_t)[at]).all()


def test_adaptive_shallow_ladder_matches_stack(monkeypatch):
    """The adaptive kernel's two drift evals — the static-index pl.when
    ladder (shallow default at N <= UNROLL_MAX_NODES, r4) and the rolled
    stack machine — implement the same tree semantics with the same fp
    expressions, so the whole adaptive solve must agree BIT-exactly."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.8, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(7), 4)
    x0 = jnp.broadcast_to(x0s[None], (4, 2, 2))

    out = {}
    for mode in ("ladder", "stack"):
        monkeypatch.setenv("MTGP_ADAPTIVE_EVAL", mode)
        with pltpu.force_tpu_interpret_mode():
            out[mode] = prl.rollout_sr_fitness_adaptive_pallas(
                pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
                method="dopri5",
            )
    np.testing.assert_array_equal(np.asarray(out["ladder"][0]),
                                  np.asarray(out["stack"][0]))
    np.testing.assert_array_equal(np.asarray(out["ladder"][1]),
                                  np.asarray(out["stack"][1]))


@pytest.mark.parametrize("adaptive_method", ["bosh3", "dopri5"])
def test_adaptive_fsal_carry_bit_exact(adaptive_method, monkeypatch):
    """FSAL k1 carry vs per-attempt recompute must be BIT-identical: both
    tableaus evaluate their last stage at x_hi (dopri5 A row 7 == b5[:6]
    float-for-float), x only moves on accept, and on accept err finiteness
    forces the last k finite — so the carried k1 equals drift(x) exactly at
    every attempt. Long enough horizon that accepts, rejects, divergence
    death, and the cross-interval dt carry all occur."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.2, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(5), 4)
    x0 = jnp.broadcast_to(x0s[None], (4, 2, 2))

    out = {}
    for mode, env_val in [("fsal", "1"), ("recompute", "0")]:
        monkeypatch.setenv("MTGP_ADAPTIVE_FSAL", env_val)
        with pltpu.force_tpu_interpret_mode():
            out[mode] = prl.rollout_sr_fitness_adaptive_pallas(
                pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
                method=adaptive_method,
            )
    np.testing.assert_array_equal(np.asarray(out["fsal"][0]),
                                  np.asarray(out["recompute"][0]))
    np.testing.assert_array_equal(np.asarray(out["fsal"][1]),
                                  np.asarray(out["recompute"][1]))


def test_adaptive_fused_through_evaluator_interpret():
    """SREvaluator(method='adaptive', interpreter='pallas') must route
    through the fused adaptive kernel and agree with the ladder evaluator's
    fitness (same clamp/divergence semantics)."""
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.6, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(5), 4)

    ev_f = SREvaluator(fset, substeps=8, method="adaptive", rtol=1e-3,
                       atol=1e-5, interpreter="pallas")
    ev_l = SREvaluator(fset, substeps=8, method="adaptive", rtol=1e-3,
                       atol=1e-5, interpreter="ladder")
    with pltpu.force_tpu_interpret_mode():
        fit_f = np.asarray(ev_f.evaluate_population(pop, data))
    fit_l = np.asarray(ev_l.evaluate_population(pop, data))
    np.testing.assert_allclose(fit_f, fit_l, rtol=1e-4)


def test_fitness_kernel_skip_m1_matches_no_skip(monkeypatch):
    """ADVICE r2: the m==1 non-rolled shallow SKIP branch (pl.when
    padding-prefix gating) must be bit-exact vs the plain unrolled ladder
    (MTGP_SR_NO_SKIP=1) — both in interpret mode, on a 1-D environment so
    the per-tree roll path is NOT taken (roll_trees = m >= 2)."""
    from multitreegp_tpu.core.pallas_rollout import rollout_sr_fitness_pallas
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments.base import SREnvironmentBase
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    class Decay1D(SREnvironmentBase):
        def __init__(self):
            super().__init__(0.0, 0.0, n_var=1, n_obs=1)

        def sample_init_states(self, batch_size, key):
            return jr.uniform(key, (batch_size, 1), minval=0.5, maxval=1.5)

        def drift(self, t, x):
            return -0.5 * x

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)],
        [["x0"]], [1],
    )
    env = Decay1D()
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    assert pop.batch_shape[-1] == 1  # m == 1: non-rolled tree handling
    p, b, d = 8, 4, 1
    x0 = jnp.broadcast_to(x0s[None], (p, b, d))

    monkeypatch.delenv("MTGP_SR_NO_SKIP", raising=False)
    with pltpu.force_tpu_interpret_mode():
        mse_skip, alive_skip = rollout_sr_fitness_pallas(
            pop, x0, ts, ys, fset, substeps=2
        )
    monkeypatch.setenv("MTGP_SR_NO_SKIP", "1")
    with pltpu.force_tpu_interpret_mode():
        mse_ref, alive_ref = rollout_sr_fitness_pallas(
            pop, x0, ts, ys, fset, substeps=2
        )
    np.testing.assert_array_equal(np.asarray(alive_skip), np.asarray(alive_ref))
    np.testing.assert_array_equal(np.asarray(mse_skip), np.asarray(mse_ref))


def test_adaptive_probe_sort_exact(monkeypatch):
    """MTGP_ADAPTIVE_SORT=probe re-tiles lanes by measured controller effort
    (VERDICT r2 #6); per-lane results are order-independent, so fitness and
    liveness must be bit-exact vs the default size sort."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.8, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    x0s, _, ys, _keys = data
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(3), 4)
    p, b, d = 4, 2, 2
    x0 = jnp.broadcast_to(x0s[None], (p, b, d))

    monkeypatch.delenv("MTGP_ADAPTIVE_SORT", raising=False)
    with pltpu.force_tpu_interpret_mode():
        mse, alive = prl.rollout_sr_fitness_adaptive_pallas(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
            method="dopri5",
        )
        _, _, steps = prl.adaptive_solver_stats(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
            method="dopri5",
        )
    monkeypatch.setenv("MTGP_ADAPTIVE_SORT", "probe")
    with pltpu.force_tpu_interpret_mode():
        mse_p, alive_p = prl.rollout_sr_fitness_adaptive_pallas(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
            method="dopri5",
        )
        _, _, steps_p = prl.adaptive_solver_stats(
            pop, x0, ts, ys, fset, rtol=1e-3, atol=1e-5, max_steps=8,
            method="dopri5",
        )
    np.testing.assert_array_equal(np.asarray(mse_p), np.asarray(mse))
    np.testing.assert_array_equal(np.asarray(alive_p), np.asarray(alive))
    # probe accounting includes its own attempted steps: never free work
    intervals = ts.shape[0] - 1
    assert float(np.sum(np.asarray(steps_p))) >= intervals


@pytest.mark.parametrize("max_nodes", [16, 128])
def test_prepared_fitness_bit_matches_oneshot(max_nodes):
    """prepare_sr_fitness (the r5 split prepare/run API for chained evals)
    must be BIT-identical to rollout_sr_fitness_pallas on both the shallow
    unrolled kernel and the deep stack kernel, including after a constant
    update carried in SORTED order (the chained-eval contract), and its
    gradient must match the one-shot custom_vjp."""
    from multitreegp_tpu.core.pallas_rollout import (
        prepare_sr_fitness,
        rollout_sr_fitness_pallas,
    )
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    x0s, _, ys, _ = data
    depth = 3 if max_nodes == 16 else 6
    pop = make_population_sampler(fset, depth, max_nodes)(jr.PRNGKey(1), 8)
    p, b, d = 8, 4, 2
    x0 = jnp.broadcast_to(x0s[None], (p, b, d))

    with pltpu.force_tpu_interpret_mode():
        run, const0 = prepare_sr_fitness(pop, x0, ts, ys, fset, substeps=2)
        mse_p, alive_p = run(const0)
        mse_1, alive_1 = rollout_sr_fitness_pallas(
            pop, x0, ts, ys, fset, substeps=2
        )
        np.testing.assert_array_equal(np.asarray(mse_p), np.asarray(mse_1))
        np.testing.assert_array_equal(np.asarray(alive_p), np.asarray(alive_1))

        # chained-step contract: bump the SORTED constants and compare to the
        # one-shot API on the equivalently-bumped UNSORTED population
        const1 = const0 + 0.125
        mse_p2, _ = run(const1)
        mse_12, _ = rollout_sr_fitness_pallas(
            pop._replace(const=pop.const + 0.125), x0, ts, ys, fset, substeps=2
        )
        np.testing.assert_array_equal(np.asarray(mse_p2), np.asarray(mse_12))

        # gradients agree with the one-shot custom_vjp (both recompute via
        # the unfused path). Compare in the UNSORTED frame.
        g_p = jax.grad(lambda c: jnp.sum(run(c)[0]))(const0)
        g_1 = jax.grad(
            lambda c: jnp.sum(
                rollout_sr_fitness_pallas(
                    pop._replace(const=c), x0, ts, ys, fset, substeps=2
                )[0]
            )
        )(pop.const)
    from multitreegp_tpu.core.pallas_rollout import _fitness_prepare

    _, order, _ = _fitness_prepare(pop, x0, ts, ys, fset, 2, "rk4")
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_1)[np.asarray(order)], rtol=1e-6
    )


def test_prepare_chained_matches_evaluate_population():
    """SREvaluator.prepare_chained's step() must equal evaluate_population
    on the same constants, through the full fitness post-processing."""
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    ev = SREvaluator(fset, substeps=2)
    with pltpu.force_tpu_interpret_mode():
        prepared = ev.prepare_chained(pop, data)
        assert prepared is not None
        step, const0 = prepared
        fit_chained = step(const0)
        fit_full = ev.evaluate_population(pop, data)
    np.testing.assert_array_equal(
        np.asarray(fit_chained), np.asarray(fit_full)
    )
