"""Adaptive (PI-controlled embedded RK) integrator: accuracy vs analytic
solutions, divergence containment, and the SREvaluator adaptive path."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from multitreegp_tpu.models.integrators import integrate, integrate_adaptive


def test_adaptive_matches_exponential():
    """dx = -x integrates to x0 * exp(-t) within tolerance."""
    ts = jnp.arange(0.0, 3.01, 0.5)
    x0 = jnp.asarray([[1.0], [2.0], [-0.5]])
    xs, alive = integrate_adaptive(lambda t, x: -x, x0, ts, rtol=1e-5, atol=1e-8)
    want = np.asarray(x0)[None] * np.exp(-np.asarray(ts))[:, None, None]
    assert bool(alive.all())
    np.testing.assert_allclose(np.asarray(xs), want, rtol=1e-4, atol=1e-6)


def test_adaptive_harmonic_accuracy_beats_coarse_rk4():
    """On a stiff-ish oscillator the adaptive path beats 1-substep RK4."""
    w = 6.0
    drift = lambda t, x: jnp.stack([x[..., 1], -w * w * x[..., 0]], axis=-1)
    ts = jnp.arange(0.0, 2.01, 0.25)
    x0 = jnp.asarray([[1.0, 0.0]])
    want = np.stack(
        [np.cos(w * np.asarray(ts)), -w * np.sin(w * np.asarray(ts))], axis=-1
    )[:, None, :]

    xs_fix, _ = integrate(drift, x0, ts, method="rk4", substeps=1)
    xs_ad, alive = integrate_adaptive(drift, x0, ts, rtol=1e-6, atol=1e-8,
                                      max_steps_per_interval=256)
    assert bool(alive.all())
    err_fix = np.abs(np.asarray(xs_fix) - want).max()
    err_ad = np.abs(np.asarray(xs_ad) - want).max()
    assert err_ad < err_fix / 50
    assert err_ad < 1e-3


def test_adaptive_contains_divergence_per_lane():
    """One exploding lane dies; the healthy lane stays accurate."""
    drift = lambda t, x: jnp.square(x)  # dx = x^2 blows up at t = 1/x0
    ts = jnp.arange(0.0, 2.01, 0.25)
    x0 = jnp.asarray([[2.0], [0.1]])  # lane 0 explodes at t=0.5
    xs, alive = integrate_adaptive(drift, x0, ts, max_steps_per_interval=16)
    a = np.asarray(alive)
    assert not a[-1, 0], "exploding lane must be dead"
    assert a[-1, 1], "healthy lane must survive"
    want = 0.1 / (1 - 0.1 * np.asarray(ts))
    np.testing.assert_allclose(np.asarray(xs)[:, 1, 0], want, rtol=1e-3)
    assert np.isfinite(np.asarray(xs)).all(), "dead lanes must freeze finite"


def test_sr_evaluator_adaptive_path():
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    ops = [("+", jnp.add, 2), ("*", jnp.multiply, 2), ("/", jnp.divide, 2)]
    fset = build_function_set(ops, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)

    ev = SREvaluator(fset, method="adaptive", rtol=1e-4, atol=1e-6)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (8,) and np.isfinite(f).all()
    assert (f >= 0).all() and (f <= ev.max_fitness).all()

    # agreement with the fixed-grid path on the surviving candidates
    ev_fix = SREvaluator(fset, substeps=8)
    f_fix = np.asarray(jax.jit(lambda p, d: ev_fix.evaluate_population(p, d))(pop, data))
    both_ok = (f < ev.max_fitness) & (f_fix < ev_fix.max_fitness)
    np.testing.assert_allclose(f[both_ok], f_fix[both_ok], rtol=0.05, atol=1e-3)


def test_adaptive_dopri5_matches_exponential():
    """The Dopri5 tableau (the notebooks' solver) hits tight tolerance with
    far fewer steps than bosh3 at equal rtol."""
    ts = jnp.arange(0.0, 3.01, 0.5)
    x0 = jnp.asarray([[1.0], [2.0], [-0.5]])
    xs, alive = integrate_adaptive(
        lambda t, x: -x, x0, ts, rtol=1e-7, atol=1e-9, method="dopri5"
    )
    want = np.asarray(x0)[None] * np.exp(-np.asarray(ts))[:, None, None]
    assert bool(alive.all())
    np.testing.assert_allclose(np.asarray(xs), want, rtol=1e-5, atol=1e-7)


def test_adaptive_dopri5_harmonic():
    w = 6.0
    drift = lambda t, x: jnp.stack([x[..., 1], -w * w * x[..., 0]], axis=-1)
    ts = jnp.arange(0.0, 2.01, 0.25)
    x0 = jnp.asarray([[1.0, 0.0]])
    want = np.stack(
        [np.cos(w * np.asarray(ts)), -w * np.sin(w * np.asarray(ts))], axis=-1
    )[:, None, :]
    xs, alive = integrate_adaptive(
        drift, x0, ts, rtol=1e-6, atol=1e-8, max_steps_per_interval=64,
        method="dopri5",
    )
    assert bool(alive.all())
    assert np.abs(np.asarray(xs) - want).max() < 1e-4


def test_policy_evaluator_adaptive_path():
    """StaticPolicyEvaluator(method='adaptive') — the notebooks' Dopri5+PID
    configuration — runs and returns finite fitness."""
    import jax.random as jr

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.ops.initialization import make_population_sampler

    env = HarmonicOscillator(0.0, 0.0)
    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)],
        [["y0", "y1", "tgt"]], [env.n_control],
    )
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=2)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 4)
    ev = StaticPolicyEvaluator(
        env, fset, method="adaptive", adaptive_method="dopri5",
        interpreter="ladder",
    )
    fit = jax.jit(lambda p: ev.evaluate_population(p, data))(pop)
    assert fit.shape == (4,)
    assert bool(jnp.isfinite(fit).all())
