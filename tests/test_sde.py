"""SDE (Euler-Maruyama) integration: determinism, zero-noise equivalence,
variance growth, and the stochastic evaluator paths."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from multitreegp_tpu.models.integrators import integrate, integrate_sde


def test_zero_noise_matches_ode_euler():
    ts = jnp.arange(0.0, 2.0, 0.1)
    x0 = jnp.asarray([[1.0, 0.5], [0.3, -0.2]])
    keys = jr.split(jr.PRNGKey(0), 2)
    drift = lambda t, x: -x

    xs_ode, _ = integrate(drift, x0, ts, method="euler", substeps=4)
    xs_sde, _ = integrate_sde(
        drift, lambda t, x: jnp.zeros_like(x), x0, ts, keys, substeps=4
    )
    np.testing.assert_allclose(np.asarray(xs_ode), np.asarray(xs_sde), rtol=1e-6)


def test_sde_deterministic_in_keys():
    ts = jnp.arange(0.0, 1.0, 0.1)
    x0 = jnp.zeros((4, 1))
    keys = jr.split(jr.PRNGKey(3), 4)
    drift = lambda t, x: jnp.zeros_like(x)
    diff = lambda t, x: jnp.ones_like(x)

    xs1, _ = integrate_sde(drift, diff, x0, ts, keys, substeps=2)
    xs2, _ = integrate_sde(drift, diff, x0, ts, keys, substeps=2)
    np.testing.assert_array_equal(np.asarray(xs1), np.asarray(xs2))

    xs3, _ = integrate_sde(drift, diff, x0, ts, jr.split(jr.PRNGKey(4), 4), substeps=2)
    assert not np.array_equal(np.asarray(xs1), np.asarray(xs3))


def test_sde_variance_grows_like_t():
    """Pure Brownian motion: Var[x(t)] ~ sigma^2 t."""
    b = 512
    ts = jnp.arange(0.0, 2.01, 0.25)
    x0 = jnp.zeros((b, 1))
    keys = jr.split(jr.PRNGKey(0), b)
    sigma = 0.5

    xs, _ = integrate_sde(
        lambda t, x: jnp.zeros_like(x),
        lambda t, x: jnp.full_like(x, sigma),
        x0, ts, keys, substeps=4,
    )
    var = np.var(np.asarray(xs[-1, :, 0]))
    expected = sigma**2 * float(ts[-1])
    assert abs(var - expected) < 0.3 * expected


def test_matrix_diffusion_shape():
    b, d = 8, 3
    ts = jnp.arange(0.0, 0.5, 0.1)
    x0 = jnp.zeros((b, d))
    keys = jr.split(jr.PRNGKey(0), b)
    g = 0.1 * jnp.eye(d)

    xs, alive = integrate_sde(
        lambda t, x: jnp.zeros_like(x),
        lambda t, x: jnp.broadcast_to(g, x.shape + (d,)),
        x0, ts, keys, substeps=1,
    )
    assert xs.shape == (len(ts), b, d)
    assert bool(alive.all())


def test_stochastic_sr_evaluator():
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    ops = [("+", jnp.add, 2), ("*", jnp.multiply, 2)]
    fset = build_function_set(ops, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(process_noise=0.05, obs_noise=0.0)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)

    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    ev = SREvaluator(fset, substeps=2, process_noise=0.05)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (8,) and np.isfinite(f).all()
    assert (f >= 0).all() and (f <= ev.max_fitness).all()


def test_stochastic_static_policy():
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.ops.initialization import make_population_sampler

    env = HarmonicOscillator(process_noise=0.05, obs_noise=0.0)
    ops = [("+", jnp.add, 2), ("*", jnp.multiply, 2)]
    n_vars = env.n_obs + env.n_targets
    fset = build_function_set(ops, [[f"v{i}" for i in range(n_vars)]], [env.n_control])
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)

    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    ev = StaticPolicyEvaluator(env, fset, substeps=2, stochastic=True)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (8,) and np.isfinite(f).all()

    # same data -> identical fitness (noise is deterministic in the keys)
    fit2 = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    np.testing.assert_array_equal(f, np.asarray(fit2))
