"""Integrator + environment + evaluator behaviour tests."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import TreeTensors
from multitreegp_tpu.models.integrators import integrate, linear_interp
from multitreegp_tpu.models.environments import (
    Acrobot,
    CartPole,
    HarmonicOscillator,
    LorenzAttractor,
    LotkaVolterra,
    StirredTankReactor,
    VanDerPolOscillator,
)
from multitreegp_tpu.models.evaluators import (
    DynamicPolicyEvaluator,
    SREvaluator,
    StaticPolicyEvaluator,
    generate_control_data,
    generate_sr_data,
)
from multitreegp_tpu.ops.initialization import make_population_sampler

N = 32


def _tree(rows, n=N):
    pad = n - len(rows)
    return TreeTensors(
        jnp.asarray([0] * pad + [r[0] for r in rows], jnp.int32),
        jnp.asarray([-1] * pad + [r[1] + pad if r[1] >= 0 else -1 for r in rows], jnp.int32),
        jnp.asarray([-1] * pad + [r[2] + pad if r[2] >= 0 else -1 for r in rows], jnp.int32),
        jnp.asarray([0.0] * pad + [r[3] for r in rows], jnp.float32),
    )


def test_integrate_exponential_decay():
    # dx/dt = -x  => x(t) = e^-t
    xs, alive = integrate(lambda t, x: -x, jnp.ones((1, 1)), jnp.linspace(0, 2, 11),
                          method="rk4", substeps=4)
    np.testing.assert_allclose(xs[-1, 0, 0], np.exp(-2.0), rtol=1e-5)
    assert bool(alive.all())


def test_integrate_divergence_containment():
    # lane 0 diverges (dx = x^3 from 5.0), lane 1 is fine; lane 1 unaffected
    x0 = jnp.asarray([[5.0], [0.1]])
    xs, alive = integrate(lambda t, x: x**3, x0, jnp.linspace(0, 2, 21), substeps=4)
    assert not bool(alive[-1, 0])
    assert bool(alive[-1, 1])
    assert np.isfinite(np.asarray(xs)).all()  # frozen, never NaN/Inf


def test_linear_interp():
    ts = jnp.asarray([0.0, 1.0, 2.0])
    vs = jnp.asarray([0.0, 10.0, 0.0])
    np.testing.assert_allclose(linear_interp(ts, vs, jnp.asarray(0.5)), 5.0)
    np.testing.assert_allclose(linear_interp(ts, vs, jnp.asarray(1.5)), 5.0)
    np.testing.assert_allclose(linear_interp(ts, vs, jnp.asarray(5.0)), 0.0)  # clipped


@pytest.mark.parametrize("env_cls", [LotkaVolterra, LorenzAttractor, VanDerPolOscillator])
def test_sr_envs(env_cls):
    env = env_cls(0.0, 0.0)
    x0 = env.sample_init_states(4, jr.PRNGKey(0))
    assert x0.shape == (4, env.n_var)
    dx = env.drift(0.0, x0[0])
    assert dx.shape == (env.n_var,)


def test_sr_evaluator_perfect_candidate():
    """A candidate encoding the true Van der Pol drift has ~zero fitness."""
    fset = build_function_set(default_sr_operators(), [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 5.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8)
    # dx0 = x1 ; dx1 = (1 - x0*x0)*x1 - x0 encoded manually
    # opcodes: +=2,-=3,*=4,/=5,x0=6,x1=7
    t0 = _tree([(7, -1, -1, 0.0)])
    t1 = _tree([
        (6, -1, -1, 0.0),   # 0 x0
        (6, -1, -1, 0.0),   # 1 x0
        (6, -1, -1, 0.0),   # 2 x0
        (4, 2, 1, 0.0),     # 3 x0*x0
        (1, -1, -1, 1.0),   # 4 1.0
        (3, 4, 3, 0.0),     # 5 1 - x0*x0
        (7, -1, -1, 0.0),   # 6 x1
        (4, 6, 5, 0.0),     # 7 x1*(1-x0*x0)
        (3, 7, 0, 0.0),     # 8 (...) - x0
    ])
    cand = TreeTensors(*[jnp.stack([a, b]) for a, b in zip(t0, t1)])
    pop = jax.tree_util.tree_map(lambda x: x[None], cand)
    ev = SREvaluator(fset, substeps=8)
    fit = ev.evaluate_population(pop, data)
    assert fit.shape == (1,)
    assert float(fit[0]) < 1e-3


def test_sr_evaluator_bad_candidate_clamped():
    fset = build_function_set(default_sr_operators(), [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 5.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4)
    # dx = x/(x-x) -> division blows up immediately
    bad = _tree([
        (6, -1, -1, 0.0),
        (6, -1, -1, 0.0),
        (6, -1, -1, 0.0),
        (3, 2, 1, 0.0),   # x0 - x0 = 0
        (5, 3, 0, 0.0),   # 0 / x0 -> hmm finite; use x0/(x0-x0)
    ])
    bad = _tree([
        (6, -1, -1, 0.0),  # 0 x0
        (6, -1, -1, 0.0),  # 1 x0
        (3, 1, 0, 0.0),    # 2 x0-x0 = 0
        (6, -1, -1, 0.0),  # 3 x0
        (5, 3, 2, 0.0),    # 4 x0/0
    ])
    cand = TreeTensors(*[jnp.stack([b, b]) for b in bad])
    pop = jax.tree_util.tree_map(lambda x: x[None], cand)
    ev = SREvaluator(fset)
    fit = ev.evaluate_population(pop, data)
    assert float(fit[0]) == ev.max_fitness


def test_sr_population_evaluation_finite():
    fset = build_function_set(default_sr_operators(), [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 3.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(1), ts, batch_size=4)
    sampler = make_population_sampler(fset, 4, N)
    pop = sampler(jr.PRNGKey(2), 32)
    ev = SREvaluator(fset)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (32,)
    assert np.isfinite(f).all()
    assert (f >= 0).all() and (f <= ev.max_fitness).all()
    assert (f < ev.max_fitness).any()  # at least some candidates integrate


def test_static_policy_acrobot():
    ops = default_sr_operators()[:3] + [("sin", jnp.sin, 1, 0.1), ("cos", jnp.cos, 1, 0.1)]
    env = Acrobot(0.05, 0.1)
    fset = build_function_set(ops, [["y1", "y2", "y3", "y4"]], [env.n_control])
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    sampler = make_population_sampler(fset, 4, N)
    pop = sampler(jr.PRNGKey(1), 16)
    ev = StaticPolicyEvaluator(env, fset, substeps=2)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (16,)
    assert np.isfinite(f).all()
    assert (f >= 0).all() and (f <= ev.max_fitness).all()


def test_dynamic_policy_acrobot():
    ops = default_sr_operators()[:3] + [("sin", jnp.sin, 1, 0.1), ("cos", jnp.cos, 1, 0.1)]
    env = Acrobot(0.05, 0.1)
    state_size = 2
    fset = build_function_set(
        ops,
        [["y1", "y2", "y3", "y4", "a1", "a2", "u"], ["a1", "a2"]],
        [state_size, env.n_control],
    )
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    sampler = make_population_sampler(fset, 4, N)
    pop = sampler(jr.PRNGKey(1), 16)
    ev = DynamicPolicyEvaluator(env, fset, state_size, substeps=2)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (16,)
    assert np.isfinite(f).all()
    assert (f >= 0).all() and (f <= ev.max_fitness).all()


def test_control_envs_smoke():
    ts = jnp.arange(0.0, 2.0, 0.2)
    for env, mode in [
        (HarmonicOscillator(0.0, 0.0), "Different"),
        (HarmonicOscillator(0.0, 0.0), "Switch"),
        (CartPole(0.0, 0.0), "Constant"),
        (StirredTankReactor(0.0, 0.0), "Constant"),
    ]:
        data = generate_control_data(env, jr.PRNGKey(3), ts, 3, mode)
        x0, _, targets, _, obs_keys, params = data
        p0 = jax.tree_util.tree_map(lambda x: x[0], params)
        p_t = env.params_at(p0, ts, jnp.asarray(0.1))
        u = jnp.zeros(env.n_control)
        dx = env.drift(jnp.asarray(0.1), x0[0], u, p_t)
        assert dx.shape == (env.latent_size,)
        y = env.f_obs(obs_keys[0], jnp.asarray(0.1), x0[0], p_t)
        assert y.shape == (env.n_obs,)
        xs = jnp.zeros((ts.shape[0], env.latent_size))
        us = jnp.zeros((ts.shape[0], env.n_control))
        c = env.fitness(xs, us, targets[0], ts, p0)
        assert np.isfinite(float(c))


def test_obs_noise_deterministic_in_t():
    env = Acrobot(0.0, 0.1)
    key = jr.PRNGKey(9)
    params = tuple(jnp.ones(()) for _ in range(4))
    x = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    y1 = env.f_obs(key, jnp.asarray(1.25), x, params)
    y2 = env.f_obs(key, jnp.asarray(1.25), x, params)
    y3 = env.f_obs(key, jnp.asarray(1.35), x, params)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_dead_saves_inf_fill_reaches_us_only_costs():
    """Reference semantics (feedforward_evaluate.py:90-99): post-halt saves
    are inf in BOTH the states and the recomputed controls — a cost that
    integrates only ``us`` must still see the divergence (ADVICE r3 #2).
    The drift diverges regardless of the policy, so every candidate's
    trajectory halts early; the u-only cost must come back non-finite and
    map to max_fitness."""

    class ExplodingUSquared(HarmonicOscillator):
        def drift(self, t, x, u, params):
            return 5.0 * x * x * jnp.sign(x) + 1.0  # finite-time blow-up

        def fitness(self, xs, us, target, ts, params):
            return jnp.mean(us[:, 0] ** 2)  # touches ONLY the controls

    ops = default_sr_operators()[:3]
    env = ExplodingUSquared(0.0, 0.0)
    fset = build_function_set(ops, [["y1", "y2"]], [env.n_control])
    ts = jnp.arange(0.0, 5.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    sampler = make_population_sampler(fset, 3, N)
    pop = sampler(jr.PRNGKey(1), 8)
    ev = StaticPolicyEvaluator(env, fset, substeps=2)
    fit = np.asarray(jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data))
    assert (fit == ev.max_fitness).all(), fit

    cand = jax.tree_util.tree_map(lambda x: x[0], pop)
    *_rest, cost = ev.evaluate_candidate(cand, data)
    assert (np.asarray(cost) == ev.max_fitness).all(), cost
