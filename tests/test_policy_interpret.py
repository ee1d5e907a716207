"""Fused policy rollout kernel vs the general scan path — CPU, exact.

Runs the REAL kernel algorithm (DMA streaming, stage interpolation, register
tiling) under ``pltpu.force_tpu_interpret_mode()``, so the fused policy paths
that previously only executed on hardware are pinned in the CI suite:

* time-varying (B, T) parameter series streamed + interpolated at RK stage
  times (``pallas_policy`` time-varying path — Switch/Decay param modes and
  ChangingHarmonicOscillator);
* multi-control environments (HarmonicOscillator2's index-wise A/B drift);
* the dynamic (stateful) policy layout.

Short horizons keep parity exact (~1e-6); long-horizon behaviour on marginal
lanes is fp-ordering dependent and is checked statistically on hardware
(tests/test_pallas_tpu.py).
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.ops.initialization import make_population_sampler

try:
    from jax.experimental.pallas import tpu as pltpu

    HAS_INTERPRET = hasattr(pltpu, "force_tpu_interpret_mode")
except Exception:  # pragma: no cover
    HAS_INTERPRET = False

pytestmark = pytest.mark.skipif(
    not HAS_INTERPRET, reason="needs pallas TPU interpret mode"
)

OPS = [("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2)]


def _compare_static(env, param_mode, n_targets_names, key=0):
    from multitreegp_tpu.core.pallas_policy import rollout_policy_pallas
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )

    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(
        env, jr.PRNGKey(key), ts, batch_size=4, param_mode=param_mode
    )
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)] + n_targets_names], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    x0, _, targets, _, _, params = data
    with pltpu.force_tpu_interpret_mode():
        xs_f, alive_f = rollout_policy_pallas(
            pop, x0, ts, targets, params, env, fs, substeps=2
        )
    evl = StaticPolicyEvaluator(env, fs, substeps=2, interpreter="ladder")
    xs_l, alive_l = evl._rollout_general(pop, data)
    af, al = np.asarray(alive_f[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    xs_f, xs_l = np.asarray(xs_f), np.asarray(xs_l)
    d = np.abs(xs_f[-1][m] - xs_l[-1][m]) / (np.abs(xs_l[-1][m]) + 1e-6)
    assert d.max() < 1e-4, d.max()


def test_time_varying_series_decay():
    from multitreegp_tpu.models.environments import ChangingHarmonicOscillator

    _compare_static(ChangingHarmonicOscillator(0.0, 0.0), "Decay", ["tgt"])


def test_unrolled_policy_kernel(monkeypatch):
    """The legacy fully-unrolled SSA ladder (pre-r2 default, now the
    MTGP_POLICY_UNROLLED=1 A/B path — the rolled-row kernel won the r2
    hardware A/B 2.3x and is the default): must still match the general
    path exactly at shallow N."""
    from multitreegp_tpu.models.environments import HarmonicOscillator

    monkeypatch.setenv("MTGP_POLICY_UNROLLED", "1")
    _compare_static(HarmonicOscillator(0.0, 0.0), "Constant", ["tgt"])


def test_unrolled_policy_kernel_dynamic(monkeypatch):
    """Unrolled ladder through the DYNAMIC (stateful) policy layout: m =
    state + control trees evaluated as python-unrolled SSA chains."""
    monkeypatch.setenv("MTGP_POLICY_UNROLLED", "1")
    test_dynamic_policy_time_varying()


def test_time_varying_series_switch():
    from multitreegp_tpu.models.environments import HarmonicOscillator

    _compare_static(HarmonicOscillator(0.0, 0.0), "Switch", ["tgt"])


def test_harmonic_oscillator2_multi_control():
    from multitreegp_tpu.models.environments import HarmonicOscillator2

    _compare_static(HarmonicOscillator2(0.0, 0.0), "Constant", ["tgt0", "tgt1"])


def _compare_static_noisy(env, param_mode, n_targets_names, key=0):
    """obs noise ON: kernel consumes precomputed draws -> EXACT parity with
    the general path (same deterministic fold_in(key, bitcast(t)) stream)."""
    from multitreegp_tpu.core.pallas_policy import rollout_policy_pallas
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.models.evaluators.noise import make_obs_noise_rows

    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(
        env, jr.PRNGKey(key), ts, batch_size=4, param_mode=param_mode
    )
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)] + n_targets_names], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    x0, _, targets, _, obs_keys, params = data
    rows = make_obs_noise_rows(env, ts, params, obs_keys, 2, "rk4")
    with pltpu.force_tpu_interpret_mode():
        xs_f, alive_f = rollout_policy_pallas(
            pop, x0, ts, targets, params, env, fs, substeps=2, obs_noise_rows=rows
        )
    evl = StaticPolicyEvaluator(env, fs, substeps=2, interpreter="ladder")
    xs_l, alive_l = evl._rollout_general(pop, data)
    af, al = np.asarray(alive_f[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    xs_f, xs_l = np.asarray(xs_f), np.asarray(xs_l)
    d = np.abs(xs_f[-1][m] - xs_l[-1][m]) / (np.abs(xs_l[-1][m]) + 1e-6)
    assert d.max() < 1e-4, d.max()


def test_obs_noise_stream_harmonic():
    from multitreegp_tpu.models.environments import HarmonicOscillator

    _compare_static_noisy(HarmonicOscillator(0.0, 0.3), "Different", ["tgt"])


def test_obs_noise_stream_acrobot_wrapped():
    """Acrobot wraps angles AFTER adding noise (obs_tiles_noisy override)."""
    from multitreegp_tpu.models.environments import Acrobot

    _compare_static_noisy(Acrobot(0.0, 0.3), "Constant", [])


def test_process_noise_stream_sde():
    """stochastic=True (Euler-Maruyama): precomputed V @ dW kicks streamed
    into the kernel -> EXACT parity with integrate_sde, both noises on."""
    from multitreegp_tpu.core.pallas_policy import rollout_policy_pallas
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.models.evaluators.noise import (
        make_obs_noise_rows,
        make_process_noise_rows,
    )

    env = HarmonicOscillator(0.2, 0.1)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4,
                                 param_mode="Different")
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)] + ["tgt"]], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    x0, _, targets, pkeys, okeys, params = data
    obs_rows = make_obs_noise_rows(env, ts, params, okeys, 2, "euler")
    kick_rows = make_process_noise_rows(env, ts, params, pkeys, 2, env.latent_size)
    with pltpu.force_tpu_interpret_mode():
        xs_f, alive_f = rollout_policy_pallas(
            pop, x0, ts, targets, params, env, fs, substeps=2, method="euler",
            obs_noise_rows=obs_rows, process_noise_rows=kick_rows,
        )
    evl = StaticPolicyEvaluator(env, fs, substeps=2, interpreter="ladder",
                                stochastic=True)
    xs_l, alive_l = evl._rollout_general(pop, data)
    af, al = np.asarray(alive_f[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    xs_f, xs_l = np.asarray(xs_f), np.asarray(xs_l)
    d = np.abs(xs_f[-1][m] - xs_l[-1][m]) / (np.abs(xs_l[-1][m]) + 1e-6)
    assert d.max() < 1e-4, d.max()


def test_dynamic_policy_time_varying():
    from multitreegp_tpu.core.pallas_policy import rollout_policy_pallas
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import (
        DynamicPolicyEvaluator,
        generate_control_data,
    )

    env = HarmonicOscillator(0.0, 0.0)
    state_size = 2
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(2), ts, batch_size=4, param_mode="Decay")
    fs = build_function_set(
        OPS,
        [
            [f"y{i}" for i in range(env.n_obs)] + ["a0", "a1", "u", "tgt"],
            ["a0", "a1", "tgt"],
        ],
        [state_size, env.n_control],
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(3), 8)
    x0, _, targets, _, _, params = data
    with pltpu.force_tpu_interpret_mode():
        xs_f, alive_f = rollout_policy_pallas(
            pop, x0, ts, targets, params, env, fs, substeps=2, state_size=state_size
        )
    evl = DynamicPolicyEvaluator(
        env, fs, state_size=state_size, substeps=2, interpreter="ladder"
    )
    xs_l, alive_l = evl._rollout_general(pop, data)
    af, al = np.asarray(alive_f[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    m = af & al
    xs_f, xs_l = np.asarray(xs_f), np.asarray(xs_l)
    d = np.abs(xs_f[-1][m] - xs_l[-1][m]) / (np.abs(xs_l[-1][m]) + 1e-6)
    assert d.max() < 1e-4, d.max()


def test_adaptive_policy_kernel_matches_general():
    """Fused ADAPTIVE policy rollout (Dopri5+PID, r5 — the policy
    notebooks' solver class) vs the general integrate_adaptive path on a
    noise-free Acrobot: aliveness equal, live trajectories exact at short
    horizon, streamed save-grid controls equal to the replay's."""
    from multitreegp_tpu.core.pallas_policy import (
        policy_adaptive_rollout_available,
        rollout_policy_adaptive_pallas,
    )
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )

    env = Acrobot(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    x0, _, targets, _, _, params = data
    with pltpu.force_tpu_interpret_mode():
        # the gate is backend-aware: true inside interpret mode / on TPU
        assert policy_adaptive_rollout_available(env, fs, pop, params)
        xs_f, us_f, alive_f = rollout_policy_adaptive_pallas(
            pop, x0, ts, targets, params, env, fs,
            rtol=1e-4, atol=1e-4, max_steps=16, method="dopri5",
            stream_controls=True,
        )
    evl = StaticPolicyEvaluator(
        env, fs, method="adaptive", substeps=2, rtol=1e-4, atol=1e-4,
        adaptive_method="dopri5", interpreter="ladder",
    )
    # general path with the SAME per-interval budget as the kernel call
    import multitreegp_tpu.models.integrators as integ

    xs_l, alive_l = integ.integrate_adaptive(
        _static_drift(evl, pop, data), _x0b(pop, data),
        ts, rtol=1e-4, atol=1e-4, max_steps_per_interval=16,
        cond_alive=_static_cond(evl, data), method="dopri5",
    )
    af, al = np.asarray(alive_f[-1]), np.asarray(alive_l[-1])
    np.testing.assert_array_equal(af, al)
    mk = af & al
    xs_f_n, xs_l_n = np.asarray(xs_f), np.asarray(xs_l)
    d = np.abs(xs_f_n[-1][mk] - xs_l_n[-1][mk]) / (np.abs(xs_l_n[-1][mk]) + 1e-6)
    assert d.max() < 1e-4, d.max()
    # streamed save-grid controls == the replay on the same states
    _ys, us_l = evl._replay(pop, jnp.asarray(xs_f), data)
    d_u = np.abs(np.asarray(us_f) - np.asarray(us_l))
    assert d_u[np.asarray(alive_f)].max() < 1e-5, d_u.max()


def _static_drift(evl, pop, data):
    """The static evaluator's general drift closure (for budget-matched
    integrate_adaptive calls in tests)."""
    x0, ts, targets, _pk, obs_keys, params = data
    trees = pop[:, None]
    env = evl.env

    def drift(t, x):
        if jnp.ndim(t):
            per_b = lambda tr: jax.vmap(
                lambda pp, t_s: env.params_at(pp, ts, t_s)
            )(params, tr)
            p_t = jax.vmap(per_b)(t)
            y = jax.vmap(
                jax.vmap(env.f_obs, in_axes=(0, 0, 0, 0)),
                in_axes=(None, 0, 0, 0),
            )(obs_keys, t, x, p_t)
            u = evl._controls(trees, y, targets)
            return jax.vmap(
                jax.vmap(env.drift, in_axes=(0, 0, 0, 0)),
                in_axes=(0, 0, 0, 0),
            )(t, x, u, p_t)
        raise AssertionError("adaptive path always passes per-lane t")

    return drift


def _static_cond(evl, data):
    env = evl.env

    def cond_alive(t, x):
        if jnp.ndim(t):
            tb = jnp.broadcast_to(t, x.shape[:-1])
            return jax.vmap(jax.vmap(env.cond_alive))(tb, x)
        return jax.vmap(jax.vmap(lambda xi: env.cond_alive(t, xi)))(x)

    return cond_alive


def _x0b(pop, data):
    x0 = data[0]
    p = pop.batch_shape[0]
    b = x0.shape[0]
    return jnp.broadcast_to(x0[None], (p, b, x0.shape[-1]))


def test_adaptive_policy_through_evaluator():
    """StaticPolicyEvaluator(method='adaptive') must dispatch the fused
    adaptive kernel on a noise-free env and agree with the ladder
    evaluator's fitness."""
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )

    env = Acrobot(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    ev_f = StaticPolicyEvaluator(
        env, fs, method="adaptive", substeps=4, rtol=1e-4, atol=1e-4,
        adaptive_method="dopri5", interpreter="pallas",
    )
    ev_l = StaticPolicyEvaluator(
        env, fs, method="adaptive", substeps=4, rtol=1e-4, atol=1e-4,
        adaptive_method="dopri5", interpreter="ladder",
    )
    with pltpu.force_tpu_interpret_mode():
        fit_f = np.asarray(ev_f.evaluate_population(pop, data))
    fit_l = np.asarray(ev_l.evaluate_population(pop, data))
    np.testing.assert_allclose(fit_f, fit_l, rtol=1e-4)


def test_adaptive_policy_kernel_dynamic():
    """Fused adaptive DYNAMIC policy (hidden-state trees + readout) vs the
    general adaptive path through the evaluator."""
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        DynamicPolicyEvaluator,
        generate_control_data,
    )

    env = Acrobot(0.0, 0.0)
    ts = jnp.arange(0.0, 0.8, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    state_size = 2
    names = (
        [f"y{i}" for i in range(env.n_obs)]
        + [f"a{i}" for i in range(state_size)]
        + [f"u{i}" for i in range(env.n_control)]
    )
    fs = build_function_set(
        OPS, [names, names], [state_size, env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    ev_f = DynamicPolicyEvaluator(
        env, fs, state_size=state_size, method="adaptive", substeps=4,
        rtol=1e-4, atol=1e-4, adaptive_method="dopri5", interpreter="pallas",
    )
    ev_l = DynamicPolicyEvaluator(
        env, fs, state_size=state_size, method="adaptive", substeps=4,
        rtol=1e-4, atol=1e-4, adaptive_method="dopri5", interpreter="ladder",
    )
    with pltpu.force_tpu_interpret_mode():
        fit_f = np.asarray(ev_f.evaluate_population(pop, data))
    fit_l = np.asarray(ev_l.evaluate_population(pop, data))
    np.testing.assert_allclose(fit_f, fit_l, rtol=1e-4)
