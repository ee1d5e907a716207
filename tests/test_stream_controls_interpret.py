"""In-kernel control replay (stream_controls) vs the host-side replay — CPU
interpret mode.

The fused policy kernels evaluate the post-hoc replay's save-grid controls
INSIDE the rollout (save-time observation noise, real observations) and
stream them out with the states, replacing the separate replay interpreter
pass (measured 45% of the policy evaluation wall-clock at pop 4096, VERDICT
r2 #3). These tests pin:

* streamed ``us`` == ``_replay`` recomputed on the SAME trajectories
  (identical inputs, identical expressions — near-exact), including the
  final save row, whose noise draw rides the otherwise-unused row T-1 of
  ``make_obs_noise_rows``;
* evaluator-level fitness parity, fused vs general, static AND dynamic.
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


def test_streamed_controls_match_replay_static_obs_noise():
    """Acrobot with obs noise 0.1: streamed us vs _replay on the kernel's own
    xs — near-exact, every save row including T-1 (the tail noise row)."""
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )

    env = Acrobot(0.0, 0.1)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    ev = StaticPolicyEvaluator(env, fs, substeps=2, interpreter="pallas")
    with pltpu.force_tpu_interpret_mode():
        xs, alive, us = ev._rollout(pop, data)
    assert us is not None, "fused path must stream controls"
    ev_l = StaticPolicyEvaluator(env, fs, substeps=2, interpreter="ladder")
    _ys, us_replay = ev_l._replay(pop, xs, data)
    a = np.asarray(alive[-1])  # (P, B)
    m = np.broadcast_to(a[None, :, :, None], us_replay.shape)
    d = np.abs(np.asarray(us)[m] - np.asarray(us_replay)[m])
    rel = d / (np.abs(np.asarray(us_replay)[m]) + 1e-6)
    assert rel.max() < 1e-5, rel.max()
    # the final row specifically (tail noise draw at ts[-1])
    d_last = np.abs(np.asarray(us[-1])[a] - np.asarray(us_replay[-1])[a])
    rel_last = d_last / (np.abs(np.asarray(us_replay[-1])[a]) + 1e-6)
    assert rel_last.max() < 1e-5, rel_last.max()


def test_fused_fitness_matches_general_static():
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )

    env = Acrobot(0.0, 0.1)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=4)
    fs = build_function_set(
        OPS, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(1), 8)
    with pltpu.force_tpu_interpret_mode():
        fit_f = StaticPolicyEvaluator(
            env, fs, substeps=2, interpreter="pallas"
        ).evaluate_population(pop, data)
    fit_g = StaticPolicyEvaluator(
        env, fs, substeps=2, interpreter="ladder"
    ).evaluate_population(pop, data)
    np.testing.assert_allclose(
        np.asarray(fit_f), np.asarray(fit_g), rtol=1e-4, atol=1e-5
    )


def test_fused_fitness_matches_general_dynamic():
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import (
        DynamicPolicyEvaluator,
        generate_control_data,
    )

    env = HarmonicOscillator(0.0, 0.1)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(2), ts, batch_size=4)
    state_size = 2
    names = [f"y{i}" for i in range(env.n_obs)]
    fs = build_function_set(
        OPS,
        [names + ["a1", "a2", "u", "tgt"], ["a1", "a2"]],
        [state_size, env.n_control],
    )
    pop = make_population_sampler(fs, 3, 16)(jr.PRNGKey(3), 8)
    with pltpu.force_tpu_interpret_mode():
        fit_f = DynamicPolicyEvaluator(
            env, fs, state_size=state_size, substeps=2, interpreter="pallas"
        ).evaluate_population(pop, data)
    fit_g = DynamicPolicyEvaluator(
        env, fs, state_size=state_size, substeps=2, interpreter="ladder"
    ).evaluate_population(pop, data)
    np.testing.assert_allclose(
        np.asarray(fit_f), np.asarray(fit_g), rtol=1e-4, atol=1e-5
    )
