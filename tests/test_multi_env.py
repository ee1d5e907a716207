"""Multi-environment fitness (BASELINE.json config 4): one population scored
across a batch of trajectories with per-trajectory physics parameters
(sample_params modes Different / Switch / Decay)."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.models.environments import (
    HarmonicOscillator,
    StirredTankReactor,
)
from multitreegp_tpu.models.evaluators import (
    StaticPolicyEvaluator,
    generate_control_data,
)
from multitreegp_tpu.ops.initialization import make_population_sampler


def _setup(env, mode, key=0, batch=6):
    ops = [("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2)]
    n_vars = env.n_obs + env.n_targets
    fset = build_function_set(ops, [[f"v{i}" for i in range(n_vars)]], [env.n_control])
    ts = jnp.arange(0.0, 3.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(key), ts, batch, param_mode=mode)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(1), 8)
    ev = StaticPolicyEvaluator(env, fset, substeps=2)
    return pop, data, ev


@pytest.mark.parametrize("mode", ["Constant", "Different", "Switch", "Decay"])
def test_harmonic_param_modes(mode):
    env = HarmonicOscillator(0.0, 0.0)
    pop, data, ev = _setup(env, mode)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (8,) and np.isfinite(f).all()


def test_different_mode_varies_physics():
    """'Different' must actually randomize per-trajectory params: fitness of
    the same population differs from the Constant-mode fitness."""
    env = HarmonicOscillator(0.0, 0.0)
    pop, data_const, ev = _setup(env, "Constant")
    _, data_diff, _ = _setup(env, "Different")
    f_const = np.asarray(jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data_const))
    f_diff = np.asarray(jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data_diff))
    assert not np.allclose(f_const, f_diff)


@pytest.mark.parametrize("mode", ["Constant", "Different"])
def test_reactor_param_modes(mode):
    env = StirredTankReactor(0.0, 0.0)
    pop, data, ev = _setup(env, mode)
    fit = jax.jit(lambda p, d: ev.evaluate_population(p, d))(pop, data)
    f = np.asarray(fit)
    assert f.shape == (8,) and np.isfinite(f).all()
