"""Constant optimisation: gradients through the rollout refine coefficients."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import TreeTensors
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
from multitreegp_tpu.ops.constant_opt import make_constant_optimiser

N = 32


def _tree(rows, n=N):
    pad = n - len(rows)
    return TreeTensors(
        jnp.asarray([0] * pad + [r[0] for r in rows], jnp.int32),
        jnp.asarray([-1] * pad + [r[1] + pad if r[1] >= 0 else -1 for r in rows], jnp.int32),
        jnp.asarray([-1] * pad + [r[2] + pad if r[2] >= 0 else -1 for r in rows], jnp.int32),
        jnp.asarray([0.0] * pad + [r[3] for r in rows], jnp.float32),
    )


def test_constant_opt_improves_and_never_hurts():
    fset = build_function_set(default_sr_operators(), [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 3.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4)
    ev = SREvaluator(fset, substeps=2, remat=True)

    # candidate: dx0 = c * x1 with c = 0.8 (truth: 1.0); dx1 = true drift
    t0 = _tree([
        (7, -1, -1, 0.0),   # x1
        (1, -1, -1, 0.8),   # c
        (4, 1, 0, 0.0),     # c * x1
    ])
    t1 = _tree([
        (6, -1, -1, 0.0),
        (6, -1, -1, 0.0),
        (6, -1, -1, 0.0),
        (4, 2, 1, 0.0),
        (1, -1, -1, 1.0),
        (3, 4, 3, 0.0),
        (7, -1, -1, 0.0),
        (4, 6, 5, 0.0),
        (3, 7, 0, 0.0),
    ])
    cand = TreeTensors(*[jnp.stack([a, b]) for a, b in zip(t0, t1)])
    pop = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), cand)  # K=2

    base_fit = ev.evaluate_population(pop, data)
    import optax

    optimise = make_constant_optimiser(
        lambda p, d: ev.evaluate_population(p, d),
        optax.adam(3e-2),
        gradient_steps=20,
    )
    opt_fit, opt_pop = jax.jit(optimise)(pop, data)
    assert (np.asarray(opt_fit) <= np.asarray(base_fit) + 1e-6).all()
    assert float(opt_fit[0]) < float(base_fit[0]) * 0.7  # real improvement
    # structure untouched: only consts changed
    np.testing.assert_array_equal(np.asarray(opt_pop.ops), np.asarray(pop.ops))
    # the constant moved toward 1.0
    c_row = np.asarray(opt_pop.const[0, 0])
    c_val = c_row[c_row != 0.0]
    assert len(c_val) == 1 and 0.8 < c_val[0] <= 1.1
