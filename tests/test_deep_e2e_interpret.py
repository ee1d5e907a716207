"""End-to-end deep-tree composition (the ``bench.py gen_deep`` shape) in
interpret mode: ``fit()`` at ``max_nodes=128`` drives BOTH deep kernels —
the N<=256 fused reproduction (shift-rows tile surgery) and the windowed
rolled-row SR fitness kernel — composed exactly as a TPU run would, with the
real kernel algorithms executing on CPU.

The per-kernel deep paths are pinned individually
(``test_rollout_interpret.test_deep_fitness_kernel_matches_general``,
``test_reproduction_interpret`` at N=128); this test pins their composition
through the production entry point so the gen_deep bench config cannot rot.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu import GeneticProgramming
from multitreegp_tpu.core.trees import validate_host
from multitreegp_tpu.models.environments import VanDerPolOscillator
from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data


def test_fit_deep_trees_interpret_kernels():
    from jax.experimental.pallas import tpu as pltpu

    if not hasattr(pltpu, "force_tpu_interpret_mode"):
        pytest.skip("needs pallas TPU interpret mode")

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.8, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2)

    gp = GeneticProgramming(
        num_generations=2,
        population_size=8,
        fitness_function=SREvaluator(substeps=1, interpreter="pallas"),
        operator_list=[("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
                       ("*", jnp.multiply, 2, 0.5)],
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=1,
        max_nodes=128,
        max_init_depth=6,
        fused_reproduction=True,  # ctor runs outside the interpret context
    )
    assert gp.fused_reproduction

    with pltpu.force_tpu_interpret_mode():
        best_fit, best_sols, final_pop, final_fitness = gp.fit(
            jr.PRNGKey(1), data, num_generations=2
        )
        jax.block_until_ready(final_fitness)

    best = np.asarray(best_fit)
    assert best.shape == (2,)
    assert np.isfinite(best).all()
    # best-so-far is monotone non-increasing
    assert best[1] <= best[0] + 1e-6
    fit = np.asarray(final_fitness)
    assert np.isfinite(fit).all() and (fit <= 1e5 + 1e-3).all()
    # every evolved tree still satisfies the layout invariants after the
    # deep reproduction kernel's shift-rows surgery
    validate_host(final_pop, gp.fset.slots)
