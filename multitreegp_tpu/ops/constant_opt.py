"""Gradient-based refinement of expression constants ("coefficients").

Behavioural spec (reference ``genetic_programming.py:435-473``): for the
selected candidates, run ``gradient_steps`` epochs of Adam on the constant
slots, differentiating the full fitness (ODE rollout included) with respect to
the constants; each epoch records the PRE-update candidates and their losses,
and the final result per candidate is the best epoch over the whole trajectory
(so refinement can never hurt).

TPU-first deltas: the reference reverse-differentiates through
``diffrax.DirectAdjoint``, the most memory-hungry path in the system; here the
rollout is a ``lax.scan`` so we get standard checkpointed scan AD by wrapping
the per-candidate loss in ``jax.checkpoint``. Gradients flow only into the
``const`` field of the SoA tree tensors — opcodes and child pointers are
integers and naturally non-differentiable. The interpreter's double-where
dispatch guarantees no NaN cotangents from not-taken opcode branches.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..core.trees import TreeTensors


def make_constant_optimiser(
    evaluate_population: Callable[[TreeTensors, Tuple], Array],
    optimiser: optax.GradientTransformation | None = None,
    gradient_steps: int = 10,
):
    """Build ``optimise(candidates, data) -> (fitness, candidates)``.

    ``candidates`` has batch shape ``(K, num_trees)``; all K candidates are
    refined in parallel (the fitness of candidate i depends only on its own
    constants, so one global gradient equals per-candidate gradients).
    """
    if optimiser is None:
        optimiser = optax.adam(learning_rate=1e-3, b1=0.9, b2=0.999)

    def loss_fn(consts: Array, candidates: TreeTensors, data: Tuple) -> Tuple[Array, Array]:
        fitness = evaluate_population(candidates._replace(const=consts), data)
        return jnp.sum(fitness), fitness

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def epoch(carry, _):
        consts, opt_state, candidates, data = carry
        grads, fitness = grad_fn(consts, candidates, data)
        grads = jnp.nan_to_num(grads, nan=0.0, posinf=0.0, neginf=0.0)
        updates, opt_state = optimiser.update(grads, opt_state, consts)
        new_consts = optax.apply_updates(consts, updates)
        # emit the PRE-update constants with their fitness (reference :452)
        return (new_consts, opt_state, candidates, data), (consts, fitness)

    def optimise(candidates: TreeTensors, data: Tuple) -> Tuple[Array, TreeTensors]:
        consts = candidates.const
        opt_state = optimiser.init(consts)
        _, (const_hist, fit_hist) = jax.lax.scan(
            epoch, (consts, opt_state, candidates, data), length=gradient_steps
        )
        # best epoch per candidate (reference :470-471)
        best_epoch = jnp.argmin(fit_hist, axis=0)  # (K,)
        best_fitness = jnp.min(fit_hist, axis=0)
        best_consts = jnp.take_along_axis(
            const_hist, best_epoch[None, :, None, None], axis=0
        )[0]
        return best_fitness, candidates._replace(const=best_consts)

    return optimise
