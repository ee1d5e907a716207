"""Observability: fitness statistics, population diversity, throughput math.

The reference's only observability is a printed best-fitness line every 5
generations (SURVEY.md §5.5). Here: jittable population statistics plus the
node-evaluation cost model used by the benchmark harness (node-evals/sec/chip
is the north-star metric, BASELINE.json).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import Array

from ..core.trees import TreeTensors, tree_sizes


def population_stats(populations: TreeTensors, fitness: Array) -> Dict[str, Array]:
    """Fitness + size + diversity summary, safe to compute under jit."""
    flat_fit = fitness.reshape(-1)
    sizes = jnp.sum(tree_sizes(populations), axis=-1).reshape(-1).astype(jnp.float32)
    # structural diversity proxy: fraction of unique opcode-sequence hashes
    ops = populations.ops.reshape(-1, populations.ops.shape[-2] * populations.ops.shape[-1])
    mix = jnp.asarray(1000003, jnp.uint32)
    h = jnp.zeros(ops.shape[0], jnp.uint32)
    def step(i, h):
        return h * mix + ops[:, i].astype(jnp.uint32)
    h = jax.lax.fori_loop(0, ops.shape[1], step, h)
    _, counts = jnp.unique_counts(h, size=ops.shape[0], fill_value=0)
    unique_frac = jnp.sum(counts > 0) / ops.shape[0]
    return {
        "fitness_min": jnp.min(flat_fit),
        "fitness_median": jnp.median(flat_fit),
        "fitness_mean": jnp.mean(flat_fit),
        "size_mean": jnp.mean(sizes),
        "size_max": jnp.max(sizes),
        "unique_fraction": unique_frac,
    }


RK_STAGES = {"euler": 1, "heun": 2, "rk4": 4}


def node_evals_per_evaluation(
    population_size: int,
    num_trees: int,
    max_nodes: int,
    batch_size: int,
    num_save_points: int,
    substeps: int,
    method: str = "rk4",
    replay_trees: int | None = None,
) -> int:
    """Interpreter row-steps executed by one population evaluation.

    Counts every row the interpreter advances: lanes x max_nodes per
    interpreter call; drift calls = (T-1) x substeps x RK stages; plus the
    post-hoc control replay (T x lanes) for policy evaluators
    (replay_trees = number of readout trees; None = no replay).
    """
    stages = RK_STAGES[method]
    drift_calls = (num_save_points - 1) * substeps * stages
    lanes = population_size * batch_size * num_trees
    total = drift_calls * lanes * max_nodes
    if replay_trees is not None:
        total += num_save_points * population_size * batch_size * replay_trees * max_nodes
    return int(total)
