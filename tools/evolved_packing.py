"""Evolved-population tile-packing analysis (VERDICT r3 next #3).

`bench.py evolved_deep` (21.3x) sits ~4.7x below the fresh-pop `deep` config
(100.6x). The deep stack kernel's per-tile cost is

    cost(tile) = sum_mi [ alpha * max_size_mi  (rows walked: the row loop
                                                starts at n - max(size))
                + beta * sum_row max_lane need_mi(row) ]  (plane-ladder trips)

so the packing question is how much of the gap is WORKLOAD (evolved trees
are genuinely bigger) vs PACKING WASTE (per-row max over shape-diverse lanes
unions their ladder profiles). This tool evolves the exact bench population,
then evaluates the cost model under candidate orderings:

- lane-ideal:    every lane pays only its own rows/trips (unreachable lower
                 bound — tiles are 8x128 lanes in lockstep)
- size (current) / trips / size-then-trips / random

and prints the waste ratio of each. If `size`'s cost is already near the
lane-ideal, the 21.3x IS the workload floor; otherwise the best ordering is
worth wiring in (MTGP_SR_SORT knob) and A/B-ing on hardware.

Usage: python tools/evolved_packing.py [max_nodes] [generations]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def evolved_population(max_nodes=128, max_init_depth=7, generations=20,
                       population_size=4096):
    """The exact `bench.py evolved_deep` population (same seeds/config)."""
    from multitreegp_tpu import GeneticProgramming
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 10.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=16, substeps=8)
    gp = GeneticProgramming(
        num_generations=generations,
        population_size=population_size // 8,
        fitness_function=SREvaluator(substeps=1),
        operator_list=[("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
                       ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_nodes=max_nodes,
        max_init_depth=max_init_depth,
    )
    _, _, final_pop, _ = gp.fit(jr.PRNGKey(1), data,
                                num_generations=generations)
    pop = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), final_pop
    )
    return pop, gp.fset, data


def need_profile(pop, slots):
    """Per-(candidate, tree, row) plane-ladder trip need + sizes (host)."""
    from multitreegp_tpu.core.trees import EMPTY

    ops = np.asarray(pop.ops)
    used = ops != EMPTY
    arity = np.asarray(slots, np.int32)[ops]
    w = np.where(used, 1 - arity, 0)
    sp_after = np.cumsum(w, axis=-1)
    sp_before = sp_after - w
    need = np.where(
        used & (arity == 2), sp_before - 1,
        np.where(used & (arity == 0), sp_before, 0),
    )
    need = np.maximum(need, 0)  # (P, m, N)
    sizes = used.sum(axis=-1)  # (P, m)
    return need, sizes


def tile_cost(order, need, sizes, cpt, alpha=1.0, beta=1.0):
    """Cost-model total over tiles for a candidate ordering.

    cpt = candidates per lane tile (tile_lanes // batch)."""
    p = need.shape[0]
    grid = (p + cpt - 1) // cpt
    pad = grid * cpt - p
    nd = need[order]
    sz = sizes[order]
    if pad:
        nd = np.pad(nd, ((0, pad), (0, 0), (0, 0)))
        sz = np.pad(sz, ((0, pad), (0, 0)))
    nd = nd.reshape(grid, cpt, *need.shape[1:])
    sz = sz.reshape(grid, cpt, sizes.shape[1])
    rows = sz.max(axis=1).sum()          # sum_tiles sum_mi max size
    trips = nd.max(axis=1).sum()         # sum_tiles sum_mi sum_row max need
    return alpha * rows + beta * trips, rows, trips


def main(max_nodes=128, generations=20):
    print(f"evolving bench population (N={max_nodes}, {generations} gens, "
          f"pop 4096) ...", flush=True)
    pop, fset, _data = evolved_population(max_nodes=max_nodes,
                                          generations=generations)
    need, sizes = need_profile(pop, fset.slots)
    p, m, n = need.shape
    tot_size = sizes.sum(axis=1)
    tot_trips = need.sum(axis=(1, 2))
    print(f"pop {p} x {m} trees, N={n}: mean size {sizes.mean():.1f}, "
          f"p99 {np.percentile(sizes, 99):.0f}, max {sizes.max()}; "
          f"mean per-tree trips {need.sum(axis=2).mean():.1f}")

    from multitreegp_tpu.core.pallas_rollout import LANE, SUBLANES_DEEP
    cpt = SUBLANES_DEEP * LANE // 16  # batch 16 lanes per candidate

    orders = {
        "size (current)": np.argsort(tot_size, kind="stable"),
        "trips": np.argsort(tot_trips, kind="stable"),
        "size,trips": np.lexsort((tot_trips, tot_size)),
        "trips,size": np.lexsort((tot_size, tot_trips)),
        "random": np.random.RandomState(0).permutation(p),
        "unsorted": np.arange(p),
    }
    # unreachable per-lane ideal: every candidate pays its own profile
    ideal_rows = sizes.max(axis=1).sum() / (p / cpt) * (p / cpt)  # = sum sizes? no:
    ideal_rows = sizes.sum() / 1.0
    ideal_trips = need.sum()
    # per-tile normalisation: ideal per-tile = mean over candidates * cpt,
    # but every tile walks its max — report sums on the same scale
    print(f"\n{'ordering':18s} {'rows':>12s} {'trips':>12s} "
          f"{'cost(a=1,b=1)':>14s} {'waste vs lane-ideal':>20s}")
    ideal_cost = (ideal_rows + ideal_trips) / cpt  # per-tile-walk scale
    for name, order in orders.items():
        cost, rows, trips = tile_cost(order, need, sizes, cpt)
        print(f"{name:18s} {rows:12.0f} {trips:12.0f} {cost:14.0f} "
              f"{cost / ideal_cost:19.2f}x")
    print(f"{'lane-ideal':18s} {ideal_rows / cpt:12.0f} "
          f"{ideal_trips / cpt:12.0f} {ideal_cost:14.0f} "
          f"{1.0:19.2f}x")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 20,
    )
