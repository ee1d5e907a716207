"""Policy-kernel roofline decomposition (VERDICT r4 #5).

The fused policy rollout (`bench.py policy`, 53.3x) sits ~40% below the SR
default (85.9x+) and r3/r4 never established WHERE the 155 ms rollout wall
lives. This tool separates the per-step cost into its three candidate
components by scaling each axis independently and fitting the slopes:

    wall = tiles * [ T*substeps*stages * (c_tree(N) + c_drift) + T * c_save ]

- vary max_nodes (30 vs 15 vs 60): c_tree share (rolled stack-machine rows)
- vary substeps (4 vs 2): separates the per-substep work from per-save work
  (staging DMA + save_u replay eval)
- vary horizon (250 vs 125 save points at fixed total substeps): isolates
  per-save overhead directly
- MTGP_POLICY_UNROLLED=1 at N=30: the unrolled-ladder A/B (r2 showed rolled
  2.3x better; re-pins that on the current kernel)

Timing methodology matches bench.py: K chained evaluations inside one jitted
scan, scalar-digest fetch. Run on the real chip:

    python tools/policy_roofline.py > results_r5/policy_roofline.txt
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import jax.random as jr

CHAIN = 5


def bench(label, pop, ts, data, env, fset, substeps, repeats=3):
    from multitreegp_tpu.core.pallas_policy import rollout_policy_pallas

    x0, _, targets, _, _, params = data

    def chained(const, _):
        xs, us, alive = rollout_policy_pallas(
            pop._replace(const=const), x0, ts, targets, params, env, fset,
            substeps=substeps, method="rk4", stream_controls=True,
        )
        d = jnp.sum(xs[-1]) + jnp.sum(us[-1]) + jnp.sum(alive[-1])
        return const + 1e-30 * d, d

    run = jax.jit(
        lambda c: jnp.sum(jax.lax.scan(chained, c, None, length=CHAIN)[1])
    )
    t0 = time.perf_counter()
    float(run(pop.const))
    t_compile = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(pop.const))
        times.append(time.perf_counter() - t0)
    dt = min(times) / CHAIN
    print(f"  {label}: {1e3 * dt:8.2f} ms/eval (compile {t_compile:.1f}s)",
          flush=True)
    return dt


def main(pop_size=4096):
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import generate_control_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    operators = [
        ("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2),
        ("sin", jnp.sin, 1), ("cos", jnp.cos, 1),
    ]
    env = Acrobot(0.0, 0.0)
    fset = build_function_set(
        operators, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    b = 16
    ts_full = jnp.arange(0.0, 50.0, 0.2)   # T=250, the bench shape
    ts_half = jnp.arange(0.0, 25.0, 0.2)   # T=125
    data_f = generate_control_data(env, jr.PRNGKey(0), ts_full, batch_size=b)
    data_h = generate_control_data(env, jr.PRNGKey(0), ts_half, batch_size=b)

    pops = {
        n: make_population_sampler(fset, 4, n)(jr.PRNGKey(1), pop_size)
        for n in (15, 30, 60)
    }

    print(f"pop {pop_size} x {fset.num_trees} trees, acrobot rk4:",
          flush=True)
    base = bench("T250 sub4 N30 (bench)", pops[30], ts_full, data_f, env,
                 fset, 4)
    n15 = bench("T250 sub4 N15       ", pops[15], ts_full, data_f, env,
                fset, 4)
    n60 = bench("T250 sub4 N60       ", pops[60], ts_full, data_f, env,
                fset, 4)
    s2 = bench("T250 sub2 N30       ", pops[30], ts_full, data_f, env,
               fset, 2)
    th = bench("T125 sub4 N30       ", pops[30], ts_half, data_h, env,
               fset, 4)
    os.environ["MTGP_POLICY_UNROLLED"] = "1"
    try:
        unr = bench("T250 sub4 N30 unroll", pops[30], ts_full, data_f, env,
                    fset, 4)
    finally:
        del os.environ["MTGP_POLICY_UNROLLED"]

    # decomposition: per-substep work scales with substeps (s2 vs base);
    # per-save work is what's left at fixed T
    per_sub = (base - s2) / (250 * 2)      # cost of one substep (4 stages)
    per_save = base / 250 - 4 * per_sub    # per-save residue (staging+save_u)
    tree_slope = (n60 - n15) / 45          # ms per node of max_nodes
    print(f"  -> per-substep (4 stages) {1e6 * per_sub:.2f} us/save-step; "
          f"per-save residue {1e6 * per_save:.2f} us "
          f"({100 * per_save * 250 / base:.0f}% of wall)")
    print(f"  -> tree-eval slope {1e6 * tree_slope:.3f} ms per max_node "
          f"across N15->N60; N30 tree share ~"
          f"{100 * (base - n15) / base:.0f}%+ (vs N15 floor)")
    print(f"  -> unrolled/rolled = {unr / base:.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
