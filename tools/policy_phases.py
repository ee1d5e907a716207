"""Per-phase timing of the policy population evaluation (VERDICT r2 #3).

Splits `StaticPolicyEvaluator.evaluate_population` at the bench `policy`
config's exact shapes (Acrobot, pop 4096, batch 16, T=250, substeps 4,
N=30) into its three phases and times each on the TPU with the bench's
chained-scan + scalar-digest methodology:

  A. rollout   — the fused Pallas kernel (xs streamed to HBM)
  B. replay    — post-hoc ys/us re-derivation on the save grid
                 (a second, XLA-side interpreter pass over T*P*B points)
  C. cost      — env.fitness over (P, B) trajectories + divergence masking
  T. total     — evaluate_population end-to-end (the bench number)

Usage: python tools/policy_phases.py [pop]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jr

sys.path.insert(0, "/root/repo")

from multitreegp_tpu.core.registry import build_function_set
from multitreegp_tpu.models.environments import Acrobot
from multitreegp_tpu.models.evaluators import (
    StaticPolicyEvaluator,
    generate_control_data,
)
from multitreegp_tpu.ops.initialization import make_population_sampler

POP = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
CHAIN = 10
REPEATS = 5


def bench(name, fn, *args):
    """fn must return a scalar digest; chained CHAIN times inside one jit."""
    run = jax.jit(fn)
    t0 = time.time()
    float(run(*args))  # compile
    print(f"{name}: compile {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    per = min(times) / CHAIN
    print(f"{name}: {per * 1e3:.2f} ms/eval  (raw {[f'{t:.3f}' for t in times]})",
          flush=True)
    return per


def main():
    operators = [
        ("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2),
        ("sin", jnp.sin, 1), ("cos", jnp.cos, 1),
    ]
    env = Acrobot(0.0, 0.0)
    fset = build_function_set(
        operators, [[f"y{i}" for i in range(env.n_obs)]], [env.n_control]
    )
    ts = jnp.arange(0.0, 50.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=16)
    pop = make_population_sampler(fset, 4, 30)(jr.PRNGKey(1), POP)
    ev = StaticPolicyEvaluator(env, fset, substeps=4)

    # one rollout kept on device as the replay/cost input
    xs0, alive0, us_stream = jax.jit(lambda p: ev._rollout(p, data))(pop)
    xs0 = jax.block_until_ready(xs0)
    print(f"xs: {xs0.shape} {xs0.dtype} "
          f"({xs0.size * 4 / 1e6:.0f} MB); streamed us: "
          f"{None if us_stream is None else us_stream.shape}", flush=True)

    # A. rollout only (chained: const bump keeps iterations dependent) —
    # includes the in-kernel control replay when us_stream is not None
    def roll_chain(const):
        def step(c, _):
            out = ev._rollout(pop._replace(const=c), data)
            xs = out[0]
            return c + 1e-30 * jnp.sum(xs[-1]), jnp.sum(xs[-1])
        return jnp.sum(jax.lax.scan(step, const, None, length=CHAIN)[1])

    t_roll = bench("A rollout ", roll_chain, pop.const)

    # B. replay only (xs fixed; digest feeds back through a tiny bump)
    def replay_chain(xs):
        def step(x, _):
            ys, us = ev._replay(pop, x, data)
            d = jnp.sum(us) + jnp.sum(ys[-1])
            return x + 1e-30 * d, d
        return jnp.sum(jax.lax.scan(step, xs, None, length=CHAIN)[1])

    t_replay = bench("B replay  ", replay_chain, xs0)

    # C. cost only (needs us too — prepare once)
    ys0, us0 = jax.jit(lambda xs: ev._replay(pop, xs, data))(xs0)
    us0 = jax.block_until_ready(us0)

    def cost_chain(xs, us):
        def step(x, _):
            xs_pb = jnp.transpose(x, (1, 2, 0, 3))
            us_pb = jnp.transpose(us, (1, 2, 0, 3))
            cost = jax.vmap(
                jax.vmap(env.fitness, in_axes=(0, 0, 0, None, 0)),
                in_axes=(0, 0, None, None, None),
            )(xs_pb, us_pb, data[2], ts, data[5])
            d = jnp.sum(cost)
            return x + 1e-30 * d, d
        return jnp.sum(jax.lax.scan(step, xs, None, length=CHAIN)[1])

    t_cost = bench("C cost    ", cost_chain, xs0, us0)

    # T. end-to-end (the bench methodology)
    def total_chain(const):
        def step(c, _):
            fit = ev.evaluate_population(pop._replace(const=c), data)
            return c + 1e-30 * jnp.min(fit), fit
        return jnp.sum(jax.lax.scan(step, const, None, length=CHAIN)[1])

    t_total = bench("T total   ", total_chain, pop.const)

    print(f"\npop={POP}: rollout {t_roll * 1e3:.1f} + replay "
          f"{t_replay * 1e3:.1f} + cost {t_cost * 1e3:.1f} = "
          f"{(t_roll + t_replay + t_cost) * 1e3:.1f} ms vs total "
          f"{t_total * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
