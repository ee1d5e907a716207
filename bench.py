"""Benchmark harness: node-evaluations/sec/chip on the pop-4096 ODE workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json north star): population 4096, ODE fitness — every
candidate's trees are integrated by the fused (population x trajectories)
RK4 rollout. "Node evaluations" counts interpreter row-steps: every tree row
advanced on every lane of every drift call (the reference's unit is one
``lax.switch`` dispatch per row, SURVEY.md §3.3 / BASELINE.md cost model).
vs_baseline is measured against the 1e9 node-evals/sec/chip target.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import jax.random as jr

TARGET = 1.0e9  # node-evals/sec/chip north star (BASELINE.json)


def wait_for_backend(budget_s: float | None = None,
                     probe_interval_s: float = 20.0) -> bool:
    """Bounded retry/backoff on backend init before any real work.

    The axon tunnel can be transiently UNAVAILABLE (a killed computation wedges
    the chip for ~60-90 s); a single failed first device op would abort the
    whole bench (this is exactly what produced the rc=1 BENCH_r01 capture).

    Probes run in a SUBPROCESS: jax caches a failed backend init for the life
    of the process (xla_bridge._backend_errors), so an in-process retry loop
    would just re-raise the first failure forever — and would leave this
    process's backend poisoned even after the tunnel recovers.  Only once a
    subprocess matmul succeeds does this process touch the device.  Each probe
    gets its own timeout because a down tunnel HANGS backend init (observed
    ~7 min) rather than failing fast; killing a probe that never reached the
    device does not wedge the chip.

    Returns True on success.  On failure the default is to FAIL FAST with an
    explicit error JSON line: proceeding would hang this process on backend
    init (observed ~7 min per attempt with the tunnel down), which can eat
    the driver's whole capture window — and a CPU-fallback number would not
    be a chip measurement.  Set MTGP_BENCH_ON_DOWN=proceed to attempt the
    workload anyway (e.g. when deliberately benching another backend).
    """
    import os
    import subprocess

    if budget_s is None:
        budget_s = float(os.environ.get("MTGP_BENCH_PROBE_BUDGET_S", 240.0))
    probe_src = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
                 "jax.block_until_ready(x @ x); print(jax.default_backend())")
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        err = ""
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, text=True, timeout=120,
            )
            if r.returncode == 0 and r.stdout.strip():
                backend = r.stdout.strip().splitlines()[-1]
                print(f"# backend probe ok ({backend}) after "
                      f"{time.monotonic() - t0:.0f}s, {attempt} attempt(s)",
                      file=sys.stderr)
                if backend != "tpu":
                    print(f"# WARNING: default backend is '{backend}', not "
                          "tpu — numbers below are NOT a chip measurement",
                          file=sys.stderr)
                return True
            err = (r.stderr or "").strip().splitlines()[-1:] or ["rc != 0"]
            err = err[0][:160]
        except subprocess.TimeoutExpired:
            err = "probe subprocess timed out (backend init hang)"
        elapsed = time.monotonic() - t0
        print(f"# backend probe {attempt} failed after {elapsed:.0f}s: {err}",
              file=sys.stderr)
        if elapsed > budget_s:
            if os.environ.get("MTGP_BENCH_ON_DOWN") == "proceed":
                print("# backend probe budget exhausted; attempting bench "
                      "anyway (MTGP_BENCH_ON_DOWN=proceed)", file=sys.stderr)
                return False
            print("# backend probe budget exhausted; failing fast "
                  "(set MTGP_BENCH_ON_DOWN=proceed to override)",
                  file=sys.stderr)
            cfg = sys.argv[1] if len(sys.argv) > 1 else "default"
            print(json.dumps({
                # key-match the config's success metric so per-metric series
                # register the failure as 0.0 instead of dropping it
                "metric": _METRIC_BY_CFG.get(cfg, "node_evals_per_sec_per_chip"),
                "value": 0.0,
                "unit": "node-evals/s", "vs_baseline": 0.0,
                "error": f"tpu backend unavailable after {elapsed:.0f}s "
                         f"({attempt} probes): {err}",
            }))
            raise SystemExit(1)
        time.sleep(probe_interval_s)


def main(
    population_size: int = 4096,
    batch_size: int = 16,
    horizon: float = 10.0,
    dt: float = 0.2,
    substeps: int = 1,
    max_nodes: int = 32,
    repeats: int = 5,
    max_init_depth: int = 4,
    interpreter: str = "auto",
    method: str = "rk4",
):
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.utils.metrics import node_evals_per_evaluation

    operators = [
        ("+", jnp.add, 2, 0.5),
        ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5),
        ("/", jnp.divide, 2, 0.1),
    ]
    fset = build_function_set(operators, [["x0", "x1"]], [2])
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, horizon, dt)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=batch_size, substeps=8)

    sampler = make_population_sampler(fset, max_init_depth=max_init_depth, max_nodes=max_nodes)
    pop = sampler(jr.PRNGKey(1), population_size)
    evaluator = SREvaluator(
        fset, substeps=substeps, interpreter=interpreter, method=method,
        adaptive_method="dopri5",  # the notebooks' solver (method="adaptive")
    )

    eval_fn = jax.jit(lambda p: evaluator.evaluate_population(p, data))
    fitness = jax.block_until_ready(eval_fn(pop))  # compile + warm up
    assert bool(jnp.isfinite(fitness).all())

    # steady-state evaluation rate: K back-to-back evaluations inside ONE
    # jitted scan — the production shape (fit() evaluates every generation
    # on-device). A single dispatched eval would mostly measure host->device
    # launch latency at this scale. The const nudge (+1e-30, below f32
    # resolution of any live constant — bit-identical result) chains the
    # iterations so XLA cannot collapse them.
    # the ladder/pallas diagnostic configs keep single-eval timing — their
    # scan-wrapped compile is minutes for no insight
    chain_k = 10 if interpreter == "auto" else 1

    if chain_k > 1:
        # prepared chain (r5): the size sort + lane layout are structure-
        # dependent and loop-invariant across the chain. Prepare is traced
        # INSIDE the jit with the population as an ARGUMENT: closing over the
        # laid-out operands embeds them as compile-time constants, which blew
        # the axon remote-compile HTTP body limit at pod scale (HTTP 413);
        # traced per call, the layout runs once and amortizes over chain_k,
        # and the scan body carries only the SORTED constants.
        # MTGP_BENCH_NO_PREP=1 A/Bs the per-eval-layout chain.
        use_prep = (
            method != "adaptive"
            and os.environ.get("MTGP_BENCH_NO_PREP") != "1"
            and evaluator.prepare_chained(pop, data) is not None
        )

        # the digest reduce (one scalar) is fetched with float(): a bogus 5e15
        # pod reading in r2 showed block_until_ready returning early over the
        # axon tunnel on some repeats — a host fetch of a value that DEPENDS
        # on the whole result cannot return before the work is done
        if use_prep:
            def run_all(pop_in):
                step, const0 = evaluator.prepare_chained(pop_in, data)

                def chained(const, _):
                    fit = step(const)
                    return const + 1e-30 * jnp.min(fit), fit

                return jnp.sum(
                    jax.lax.scan(chained, const0, None, length=chain_k)[1]
                )

            run_k = jax.jit(run_all)
            float(run_k(pop))  # compile
            timed = lambda: float(run_k(pop))
        else:
            def chained(const, _):
                fit = evaluator.evaluate_population(
                    pop._replace(const=const), data
                )
                return const + 1e-30 * jnp.min(fit), fit

            run_k = jax.jit(
                lambda c: jnp.sum(
                    jax.lax.scan(chained, c, None, length=chain_k)[1]
                )
            )
            float(run_k(pop.const))  # compile
            timed = lambda: float(run_k(pop.const))
    else:
        timed = lambda: jax.block_until_ready(eval_fn(pop))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        timed()
        times.append(time.perf_counter() - t0)
    dt_best = min(times) / chain_k
    print(f"# raw eval times (s, {chain_k} chained each): "
          f"{[f'{t:.4f}' for t in times]}", file=sys.stderr)

    if method == "adaptive":
        # EXACT work count from the kernel's controller-effort telemetry:
        # per-tile ATTEMPTED embedded steps (accepted + rejected — the tile
        # executes a step while any lane is active, so this is what the
        # chip computed) x drift calls per step x trees x nodes x tile lanes
        from multitreegp_tpu.core.pallas_rollout import (
            SUBLANES_DEEP, adaptive_global_available, adaptive_solver_stats,
            rollout_sr_fitness_adaptive_global_pallas,
        )
        from multitreegp_tpu.models.integrators import adaptive_step_budget

        x0s, _, ys_t, _ = data
        d = x0s.shape[-1]
        per_interval = adaptive_step_budget(substeps)
        # count steps from the kernel the evaluator actually dispatched
        # (global-budget default since r5; MTGP_ADAPTIVE_GLOBAL=0 restores
        # the per-interval kernel)
        use_global = (
            os.environ.get("MTGP_ADAPTIVE_GLOBAL", "auto") != "0"
            and adaptive_global_available(fset, pop, d, int(ts.shape[0]))
        )
        if use_global:
            _, _, steps = jax.block_until_ready(
                rollout_sr_fitness_adaptive_global_pallas(
                    pop,
                    jnp.broadcast_to(
                        x0s[None], (population_size, batch_size, d)
                    ),
                    ts, ys_t, fset, rtol=evaluator.rtol, atol=evaluator.atol,
                    budget=500,  # the evaluator's default (reference config)
                    method=evaluator.adaptive_method, return_steps=True,
                )
            )
        else:
            _, _, steps = jax.block_until_ready(adaptive_solver_stats(
                pop,
                jnp.broadcast_to(x0s[None], (population_size, batch_size, d)),
                ts, ys_t, fset, rtol=evaluator.rtol,
                atol=evaluator.atol, max_steps=per_interval,
                method=evaluator.adaptive_method,
            ))
        # FSAL carry (default on): the kernel computes 6 drifts per dopri5
        # attempt / 3 per bosh3 (the carried k1 replaces the first stage);
        # count what the chip actually executes
        fsal = (os.environ.get("MTGP_ADAPTIVE_NO_FSAL") != "1"
                and os.environ.get("MTGP_ADAPTIVE_FSAL", "1") == "1")
        drifts_per_step = ({"dopri5": 6, "bosh3": 3} if fsal
                           else {"dopri5": 7, "bosh3": 4})[
                               evaluator.adaptive_method]
        tile_lanes = SUBLANES_DEEP * 128
        node_evals = (
            float(jnp.sum(steps)) * drifts_per_step
            * fset.num_trees * max_nodes * tile_lanes
        )
        print(f"# adaptive attempted steps: total {float(jnp.sum(steps)):.0f}"
              f" over {steps.shape[0]} tiles x {ts.shape[0] - 1} intervals",
              file=sys.stderr)
    else:
        node_evals = node_evals_per_evaluation(
            population_size=population_size,
            num_trees=fset.num_trees,
            max_nodes=max_nodes,
            batch_size=batch_size,
            num_save_points=ts.shape[0],
            substeps=substeps,
            method=evaluator.method,
        )
    rate = node_evals / dt_best
    print(
        json.dumps(
            {
                "metric": "node_evals_per_sec_per_chip"
                          + ("_adaptive" if method == "adaptive" else ""),
                "value": rate,
                "unit": "node-evals/s",
                "vs_baseline": rate / TARGET,
            }
        )
    )
    return rate


def main_policy(
    population_size: int = 4096,
    batch_size: int = 16,
    horizon: float = 50.0,
    dt: float = 0.2,
    substeps: int = 4,
    max_nodes: int = 30,
    repeats: int = 5,
    method: str = "rk4",
):
    """Closed-loop control workload (Acrobot swing-up) through the fused
    policy rollout kernel. Default pop=4096 — the north star's literal shape
    ("pop-4096 ODE-policy workload", BASELINE.json); ``policy_nb`` keeps the
    StaticPolicy-notebook population (512) for comparison with r1 numbers."""
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.utils.metrics import node_evals_per_evaluation

    operators = [
        ("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2),
        ("sin", jnp.sin, 1), ("cos", jnp.cos, 1),
    ]
    env = Acrobot(0.0, 0.0)
    fset = build_function_set(operators, [[f"y{i}" for i in range(env.n_obs)]],
                              [env.n_control])
    ts = jnp.arange(0.0, horizon, dt)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=batch_size)
    pop = make_population_sampler(fset, 4, max_nodes)(jr.PRNGKey(1), population_size)
    evaluator = StaticPolicyEvaluator(
        env, fset, substeps=substeps, method=method,
        # the StaticPolicy notebook's controller (cell 4):
        # PIDController(atol=1e-4, rtol=1e-4) + Dopri5
        rtol=1e-4, atol=1e-4, adaptive_method="dopri5",
    )

    eval_fn = jax.jit(lambda p: evaluator.evaluate_population(p, data))
    fitness = jax.block_until_ready(eval_fn(pop))
    assert bool(jnp.isfinite(fitness).all())

    # steady-state shape, same methodology as main(): chain K=10 evaluations
    # in one jitted scan so the ~50 ms tunnel dispatch latency doesn't pollute
    # the measurement (r1 quirk: single-eval timing mixed ~50 ms into 113 ms)
    chain_k = 10

    def chained(const, _):
        fit = evaluator.evaluate_population(pop._replace(const=const), data)
        return const + 1e-30 * jnp.min(fit), fit

    # scalar-digest fetch for reliable completion semantics (see main())
    run_k = jax.jit(
        lambda c: jnp.sum(jax.lax.scan(chained, c, None, length=chain_k)[1])
    )
    float(run_k(pop.const))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_k(pop.const))
        times.append(time.perf_counter() - t0)
    dt_best = min(times) / chain_k
    print(f"# raw eval times (s, {chain_k} chained each): "
          f"{[f'{t:.4f}' for t in times]}", file=sys.stderr)

    if method == "adaptive":
        # EXACT work count from the kernel's per-tile attempted-step
        # telemetry (same convention as the SR adaptive bench): drifts per
        # attempt x policy trees x nodes x tile lanes, plus the in-kernel
        # save-grid control evals (T save points x trees)
        from multitreegp_tpu.core.pallas_policy import (
            TILE, rollout_policy_adaptive_pallas,
        )
        from multitreegp_tpu.models.integrators import adaptive_step_budget

        x0s, _, targets, _, _, params = data
        out = jax.block_until_ready(rollout_policy_adaptive_pallas(
            pop, x0s, ts, targets, params, env, fset,
            rtol=evaluator.rtol, atol=evaluator.atol,
            max_steps=adaptive_step_budget(substeps),
            method=evaluator.adaptive_method, stream_controls=True,
            return_steps=True,
        ))
        steps = out[-1]
        fsal = (os.environ.get("MTGP_ADAPTIVE_NO_FSAL") != "1"
                and os.environ.get("MTGP_ADAPTIVE_FSAL", "1") == "1")
        drifts = ({"dopri5": 6, "bosh3": 3} if fsal
                  else {"dopri5": 7, "bosh3": 4})[evaluator.adaptive_method]
        node_evals = (
            (float(jnp.sum(steps)) * drifts + steps.shape[0] * ts.shape[0])
            * fset.num_trees * max_nodes * TILE
        )
        print(f"# policy adaptive attempted steps: total "
              f"{float(jnp.sum(steps)):.0f} over {steps.shape[0]} tiles x "
              f"{ts.shape[0] - 1} intervals", file=sys.stderr)
    else:
        node_evals = node_evals_per_evaluation(
            population_size=population_size,
            num_trees=fset.num_trees,
            max_nodes=max_nodes,
            batch_size=batch_size,
            num_save_points=ts.shape[0],
            substeps=substeps,
            method=evaluator.method,
            replay_trees=fset.num_trees,
        )
    rate = node_evals / dt_best
    print(
        json.dumps(
            {
                "metric": "policy_node_evals_per_sec_per_chip"
                          + ("_adaptive" if method == "adaptive" else ""),
                "value": rate,
                "unit": "node-evals/s",
                "vs_baseline": rate / TARGET,
            }
        )
    )
    return rate


def main_generations(
    population_size: int = 4096,
    batch_size: int = 16,
    horizon: float = 10.0,
    dt: float = 0.2,
    generations: int = 20,
    max_nodes: int = 32,
    max_init_depth: int = 4,
    coefficient_optimisation: bool = False,
    shard: bool = False,
    metric_suffix: str = "",
):
    """Full-generation throughput: evaluate + select + crossover/mutate +
    migrate, fused on device (BASELINE.json: 'generations/sec at pop=4096').

    With ``coefficient_optimisation`` the run matches the reference's actual
    production loop: Adam refinement of the top-k candidates' constants on
    the (gen>10, every 5th) schedule — 2 of the 20 timed generations here."""
    from multitreegp_tpu import GeneticProgramming
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, horizon, dt)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=batch_size)
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
        coefficient_optimisation=coefficient_optimisation,
    )
    warm, _, _, _ = gp.fit(jr.PRNGKey(1), data, num_generations=generations,
                           shard=shard)  # compile
    float(jnp.sum(warm))
    t0 = time.perf_counter()
    best_fit, _, _, _ = gp.fit(jr.PRNGKey(1), data, num_generations=generations,
                               shard=shard)
    float(jnp.sum(best_fit))  # scalar fetch: reliable completion (see main())
    rate = generations / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "generations_per_sec_pop4096"
                          + ("_constopt" if coefficient_optimisation else "")
                          + metric_suffix,
                "value": rate,
                "unit": "generations/s",
                "vs_baseline": rate,  # reference: ~1 host-driven gen/s class
            }
        )
    )
    return rate


def main_evolved(
    population_size: int = 4096,
    batch_size: int = 16,
    horizon: float = 10.0,
    dt: float = 0.2,
    generations: int = 20,
    max_nodes: int = 32,
    max_init_depth: int = 4,
    repeats: int = 5,
    metric_suffix: str = "",
):
    """Steady-state eval throughput on an EVOLVED population (VERDICT r2 #5):
    fresh-population benches hide size bloat — after ~20 generations the
    population's mean tree size grows ~5x (crossover splices subtrees far
    apart, mean size ~30 at N=128) and the r2 quadratic-gather pathology was
    invisible to every fresh-pop config. This config evolves 20 generations
    first, then times evaluation of the resulting bloated population with the
    same chained-scan methodology as `main()`."""
    from multitreegp_tpu import GeneticProgramming
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.utils.metrics import node_evals_per_evaluation

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, horizon, dt)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=batch_size, substeps=8)
    evaluator = SREvaluator(substeps=1)
    gp = GeneticProgramming(
        num_generations=generations,
        population_size=population_size // 8,
        fitness_function=evaluator,
        operator_list=[("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
                       ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_nodes=max_nodes,
        max_init_depth=max_init_depth,
    )
    _, _, final_pop, _ = gp.fit(jr.PRNGKey(1), data, num_generations=generations)
    pop = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), final_pop
    )
    sizes = jnp.sum(pop.ops != 0, axis=(1, 2))
    print(f"# evolved population after {generations} gens: mean size "
          f"{float(sizes.mean()):.1f}, p99 {float(jnp.percentile(sizes, 99)):.0f},"
          f" max {int(sizes.max())} (N={max_nodes})", file=sys.stderr)

    chain_k = 10

    # prepared chain (r5): hoist sort+layout out of the chained scan — see
    # main() (prepare traced inside the jit, population as argument, to keep
    # the laid-out operands out of the compile payload).
    # MTGP_BENCH_NO_PREP=1 A/Bs.
    use_prep = (
        os.environ.get("MTGP_BENCH_NO_PREP") != "1"
        and evaluator.prepare_chained(pop, data) is not None
    )
    if use_prep:
        def run_all(pop_in):
            step, const0 = evaluator.prepare_chained(pop_in, data)

            def chained(const, _):
                fit = step(const)
                return const + 1e-30 * jnp.min(fit), fit

            return jnp.sum(
                jax.lax.scan(chained, const0, None, length=chain_k)[1]
            )

        run_k = jax.jit(run_all)
        arg = pop
    else:
        def chained(const, _):
            fit = evaluator.evaluate_population(pop._replace(const=const), data)
            return const + 1e-30 * jnp.min(fit), fit

        run_k = jax.jit(
            lambda c: jnp.sum(jax.lax.scan(chained, c, None, length=chain_k)[1])
        )
        arg = pop.const
    float(run_k(arg))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_k(arg))
        times.append(time.perf_counter() - t0)
    dt_best = min(times) / chain_k
    print(f"# raw eval times (s, {chain_k} chained each): "
          f"{[f'{t:.4f}' for t in times]}", file=sys.stderr)

    node_evals = node_evals_per_evaluation(
        population_size=population_size,
        num_trees=gp.fset.num_trees,
        max_nodes=max_nodes,
        batch_size=batch_size,
        num_save_points=ts.shape[0],
        substeps=1,
        method=evaluator.method,
    )
    rate = node_evals / dt_best
    print(
        json.dumps(
            {
                "metric": "node_evals_per_sec_per_chip_evolved" + metric_suffix,
                "value": rate,
                "unit": "node-evals/s",
                "vs_baseline": rate / TARGET,
            }
        )
    )
    return rate


CONFIGS = {
    # BASELINE.json workloads. Default = the pop-4096 ODE north-star.
    "default": {},
    "deep": {"max_nodes": 128, "max_init_depth": 7},  # deep trees (depth-12 class)
    "pod": {"population_size": 65536},  # pod-scale population, single chip here
    "ladder": {"interpreter": "ladder"},
    "pallas": {"interpreter": "pallas"},
    # the notebooks' actual solver configuration (Dopri5 + PID), fused:
    # global-budget kernel (diffrax max_steps semantics) by default;
    # "adaptive_interval" A/Bs the r2-r4 per-interval kernel
    "adaptive": {"method": "adaptive"},
    "adaptive_interval": {"method": "adaptive"},
}

# success-line metric name per config (the fail-fast error line must use the
# same key so a per-metric series records the failure instead of dropping it)
_METRIC_BY_CFG = {
    **{cfg: "node_evals_per_sec_per_chip" for cfg in CONFIGS},
    "adaptive": "node_evals_per_sec_per_chip_adaptive",
    "adaptive_interval": "node_evals_per_sec_per_chip_adaptive",
    "policy": "policy_node_evals_per_sec_per_chip",
    "policy_adaptive": "policy_node_evals_per_sec_per_chip_adaptive",
    "policy_nb": "policy_node_evals_per_sec_per_chip",
    "gen": "generations_per_sec_pop4096",
    "gen_opt": "generations_per_sec_pop4096_constopt",
    "gen_opt_deep": "generations_per_sec_pop4096_constopt_deep",
    "gen_shard": "generations_per_sec_pop4096_shard",
    "gen_deep": "generations_per_sec_pop4096_deep",
    "evolved": "node_evals_per_sec_per_chip_evolved",
    "evolved_deep": "node_evals_per_sec_per_chip_evolved_deep",
}

if __name__ == "__main__":
    wait_for_backend()
    cfg = sys.argv[1] if len(sys.argv) > 1 else "default"
    if cfg == "adaptive_interval":
        os.environ["MTGP_ADAPTIVE_GLOBAL"] = "0"
    if cfg == "policy":
        main_policy()
    elif cfg == "policy_adaptive":
        # the StaticPolicy notebook's ACTUAL solver (Dopri5 + PID 1e-4)
        # through the fused adaptive policy kernel (r5). substeps=8 sets the
        # per-interval budget to 8 (adaptive_step_budget): Mosaic executes
        # the full static budget predicated, so the budget IS the wall; the
        # notebook's own whole-solve max_steps=1000 averages ~4/interval at
        # this horizon and sound lanes need ~3-6 attempts — 8 covers them
        # with margin, the default 32 would just quadruple the wall.
        main_policy(method="adaptive", substeps=8)
    elif cfg == "policy_nb":
        main_policy(population_size=512)
    elif cfg == "gen":
        main_generations()
    elif cfg == "gen_opt":
        # the reference's production loop shape: const-opt rounds included
        main_generations(coefficient_optimisation=True)
    elif cfg == "gen_shard":
        # the production multi-chip composition (fit(shard=True): explicit
        # collectives + fused kernels inside shard_map) on the local mesh —
        # on one chip this measures the collective-path overhead vs "gen"
        main_generations(shard=True, metric_suffix="_shard")
    elif cfg == "gen_opt_deep":
        # const-opt at deep trees: Adam refinement recomputes through the
        # per-call interpreter kernels (windowed gather) on top-k candidates
        main_generations(max_nodes=128, max_init_depth=7,
                         coefficient_optimisation=True,
                         metric_suffix="_deep")
    elif cfg == "evolved":
        # steady-state: eval throughput on a 20-generation evolved
        # (size-bloated) population — the production population shape
        main_evolved()
    elif cfg == "evolved_deep":
        main_evolved(max_nodes=128, max_init_depth=7, metric_suffix="_deep")
    elif cfg == "gen_deep":
        # end-to-end generations with deep trees: the N<=256 fused reproduce
        # (shift-rows surgery) + the windowed deep rollout, one launch each
        main_generations(max_nodes=128, max_init_depth=7,
                         metric_suffix="_deep")
    else:
        main(**CONFIGS[cfg])
