"""Golden RUN parity: full evolution loops, reference vs multitreegp_tpu.

Drives the REFERENCE's complete GP loop (its initializer, its evolve with
crossover/mutation/migration, its SR evaluator through the diffrax shim) on
the SymbolicRegression notebook workload, and the same configuration through
our stack, over several seeds. The RNG streams are different by construction
(SURVEY.md §7 "hard parts" 3 — the reference's own stream differs across jax
versions too), so the comparison is the STATISTICAL one the baseline asks
for: best-so-far fitness trajectories must decay comparably and reach
comparable final quality.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/golden_run.py
Appends the summary to docs/GOLDEN_PARITY.md.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from golden_parity import patch_shard_map  # noqa: E402  (same tools dir)

sys.path.insert(0, os.path.dirname(__file__))


def reference_run(data, seeds, generations, population_size, num_islands,
                  operator_list, dt0, solver_config: str = "euler"):
    from MultiTreeGP.evaluators.SR_evaluator import Evaluator as RefEvaluator
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    if solver_config == "adaptive":
        # the notebook's actual solver (SymbolicRegression.ipynb cell 6):
        # Dopri5 + PIDController, executed via the shim's adaptive path
        import diffrax

        make_evaluator = lambda: RefEvaluator(
            solver=diffrax.Dopri5(), dt0=dt0,
            stepsize_controller=diffrax.PIDController(
                atol=1e-6, rtol=1e-6, dtmin=0.001
            ),
            max_steps=500,
        )
    else:
        make_evaluator = lambda: RefEvaluator(dt0=dt0)

    curves = []
    for seed in seeds:
        ref_gp = RefGP(
            num_generations=generations,
            population_size=population_size,
            fitness_function=make_evaluator(),
            operator_list=operator_list,
            variable_list=[["x0", "x1"]],
            layer_sizes=jnp.array([2]),
            num_populations=num_islands,
        )
        # jax>=0.7 compat: the reference bakes num_trees as a jnp scalar into
        # its jitted evolve partial; shapes must be hashable now — rebuild
        # the partial with a python int
        from functools import partial as _partial

        from MultiTreeGP.genetic_operators.reproduction import evolve_population

        ref_gp.jit_evolve_population = jax.jit(_partial(
            evolve_population,
            reproduction_functions=ref_gp.reproduction_functions,
            elite_size=ref_gp.elite_size,
            tournament_size=ref_gp.tournament_size,
            num_trees=int(ref_gp.num_trees),
            population_size=population_size,
        ))
        # jit the eval with data CLOSED OVER so SaveAt.ts stays concrete for
        # the fixed-step shim (the reference's own jit_eval traces data)
        eval_fn = jax.jit(
            lambda arr: ref_gp.vmap_trees(arr[..., 3:], arr[..., :3], data)
        )
        key = jr.PRNGKey(seed)
        key, k_init = jr.split(key)
        pops = ref_gp.initialize_population(k_init)
        best = []
        for _g in range(generations):
            flat = pops.reshape(-1, *pops.shape[2:])
            fitness = np.asarray(eval_fn(flat))
            best.append(float(np.min(fitness)))
            key, k_ev = jr.split(key)
            pops = ref_gp.evolve(
                pops, jnp.asarray(fitness).reshape(num_islands, population_size),
                k_ev,
            )
        curves.append(np.minimum.accumulate(best))
    return np.asarray(curves)


def our_run(data, seeds, generations, population_size, num_islands,
            operator_list, substeps, solver_config: str = "euler"):
    from multitreegp_tpu import GeneticProgramming
    from multitreegp_tpu.models.evaluators import SREvaluator

    if solver_config == "adaptive":
        # matches golden_parity.main_adaptive: per-lane Dopri5(4) + PID
        make_evaluator = lambda: SREvaluator(
            method="adaptive", adaptive_method="dopri5",
            rtol=1e-6, atol=1e-6, substeps=32, interpreter="ladder",
        )
    else:
        make_evaluator = lambda: SREvaluator(
            method="euler", substeps=substeps, interpreter="ladder"
        )

    curves = []
    for seed in seeds:
        gp = GeneticProgramming(
            num_generations=generations,
            population_size=population_size,
            fitness_function=make_evaluator(),
            operator_list=operator_list,
            variable_list=[["x0", "x1"]],
            layer_sizes=[2],
            num_populations=num_islands,
        )
        best, _sol, _pop, _fit = gp.fit(jr.PRNGKey(seed), data)
        curves.append(np.minimum.accumulate(np.asarray(best)))
    return np.asarray(curves)


def main(generations: int = 30, population_size: int = 60, num_islands: int = 2,
         batch_size: int = 8, horizon: float = 5.0, save_dt: float = 0.2,
         dt0: float = 0.01, seeds=(0, 1, 2), report_path: str | None = None,
         decay_factor: float = 0.5, agree_slack: float = 0.5,
         solver_config: str = "euler"):
    patch_shard_map()

    import diffrax

    from MultiTreeGP.environments.SR_environments.vd_pol_oscillator import (
        VanDerPolOscillator as RefVdP,
    )

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    env = RefVdP(0.0, 0.0)
    k_init, k_noise = jr.split(jr.PRNGKey(42))
    x0s = env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)

    def true_traj(x0):
        sol = diffrax.diffeqsolve(
            diffrax.ODETerm(lambda t, x, a: env.drift(t, x, a)),
            diffrax.Euler(), float(ts[0]), float(ts[-1]), dt0, x0,
            saveat=diffrax.SaveAt(ts=ts), throw=False,
        )
        return sol.ys

    ys = jax.vmap(true_traj)(x0s)
    data = (x0s, ts, ys, jr.split(k_noise, batch_size))

    ref = reference_run(
        data, seeds, generations, population_size, num_islands, operator_list,
        dt0, solver_config=solver_config,
    )
    ours = our_run(
        data, seeds, generations, population_size, num_islands, operator_list,
        substeps=int(round(save_dt / dt0)), solver_config=solver_config,
    )

    ref_med = np.median(ref, axis=0)
    our_med = np.median(ours, axis=0)
    gens_shown = sorted(set(
        g for g in (0, 4, 9, 19, generations - 1) if g < generations
    ))
    lines = [
        "",
        "## Golden RUN parity: full evolution loops (VdP SR, "
        f"pop {population_size} x {num_islands} islands, {generations} gens, "
        f"{len(seeds)} seeds"
        + (", Dopri5+PID — the notebook's solver)" if solver_config == "adaptive"
           else ")"),
        "",
        "| generation | reference median best | ours median best |",
        "|---|---|---|",
    ] + [
        f"| {g + 1} | {ref_med[g]:.4f} | {our_med[g]:.4f} |" for g in gens_shown
    ] + [
        "",
        f"- final best per seed — reference: {[f'{v:.3f}' for v in ref[:, -1]]},"
        f" ours: {[f'{v:.3f}' for v in ours[:, -1]]}",
        "- different PRNG streams by construction; the criterion is comparable",
        "  decay and comparable final quality (BASELINE.json north star).",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")

    # both stacks must improve substantially and land in the same quality class
    # (CI pins tiny configs with relaxed decay_factor/agree_slack — short runs
    # are decay-noisy; the full-scale criteria are the defaults)
    assert ref_med[-1] < decay_factor * ref_med[0]
    assert our_med[-1] < decay_factor * our_med[0]
    assert our_med[-1] <= max(2.0 * ref_med[-1], ref_med[-1] + agree_slack)
    print("GOLDEN RUN PARITY OK")


def _patch_ref_evolve(ref_gp, population_size):
    """jax>=0.7 compat: rebuild the reference's jitted evolve partial with a
    hashable python-int num_trees (see reference_run)."""
    from functools import partial as _partial

    from MultiTreeGP.genetic_operators.reproduction import evolve_population

    ref_gp.jit_evolve_population = jax.jit(_partial(
        evolve_population,
        reproduction_functions=ref_gp.reproduction_functions,
        elite_size=ref_gp.elite_size,
        tournament_size=ref_gp.tournament_size,
        num_trees=int(ref_gp.num_trees),
        population_size=population_size,
    ))


def _ref_policy_run(make_evaluator, variable_list, layer_sizes, data, seeds,
                    generations, population_size, num_islands, operator_list,
                    size_parsinomy):
    """Full reference loop (its initializer/operators/evaluator via the shim)
    -> best-so-far curves, one per seed."""
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    curves = []
    for seed in seeds:
        ref_gp = RefGP(
            num_generations=generations,
            population_size=population_size,
            fitness_function=make_evaluator(),
            operator_list=operator_list,
            variable_list=variable_list,
            layer_sizes=jnp.array(layer_sizes),
            num_populations=num_islands,
            size_parsinomy=size_parsinomy,
        )
        _patch_ref_evolve(ref_gp, population_size)
        eval_fn = jax.jit(
            lambda arr: ref_gp.vmap_trees(arr[..., 3:], arr[..., :3], data)
        )
        key = jr.PRNGKey(seed)
        key, k_init = jr.split(key)
        pops = ref_gp.initialize_population(k_init)
        best = []
        for _g in range(generations):
            flat = pops.reshape(-1, *pops.shape[2:])
            fitness = np.asarray(eval_fn(flat))
            # parsimony exactly as the reference applies it (:424)
            sizes = np.sum(np.asarray(flat[..., 0]) != 0, axis=(1, 2))
            fitness = fitness + size_parsinomy * sizes
            best.append(float(np.min(fitness)))
            key, k_ev = jr.split(key)
            pops = ref_gp.evolve(
                pops,
                jnp.asarray(fitness).reshape(num_islands, population_size),
                k_ev,
            )
        curves.append(np.minimum.accumulate(best))
    return np.asarray(curves)


def _our_policy_run(make_evaluator, variable_list, layer_sizes, data, seeds,
                    generations, population_size, num_islands, operator_list,
                    size_parsimony):
    from multitreegp_tpu import GeneticProgramming

    curves = []
    for seed in seeds:
        gp = GeneticProgramming(
            num_generations=generations,
            population_size=population_size,
            fitness_function=make_evaluator(),
            operator_list=operator_list,
            variable_list=variable_list,
            layer_sizes=layer_sizes,
            num_populations=num_islands,
            size_parsimony=size_parsimony,
        )
        best, _sol, _pop, _fit = gp.fit(jr.PRNGKey(seed), data)
        curves.append(np.minimum.accumulate(np.asarray(best)))
    return np.asarray(curves)


def _report_policy(title, ref, ours, generations, seeds, report_path,
                   expect_decay=True, agree_tol=2.0):
    ref_med = np.median(ref, axis=0)
    our_med = np.median(ours, axis=0)
    gens_shown = sorted(set(
        g for g in (0, 4, 9, generations - 1) if g < generations
    ))
    lines = [
        "",
        f"## {title}",
        "",
        "| generation | reference median best | ours median best |",
        "|---|---|---|",
    ] + [
        f"| {g + 1} | {ref_med[g]:.4f} | {our_med[g]:.4f} |" for g in gens_shown
    ] + [
        "",
        f"- final best per seed — reference: {[f'{v:.3f}' for v in ref[:, -1]]},"
        f" ours: {[f'{v:.3f}' for v in ours[:, -1]]}",
        "- different PRNG streams by construction; the criterion is comparable",
        "  decay and comparable final quality (BASELINE.json north star).",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert np.isfinite(ref_med[-1]) and np.isfinite(our_med[-1])
    if expect_decay:
        # both stacks improve; ours lands in the reference's quality class
        assert ref_med[-1] < 0.9 * ref_med[0]
        assert our_med[-1] < 0.9 * our_med[0]
        assert our_med[-1] <= max(1.5 * ref_med[-1], ref_med[-1] + 2.0)
    # quality-class agreement holds regardless (Acrobot's time-to-swing-up
    # fitness is flat at reduced scale: both stacks sit at the identical
    # no-swing-up + parsimony floor — itself a strong agreement statement).
    # The absolute agree_tol is calibrated for the ~16-53-scale workloads; on
    # large-scale costs (dynamic harmonic LQR ~100) the per-seed spread WITHIN
    # each stack exceeds any meaningful absolute gap, so the criterion floors
    # at 15% relative.
    assert abs(our_med[-1] - ref_med[-1]) <= max(agree_tol, 0.15 * ref_med[-1])


def _policy_envs(env_name):
    """(ref_env, my_env, variable_list, obs/process noise) per task."""
    if env_name == "acrobot":
        from MultiTreeGP.environments.control_environments.acrobot import (
            Acrobot as RefAcrobot,
        )

        from multitreegp_tpu.models.environments import Acrobot

        return (RefAcrobot(0.05, 0.1), Acrobot(0.05, 0.1),
                ["y1", "y2", "y3", "y4"], [])
    from MultiTreeGP.environments.control_environments.harmonic_oscillator import (
        HarmonicOscillator as RefHO,
    )

    from multitreegp_tpu.models.environments import HarmonicOscillator

    return (RefHO(0.0, 0.0), HarmonicOscillator(0.0, 0.0),
            ["y0", "y1"], ["tgt"])


def main_policy_run(generations: int = 25, population_size: int = 60,
                    num_islands: int = 2, batch_size: int = 8,
                    horizon: float = 10.0, save_dt: float = 0.2,
                    dt0: float = 0.05, seeds=(0, 1, 2),
                    env_name: str = "acrobot",
                    report_path: str | None = None,
                    expect_decay: bool | None = None, agree_tol: float = 2.0):
    """Golden RUN parity on the StaticPolicy notebook workload at reduced
    scale, fixed-step Euler in both stacks (the notebook's adaptive Dopri5
    config is compared candidate-level in golden_parity.main_adaptive).

    Two tasks: the notebook's Acrobot (obs noise 0.1, `size_parsinomy=1`,
    ops +,-,*,sin,cos) — its time-to-swing-up fitness is FLAT at reduced
    scale, so the criterion is curve agreement, not decay — and
    HarmonicOscillator (smooth LQR cost) where both stacks must decay and
    land in the same quality class."""
    patch_shard_map()

    from MultiTreeGP.evaluators.feedforward_evaluate import Evaluator as RefFF

    operator_list = [
        ("+", lambda x, y: x + y, 2, 0.5),
        ("-", lambda x, y: x - y, 2, 0.1),
        ("*", lambda x, y: x * y, 2, 0.5),
        ("sin", lambda x: jnp.sin(x), 1, 0.1),
        ("cos", lambda x: jnp.cos(x), 1, 0.1),
    ]
    ref_env, my_env, obs_vars, tgt_vars = _policy_envs(env_name)
    variables = obs_vars + tgt_vars
    key = jr.PRNGKey(42)
    k_init, k_n1, k_n2, k_param = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    data = (x0s, ts, targets, jr.split(k_n1, batch_size),
            jr.split(k_n2, batch_size), params)

    ref = _ref_policy_run(
        lambda: RefFF(ref_env, dt0=dt0),
        [variables], [ref_env.n_control],
        data, seeds, generations, population_size, num_islands,
        operator_list, size_parsinomy=1,
    )

    from multitreegp_tpu.models.evaluators import StaticPolicyEvaluator

    ours = _our_policy_run(
        lambda: StaticPolicyEvaluator(
            my_env, method="euler", substeps=int(round(save_dt / dt0)),
            interpreter="ladder",
        ),
        [variables], [my_env.n_control],
        data, seeds, generations, population_size, num_islands,
        operator_list, size_parsimony=1,
    )
    _report_policy(
        f"Golden RUN parity: StaticPolicy workload ({env_name}, pop "
        f"{population_size} x {num_islands}, {generations} gens, "
        f"{len(seeds)} seeds, Euler dt0={dt0})",
        ref, ours, generations, seeds, report_path,
        expect_decay=(env_name != "acrobot") if expect_decay is None
        else expect_decay,
        agree_tol=agree_tol,
    )
    print(f"STATIC POLICY RUN PARITY OK ({env_name})")


def main_dynamic_run(generations: int = 25, population_size: int = 60,
                     num_islands: int = 2, batch_size: int = 8,
                     horizon: float = 10.0, save_dt: float = 0.2,
                     dt0: float = 0.05, state_size: int = 2, seeds=(0, 1, 2),
                     env_name: str = "acrobot",
                     report_path: str | None = None,
                     expect_decay: bool | None = None, agree_tol: float = 2.0):
    """Golden RUN parity on the DynamicPolicy notebook workload (stateful
    policy, layer_sizes [state_size, n_control], two variable sets) at
    reduced scale, Euler in both stacks. Acrobot = the notebook task (flat
    fitness at reduced scale -> agreement criterion); HarmonicOscillator
    adds the decay criterion."""
    patch_shard_map()

    from MultiTreeGP.evaluators.dynamic_evaluate import Evaluator as RefDyn

    operator_list = [
        ("+", lambda x, y: x + y, 2, 0.5),
        ("-", lambda x, y: x - y, 2, 0.1),
        ("*", lambda x, y: x * y, 2, 0.5),
        ("sin", lambda x: jnp.sin(x), 1, 0.1),
        ("cos", lambda x: jnp.cos(x), 1, 0.1),
    ]
    ref_env, my_env, obs_vars, tgt_vars = _policy_envs(env_name)
    # data-vector order is [y, a, u, target] (dynamic_evaluate.py:116)
    variable_list = [obs_vars + ["a1", "a2", "u"] + tgt_vars, ["a1", "a2"]]
    key = jr.PRNGKey(43)
    k_init, k_n1, k_n2, k_param = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    data = (x0s, ts, targets, jr.split(k_n1, batch_size),
            jr.split(k_n2, batch_size), params)

    ref = _ref_policy_run(
        lambda: RefDyn(ref_env, state_size, dt0=dt0),
        variable_list, [state_size, ref_env.n_control],
        data, seeds, generations, population_size, num_islands,
        operator_list, size_parsinomy=1,
    )

    from multitreegp_tpu.models.evaluators import DynamicPolicyEvaluator

    ours = _our_policy_run(
        lambda: DynamicPolicyEvaluator(
            my_env, state_size=state_size, method="euler",
            substeps=int(round(save_dt / dt0)), interpreter="ladder",
        ),
        variable_list, [state_size, my_env.n_control],
        data, seeds, generations, population_size, num_islands,
        operator_list, size_parsimony=1,
    )
    _report_policy(
        f"Golden RUN parity: DynamicPolicy workload ({env_name}, "
        f"state_size={state_size}, pop {population_size} x {num_islands}, "
        f"{generations} gens, {len(seeds)} seeds, Euler dt0={dt0})",
        ref, ours, generations, seeds, report_path,
        expect_decay=(env_name != "acrobot") if expect_decay is None
        else expect_decay,
        agree_tol=agree_tol,
    )
    print(f"DYNAMIC POLICY RUN PARITY OK ({env_name})")


if __name__ == "__main__":
    import sys as _sys

    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "sr"):
        main()
    if which == "sr_adaptive":
        # run-level parity under the notebooks' actual solver; smaller shape
        # than the fixed-step run — the shim's batched per-lane PID stepping
        # is CPU-heavy
        main(generations=20, population_size=40, solver_config="adaptive")
    if which in ("all", "policy"):
        main_policy_run(env_name="acrobot")
        main_policy_run(env_name="harmonic", horizon=5.0)
    if which in ("all", "dynamic"):
        main_dynamic_run(env_name="acrobot")
        main_dynamic_run(env_name="harmonic", horizon=5.0)
