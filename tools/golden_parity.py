"""Golden fitness parity: execute the REFERENCE on its own trees, compare.

Runs the upstream reference (`/root/reference`, read-only) end-to-end on CPU
using the fixed-step diffrax shim (`tools/refshim`), samples populations with
the REFERENCE's own initializer, then evaluates the SAME candidates with both
stacks on the SAME data:

* reference: ``GeneticProgramming.vmap_trees`` -> ``SR_evaluator`` ->
  shim ``diffeqsolve`` (Euler, dt0) — the reference's default solver config;
* ours: candidates reinterpreted as :class:`TreeTensors` (the node encodings
  are deliberately identical: 0 EMPTY / 1 CONST / operators / variables,
  root-last children-contiguous rows) -> ``SREvaluator`` with
  ``method='euler', substeps=round(save_dt/dt0)`` — the same time grid.

Prints per-candidate fitness agreement and writes docs/GOLDEN_PARITY.md.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/golden_parity.py
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


def patch_shard_map():
    """jax 0.9 renamed shard_map's check_rep -> check_vma; adapt in place so
    the reference constructs unchanged."""
    import jax.experimental.shard_map as sm

    orig = sm.shard_map

    def patched(*args, **kwargs):
        kwargs.pop("check_rep", None)
        try:
            return orig(*args, **kwargs, check_vma=False)
        except TypeError:
            return orig(*args, **kwargs)

    sm.shard_map = patched

    # newer jax requires a sequence mesh_shape; the reference passes an int
    from jax.experimental import mesh_utils as mu

    orig_mesh = mu.create_device_mesh

    def patched_mesh(mesh_shape, *args, **kwargs):
        if isinstance(mesh_shape, int):
            mesh_shape = (mesh_shape,)
        return orig_mesh(mesh_shape, *args, **kwargs)

    mu.create_device_mesh = patched_mesh


def main(population_size: int = 200, batch_size: int = 8, horizon: float = 5.0,
         save_dt: float = 0.2, dt0: float = 0.01, report_path: str | None = None):
    patch_shard_map()

    import diffrax  # the shim

    from MultiTreeGP.environments.SR_environments.vd_pol_oscillator import (
        VanDerPolOscillator as RefVdP,
    )
    from MultiTreeGP.evaluators.SR_evaluator import Evaluator as RefEvaluator
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]

    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefEvaluator(dt0=dt0),
        operator_list=operator_list,
        variable_list=[["x0", "x1"]],
        layer_sizes=jnp.array([2]),
        num_populations=1,
    )

    # shared task data (reference contract: (x0s, ts, ys, noise_keys))
    env = RefVdP(0.0, 0.0)
    key = jr.PRNGKey(0)
    k_init, k_noise, k_pop = jr.split(key, 3)
    x0s = env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)

    def true_traj(x0):
        sol = diffrax.diffeqsolve(
            diffrax.ODETerm(lambda t, x, a: env.drift(t, x, a)),
            diffrax.Euler(), float(ts[0]), float(ts[-1]), dt0, x0,
            saveat=diffrax.SaveAt(ts=ts), throw=False,
        )
        return sol.ys

    ys = jax.vmap(true_traj)(x0s)  # (B, T, d)
    noise_keys = jr.split(k_noise, batch_size)
    data = (x0s, ts, ys, noise_keys)

    # reference-sampled population, evaluated by the reference
    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])  # (P, trees, N, 4)
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    # the same candidates through multitreegp_tpu
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.evaluators import SREvaluator

    fset = build_function_set(
        [(s, f, a, p) for (s, f, a, p) in operator_list], [["x0", "x1"]], [2]
    )
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)  # encoding compatibility is load-bearing

    ev = SREvaluator(
        fset, method="euler", substeps=int(round(save_dt / dt0)), interpreter="ladder"
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    # ---- report. Two regimes by design:
    # * sound candidates (no diverging trajectory) — fitness must MATCH;
    # * candidates with a diverging trajectory — the reference lets a
    #   huge-but-finite lane drag the batch MEAN over the 1e5 clip, while we
    #   map the diverged LANE to max_fitness before the mean (divergence
    #   containment, sr.py). Both stacks score such candidates as hopeless;
    #   the agreement criterion is the shared "bad" verdict, not the number.
    max_f = 1e5
    bad_thresh = 1e4
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]
    clamp_agree = ((ref_fit >= max_f * (1 - 1e-9)) == (my_fit >= max_f * (1 - 1e-9))).mean()

    lines = [
        "# Golden fitness parity vs the reference",
        "",
        "The reference executes via `tools/refshim` (fixed-step Euler diffrax",
        "shim — the reference's DEFAULT solver config); candidates are sampled",
        "by the REFERENCE's own initializer and evaluated by both stacks on",
        "identical data. Conversion between representations is a dtype cast:",
        "the node encodings are identical by design (SURVEY.md §3.1).",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled, Van der Pol SR)",
        f"- grid: T={ts.shape[0]} save points, dt0={dt0}, Euler",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement (>= {bad_thresh:.0e}): "
        f"{(bad_ref == bad_my).mean():.4f}",
        f"- hard-clamp (==1e5) agreement: {clamp_agree:.4f} — differences are",
        "  candidates with one huge-but-finite trajectory: the reference",
        "  clips the exploded MEAN to 1e5, we cap the diverged lane first;",
        "  both verdicts are 'hopeless', the scalar differs by construction.",
        "",
        "Reproduce: `JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python"
        " tools/golden_parity.py`",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "w") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-3
    assert (bad_ref == bad_my).mean() > 0.99
    assert rho > 0.999
    print("GOLDEN PARITY OK")


def main_policy(population_size: int = 100, batch_size: int = 4,
                horizon: float = 3.0, save_dt: float = 0.2, dt0: float = 0.01,
                report_path: str | None = None):
    """Golden parity for the STATIC POLICY evaluator (closed-loop control).

    Reference ``feedforward_evaluate.Evaluator`` on its HarmonicOscillator vs
    our ``StaticPolicyEvaluator`` on ours — same candidates (reference-
    sampled), same data, same Euler grid, zero noise, Constant params.
    """
    patch_shard_map()

    from MultiTreeGP.environments.control_environments.harmonic_oscillator import (
        HarmonicOscillator as RefHO,
    )
    from MultiTreeGP.evaluators.feedforward_evaluate import Evaluator as RefFF
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    ref_env = RefHO(0.0, 0.0)
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefFF(ref_env, dt0=dt0),
        operator_list=operator_list,
        variable_list=[["y0", "y1", "tgt"]],
        layer_sizes=jnp.array([1]),
        num_populations=1,
    )

    key = jr.PRNGKey(0)
    k_init, k_noise, k_param, k_pop = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    pkeys = jr.split(k_noise, batch_size)
    okeys = jr.split(jr.fold_in(k_noise, 1), batch_size)
    data = (x0s, ts, targets, pkeys, okeys, params)

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import StaticPolicyEvaluator

    fset = build_function_set(operator_list, [["y0", "y1", "tgt"]], [1])
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)
    my_env = HarmonicOscillator(0.0, 0.0)
    ev = StaticPolicyEvaluator(
        my_env, fset, method="euler", substeps=int(round(save_dt / dt0)),
        interpreter="ladder",
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    bad_thresh = 1e3
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]

    lines = [
        "",
        "## Static policy evaluator (closed-loop HarmonicOscillator)",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled)",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement: {(bad_ref == bad_my).mean():.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-3
    assert (bad_ref == bad_my).mean() > 0.99
    assert rho > 0.999
    print("POLICY GOLDEN PARITY OK")


def main_acrobot(population_size: int = 100, batch_size: int = 4,
                 horizon: float = 20.0, save_dt: float = 0.2,
                 dt0: float = 0.05, report_path: str | None = None):
    """Acrobot candidate parity at a DIVERGING horizon — the succeed-then-die
    class.

    Aggressive swing-up policies routinely reach the success threshold and
    then blow past the velocity-bound event (reference ``acrobot.py:86-87``).
    diffrax fills post-event saves with inf and the acrobot cost ZEROES all
    costs after first success (``acrobot.py:79-84``) — so those candidates
    keep their success fitness. A blanket "diverged -> max_fitness" rule
    (our r1/r2 semantics) mis-scores exactly the candidates that solve the
    StaticPolicy notebook; this leg pins the corrected semantics where the
    short-horizon HarmonicOscillator leg (no divergence) cannot see them.
    """
    patch_shard_map()

    from MultiTreeGP.environments.control_environments.acrobot import (
        Acrobot as RefAcrobot,
    )
    from MultiTreeGP.evaluators.feedforward_evaluate import Evaluator as RefFF
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
        ("sin", lambda x: jnp.sin(x), 1, 0.1),
        ("cos", lambda x: jnp.cos(x), 1, 0.1),
    ]
    variables = [["y1", "y2", "y3", "y4"]]
    ref_env = RefAcrobot(0.05, 0.1)
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefFF(ref_env, dt0=dt0),
        operator_list=operator_list,
        variable_list=variables,
        layer_sizes=jnp.array([1]),
        num_populations=1,
    )

    key = jr.PRNGKey(1)
    k_init, k_noise, k_param, k_pop = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    pkeys = jr.split(k_noise, batch_size)
    okeys = jr.split(jr.fold_in(k_noise, 1), batch_size)
    data = (x0s, ts, targets, pkeys, okeys, params)

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import StaticPolicyEvaluator

    fset = build_function_set(operator_list, variables, [1])
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)
    ev = StaticPolicyEvaluator(
        Acrobot(0.05, 0.1), fset, method="euler",
        substeps=int(round(save_dt / dt0)),
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    sound = (ref_fit < 1e3) & (my_fit < 1e3)
    # fail loud (not np.max-on-empty) if a horizon/seed change makes every
    # candidate diverge in one stack — the leg would be vacuous
    assert sound.sum() > 0, (
        f"vacuous leg: no sound candidates (ref<1e3: {(ref_fit < 1e3).sum()},"
        f" ours<1e3: {(my_fit < 1e3).sum()})"
    )
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    # the interesting class: real controllers (well below the no-swing-up
    # floor of len(ts)); the leg is vacuous if none were sampled
    solvers = ref_fit < 0.8 * ts.shape[0]
    lines = [
        "",
        "## Acrobot static policy at a diverging horizon "
        f"(T={ts.shape[0]}, Euler dt0={dt0})",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled), "
        f"swing-up controllers among them: {int(solvers.sum())}",
        f"- sound candidates (fitness < 1e3 in both): {int(sound.sum())}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- sound-verdict agreement: {((ref_fit < 1e3) == (my_fit < 1e3)).mean():.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert solvers.sum() >= 1, "no swing-up candidate sampled — leg vacuous"
    assert rel.max() < 1e-3
    assert ((ref_fit < 1e3) == (my_fit < 1e3)).mean() > 0.97
    print("ACROBOT DIVERGING-HORIZON PARITY OK")


def main_dynamic(population_size: int = 100, batch_size: int = 4,
                 horizon: float = 3.0, save_dt: float = 0.2, dt0: float = 0.01,
                 state_size: int = 2, report_path: str | None = None):
    """Golden parity for the DYNAMIC (stateful) policy evaluator.

    Reference ``dynamic_evaluate.Evaluator`` (augmented ``[env_state, hidden]``
    ODE, readout zero-feed bottleneck, post-hoc replay with REAL observations,
    ``dynamic_evaluate.py:37-126``) vs our ``DynamicPolicyEvaluator`` — same
    reference-sampled candidates, same data, same Euler grid. The two-layer
    variable sets ([y, a, u, tgt] for the state trees, [a] for the readout)
    exercise the per-tree leaf masks and the cross-layer opcode numbering.
    """
    patch_shard_map()

    from MultiTreeGP.environments.control_environments.harmonic_oscillator import (
        HarmonicOscillator as RefHO,
    )
    from MultiTreeGP.evaluators.dynamic_evaluate import Evaluator as RefDyn
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    variable_list = [["y0", "y1", "a0", "a1", "u", "tgt"], ["a0", "a1"]]
    ref_env = RefHO(0.0, 0.0)
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefDyn(ref_env, state_size, dt0=dt0),
        operator_list=operator_list,
        variable_list=variable_list,
        layer_sizes=jnp.array([state_size, ref_env.n_control]),
        num_populations=1,
    )

    key = jr.PRNGKey(0)
    k_init, k_noise, k_param, k_pop = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    pkeys = jr.split(k_noise, batch_size)
    okeys = jr.split(jr.fold_in(k_noise, 1), batch_size)
    data = (x0s, ts, targets, pkeys, okeys, params)

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import DynamicPolicyEvaluator

    fset = build_function_set(
        operator_list, variable_list, [state_size, ref_env.n_control]
    )
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)
    my_env = HarmonicOscillator(0.0, 0.0)
    ev = DynamicPolicyEvaluator(
        my_env, fset, state_size=state_size, method="euler",
        substeps=int(round(save_dt / dt0)), interpreter="ladder",
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    bad_thresh = 1e3
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]

    lines = [
        "",
        "## Dynamic (stateful) policy evaluator (HarmonicOscillator, "
        f"state_size={state_size})",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled, 2-layer variable sets)",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement: {(bad_ref == bad_my).mean():.4f} — the",
        "  disagreements are near-divergent candidates (huge-but-finite",
        "  trajectories straddling the threshold under the two stacks'",
        "  different divergence containment; both verdicts are 'poor').",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-3
    # near-divergent boundary candidates are rare but real; allow 1% or one
    assert (bad_ref != bad_my).sum() <= max(1, len(ref_fit) // 100)
    assert rho > 0.999
    print("DYNAMIC GOLDEN PARITY OK")


def main_adaptive(population_size: int = 100, batch_size: int = 8,
                  horizon: float = 5.0, save_dt: float = 0.2,
                  report_path: str | None = None):
    """SR golden parity under the notebooks' ACTUAL solver configuration:
    ``Dopri5() + PIDController(atol=1e-6, rtol=1e-6, dtmin=0.001)``
    (``SymbolicRegression.ipynb`` cell 6). The reference executes through the
    shim's Dopri5+PID (diffrax default I-controller semantics); ours runs
    ``integrate_adaptive(method='dopri5')`` — per-lane batched step control.
    Step sequences differ by construction (per-trajectory scalar control vs
    per-lane batched control), so agreement here is tolerance-level, not
    bit-level: both integrators hit the same error target.
    """
    patch_shard_map()

    import diffrax  # the shim

    from MultiTreeGP.environments.SR_environments.vd_pol_oscillator import (
        VanDerPolOscillator as RefVdP,
    )
    from MultiTreeGP.evaluators.SR_evaluator import Evaluator as RefEvaluator
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefEvaluator(
            solver=diffrax.Dopri5(), dt0=0.01,
            stepsize_controller=diffrax.PIDController(
                atol=1e-6, rtol=1e-6, dtmin=0.001
            ),
            max_steps=500,
        ),
        operator_list=operator_list,
        variable_list=[["x0", "x1"]],
        layer_sizes=jnp.array([2]),
        num_populations=1,
    )

    env = RefVdP(0.0, 0.0)
    key = jr.PRNGKey(0)
    k_init, k_noise, k_pop = jr.split(key, 3)
    x0s = env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)

    # ground truth at the notebook's data accuracy (cell 2: Dopri5, PID 1e-7)
    def true_traj(x0):
        sol = diffrax.diffeqsolve(
            diffrax.ODETerm(lambda t, x, a: env.drift(t, x, a)),
            diffrax.Dopri5(), float(ts[0]), float(ts[-1]), 0.001, x0,
            saveat=diffrax.SaveAt(ts=ts), max_steps=2000,
            stepsize_controller=diffrax.PIDController(
                atol=1e-7, rtol=1e-7, dtmin=0.001
            ),
            throw=False,
        )
        return sol.ys

    ys = jax.vmap(true_traj)(x0s)
    data = (x0s, ts, ys, jr.split(k_noise, batch_size))

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.evaluators import SREvaluator

    fset = build_function_set(operator_list, [["x0", "x1"]], [2])
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)

    ev = SREvaluator(
        fset, method="adaptive", adaptive_method="dopri5",
        rtol=1e-6, atol=1e-6, substeps=32, interpreter="ladder",
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    max_f = 1e5
    bad_thresh = 1e4
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]

    lines = [
        "",
        "## Adaptive-solver parity (the notebooks' Dopri5 + PIDController)",
        "",
        "Reference config `SymbolicRegression.ipynb` cell 6: Dopri5, dt0=0.01,",
        "PID(atol=rtol=1e-6, dtmin=0.001), max_steps=500 — executed via the",
        "shim's Dopri5+PID; ours: `integrate_adaptive(method='dopri5')` with",
        "the same tolerances (batched per-lane step control). Step sequences",
        "differ by construction; agreement is tolerance-level.",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled, Van der Pol SR)",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement: {(bad_ref == bad_my).mean():.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-2 and rel.mean() < 1e-3
    assert (bad_ref != bad_my).sum() <= max(1, len(ref_fit) // 100)
    assert rho > 0.99
    print("ADAPTIVE GOLDEN PARITY OK")


def main_policy_adaptive(population_size: int = 100, batch_size: int = 4,
                         horizon: float = 3.0, save_dt: float = 0.2,
                         report_path: str | None = None):
    """Golden ADAPTIVE-POLICY candidate parity (VERDICT r4 #3): the policy
    notebooks' actual solver — ``Dopri5 + PIDController(atol=rtol=1e-4,
    dtmin=0.001)`` (``StaticPolicy.ipynb`` cell 4) — through the reference's
    closed-loop evaluator (via the shim) vs our
    ``StaticPolicyEvaluator(method="adaptive")`` on identical
    reference-sampled candidates and data. Zero noise, Constant params (the
    fused adaptive kernel's scope; the general path this leg executes is
    pinned EXACTLY equal to the fused kernel in
    tests/test_policy_interpret.py::test_adaptive_policy_*). Step sequences
    differ by construction (per-trajectory scalar control vs per-lane
    batched control), so agreement is tolerance-level, as in
    :func:`main_adaptive`."""
    patch_shard_map()

    import diffrax  # the shim

    from MultiTreeGP.environments.control_environments.harmonic_oscillator import (
        HarmonicOscillator as RefHO,
    )
    from MultiTreeGP.evaluators.feedforward_evaluate import Evaluator as RefFF
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    ref_env = RefHO(0.0, 0.0)
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefFF(
            ref_env, dt0=0.05, solver=diffrax.Dopri5(),
            stepsize_controller=diffrax.PIDController(
                atol=1e-4, rtol=1e-4, dtmin=0.001
            ),
            max_steps=1000,
        ),
        operator_list=operator_list,
        variable_list=[["y0", "y1", "tgt"]],
        layer_sizes=jnp.array([1]),
        num_populations=1,
    )

    key = jr.PRNGKey(0)
    k_init, k_noise, k_param, k_pop = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    pkeys = jr.split(k_noise, batch_size)
    okeys = jr.split(jr.fold_in(k_noise, 1), batch_size)
    data = (x0s, ts, targets, pkeys, okeys, params)

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import StaticPolicyEvaluator

    fset = build_function_set(operator_list, [["y0", "y1", "tgt"]], [1])
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)
    my_env = HarmonicOscillator(0.0, 0.0)
    ev = StaticPolicyEvaluator(
        my_env, fset, method="adaptive", adaptive_method="dopri5",
        rtol=1e-4, atol=1e-4, substeps=8, interpreter="ladder",
    )
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    bad_thresh = 1e3
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]

    lines = [
        "",
        "## Adaptive-policy parity (the notebooks' Dopri5 + PIDController, closed loop)",
        "",
        "Reference config `StaticPolicy.ipynb` cell 4: Dopri5, dt0=0.05,",
        "PID(atol=rtol=1e-4, dtmin=0.001), max_steps=1000 — via the shim;",
        "ours: StaticPolicyEvaluator(method='adaptive', dopri5) with the same",
        "tolerances. Zero noise, Constant params (the fused adaptive policy",
        "kernel's scope; kernel == this general path is pinned exactly in",
        "tests/test_policy_interpret.py).",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled, HarmonicOscillator)",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement: {(bad_ref == bad_my).mean():.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-2 and rel.mean() < 1e-3
    assert (bad_ref != bad_my).sum() <= max(1, len(ref_fit) // 100)
    assert rho > 0.99
    print("ADAPTIVE POLICY GOLDEN PARITY OK")



def main_dynamic_adaptive(population_size: int = 100, batch_size: int = 4,
                          horizon: float = 3.0, save_dt: float = 0.2,
                          state_size: int = 2, report_path: str | None = None):
    """Golden ADAPTIVE parity for the DYNAMIC (stateful) policy evaluator —
    the DynamicPolicy notebook's solver class (Dopri5 + PID 1e-4) through
    the reference's augmented-state evaluator (shim) vs
    ``DynamicPolicyEvaluator(method="adaptive")``. Completes the
    reference-solver parity matrix: SR (main_adaptive), static policy
    (main_policy_adaptive), dynamic policy (this). Zero noise, Constant
    params; the fused adaptive dynamic kernel equals this general path
    exactly (tests/test_policy_interpret.py::test_adaptive_policy_kernel_dynamic)."""
    patch_shard_map()

    import diffrax  # the shim

    from MultiTreeGP.environments.control_environments.harmonic_oscillator import (
        HarmonicOscillator as RefHO,
    )
    from MultiTreeGP.evaluators.dynamic_evaluate import Evaluator as RefDyn
    from MultiTreeGP.genetic_programming import GeneticProgramming as RefGP

    operator_list = [
        ("+", lambda x, y: jnp.add(x, y), 2, 0.5),
        ("-", lambda x, y: jnp.subtract(x, y), 2, 0.1),
        ("*", lambda x, y: jnp.multiply(x, y), 2, 0.5),
    ]
    variable_list = [["y0", "y1", "a0", "a1", "u", "tgt"], ["a0", "a1"]]
    ref_env = RefHO(0.0, 0.0)
    ref_gp = RefGP(
        num_generations=2,
        population_size=population_size,
        fitness_function=RefDyn(
            ref_env, state_size, dt0=0.05, solver=diffrax.Dopri5(),
            stepsize_controller=diffrax.PIDController(
                atol=1e-4, rtol=1e-4, dtmin=0.001
            ),
            max_steps=1000,
        ),
        operator_list=operator_list,
        variable_list=variable_list,
        layer_sizes=jnp.array([state_size, ref_env.n_control]),
        num_populations=1,
    )

    key = jr.PRNGKey(0)
    k_init, k_noise, k_param, k_pop = jr.split(key, 4)
    x0s, targets = ref_env.sample_init_states(batch_size, k_init)
    ts = jnp.arange(0.0, horizon, save_dt, dtype=jnp.float32)
    params = ref_env.sample_params(batch_size, "Constant", ts, k_param)
    pkeys = jr.split(k_noise, batch_size)
    okeys = jr.split(jr.fold_in(k_noise, 1), batch_size)
    data = (x0s, ts, targets, pkeys, okeys, params)

    pops = ref_gp.initialize_population(k_pop)
    flat = pops.reshape(-1, *pops.shape[2:])
    ref_fit = np.asarray(
        ref_gp.vmap_trees(flat[..., 3:], flat[..., :3], data)
    ).reshape(-1)

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import TreeTensors, validate_host
    from multitreegp_tpu.models.environments import HarmonicOscillator
    from multitreegp_tpu.models.evaluators import DynamicPolicyEvaluator

    fset = build_function_set(
        operator_list, variable_list, [state_size, ref_env.n_control]
    )
    mine = TreeTensors(
        ops=jnp.asarray(flat[..., 0], jnp.int32),
        c1=jnp.asarray(flat[..., 1], jnp.int32),
        c2=jnp.asarray(flat[..., 2], jnp.int32),
        const=jnp.asarray(flat[..., 3], jnp.float32),
    )
    validate_host(mine, fset.slots)
    my_env = HarmonicOscillator(0.0, 0.0)
    ev = DynamicPolicyEvaluator(
        my_env, fset, state_size=state_size, method="adaptive",
        adaptive_method="dopri5", rtol=1e-4, atol=1e-4, substeps=4,
        interpreter="ladder",
    )  # substeps=4 -> per-interval budget 32: the augmented (stateful)
    # dynamics are stiffer than the static loop, and the reference pools
    # max_steps=1000 across the whole solve — a tight 8/interval cap killed
    # 3 marginal candidates the reference completes (bad-agreement 0.97)
    my_fit = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(mine))

    bad_thresh = 1e3
    bad_ref = ref_fit >= bad_thresh
    bad_my = my_fit >= bad_thresh
    sound = ~bad_ref & ~bad_my
    rel = np.abs(ref_fit[sound] - my_fit[sound]) / (np.abs(ref_fit[sound]) + 1e-9)
    r_ref = np.argsort(np.argsort(ref_fit[sound]))
    r_my = np.argsort(np.argsort(my_fit[sound]))
    rho = np.corrcoef(r_ref, r_my)[0, 1]

    lines = [
        "",
        "## Adaptive DYNAMIC-policy parity (Dopri5 + PIDController, stateful closed loop)",
        "",
        f"- candidates: {len(ref_fit)} (reference-sampled, HarmonicOscillator)",
        f"- sound candidates (fitness < {bad_thresh:.0e} in both): {sound.sum()}",
        f"- relative fitness error on sound candidates: "
        f"max {rel.max():.2e}, mean {rel.mean():.2e}",
        f"- Spearman rank correlation on sound candidates: {rho:.6f}",
        f"- bad-verdict agreement: {(bad_ref == bad_my).mean():.4f}",
    ]
    report = "\n".join(lines)
    print(report)
    out = report_path or os.path.join(
        os.path.dirname(__file__), "..", "docs", "GOLDEN_PARITY.md"
    )
    with open(out, "a") as f:
        f.write(report + "\n")
    assert rel.max() < 1e-2 and rel.mean() < 1e-3
    # bad-verdict threshold 3/100 — MEASURED root cause (r5 diagnosis, not
    # solver error): candidates whose HIDDEN state grows exponentially but
    # stays finite (e.g. cand 35: |a| x4 per save, 7.6e7 at save 14). Our
    # divergence containment kills at |x| >= 1e8 (DIVERGENCE_BOUND —
    # headroom against squaring overflow inside drift expressions); the
    # reference's event fires only on inf/nan (harmonic_oscillator.py:83-84)
    # and integrates on to |a| ~ 3e8+ with a tame cost (its cost reads only
    # env state + controls). Identical verdicts at every tolerance/method on
    # our side; sound-candidate agreement is 6.3e-6, rank corr 0.999.
    assert (bad_ref != bad_my).sum() <= max(3, len(ref_fit) // 33)
    assert rho > 0.99
    print("ADAPTIVE DYNAMIC GOLDEN PARITY OK")


if __name__ == "__main__":
    main()
    main_policy()
    main_dynamic()
    main_adaptive()
    main_policy_adaptive()
    main_dynamic_adaptive()
