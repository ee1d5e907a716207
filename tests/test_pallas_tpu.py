"""TPU-only tests: Pallas interpreter forward/backward kernels and the fused
whole-rollout kernel. Skipped on CPU (the CI suite); exercised on hardware
by the verify flow (.claude/skills/verify/SKILL.md) and by bench.py.

NOTE: tests/conftest.py forces the CPU platform for the mesh tests, so these
are expected to auto-skip under plain pytest. Run them on hardware with
``MTGP_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q`` — the env
var tells conftest to keep the real TPU backend.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a TPU backend"
)


def _fset():
    from multitreegp_tpu.core.registry import build_function_set

    ops = [
        ("+", jnp.add, 2, 0.5),
        ("-", jnp.subtract, 2, 0.1),
        ("*", jnp.multiply, 2, 0.5),
        ("/", jnp.divide, 2, 0.1),
        ("sin", jnp.sin, 1, 0.2),
    ]
    return build_function_set(ops, [["x0", "x1"]], [2])


@requires_tpu
def test_pallas_forward_matches_ladder():
    from multitreegp_tpu.core.interpreter import evaluate_trees_ladder
    from multitreegp_tpu.core.pallas_interpreter import evaluate_trees_pallas
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(0), 128)
    data = jnp.asarray(np.random.RandomState(1).randn(128, 3, 1, 2), jnp.float32)
    a = np.asarray(jax.jit(lambda p, d: evaluate_trees_pallas(p[:, None], d, fset))(pop, data))
    b = np.asarray(jax.jit(lambda p, d: evaluate_trees_ladder(p[:, None], d, fset))(pop, data))
    m = np.isfinite(a) & np.isfinite(b)
    assert (np.isfinite(a) == np.isfinite(b)).all()
    np.testing.assert_allclose(a[m], b[m], rtol=1e-5, atol=1e-6)


@requires_tpu
def test_pallas_backward_matches_ladder_vjp():
    from multitreegp_tpu.core.interpreter import evaluate_trees_ladder
    from multitreegp_tpu.core.pallas_interpreter import evaluate_trees_pallas
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 16)
    data = jnp.asarray(np.random.RandomState(1).randn(16, 1, 2), jnp.float32)

    def loss(ref):
        def f(const, d):
            out = ref(pop._replace(const=const), d, fset)
            return jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0))

        return jax.jit(jax.grad(f, argnums=(0, 1)))

    g1c, g1d = loss(evaluate_trees_pallas)(pop.const, data)
    g2c, g2d = loss(evaluate_trees_ladder)(pop.const, data)
    for g1, g2 in ((g1c, g2c), (g1d, g2d)):
        g1, g2 = np.asarray(g1), np.asarray(g2)
        m = np.isfinite(g1) & np.isfinite(g2)
        np.testing.assert_allclose(g1[m], g2[m], rtol=1e-4, atol=1e-5)


@requires_tpu
def test_pallas_replay_shaped_broadcast():
    """Trees batch rank < joint batch rank (a policy replay adds a leading
    time axis) — regression for the _prep rank-alignment bug."""
    from multitreegp_tpu.core.interpreter import evaluate_trees_ladder
    from multitreegp_tpu.core.pallas_interpreter import evaluate_trees_pallas
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 8)
    trees = pop[:, None]  # (8, 1, m)
    data = jnp.asarray(np.random.RandomState(1).randn(5, 8, 4, 1, 2), jnp.float32)
    a = np.asarray(jax.jit(lambda: evaluate_trees_pallas(trees, data, fset))())
    b = np.asarray(jax.jit(lambda: evaluate_trees_ladder(trees, data, fset))())
    m = np.isfinite(a) & np.isfinite(b)
    assert a.shape == (5, 8, 4, 2)
    np.testing.assert_allclose(a[m], b[m], rtol=1e-5, atol=1e-6)


@requires_tpu
def test_fused_rollout_matches_unfused():
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    env = VanDerPolOscillator(0.0, 0.0)
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(1), 256)
    # short horizon: fp-ordering differences cannot amplify chaotically
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8, substeps=8)

    ev_f = SREvaluator(fset, substeps=1)  # auto -> fused rollout kernel
    ev_r = SREvaluator(fset, substeps=1, interpreter="ladder")
    a = np.asarray(jax.jit(lambda p: ev_f.evaluate_population(p, data))(pop))
    b = np.asarray(jax.jit(lambda p: ev_r.evaluate_population(p, data))(pop))
    both = (a < ev_f.max_fitness) & (b < ev_r.max_fitness)
    rel = np.abs(a[both] - b[both]) / (np.abs(b[both]) + 1e-6)
    assert (rel < 1e-3).mean() > 0.99
    assert np.mean((a >= 1e5) == (b >= 1e5)) > 0.995


@requires_tpu
def test_fused_adaptive_matches_general():
    """Fused adaptive (embedded Dopri5 + per-lane step control + in-kernel
    MSE + solver stats) vs the general integrate_adaptive path, short
    horizon. Also pins the solver-stats output's invariants on hardware."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    env = VanDerPolOscillator(0.0, 0.0)
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(1), 256)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8, substeps=8)
    x0s, _, ys, _ = data
    p, b, d = 256, 8, 2

    mse, alive, steps = jax.block_until_ready(prl.adaptive_solver_stats(
        pop, jnp.broadcast_to(x0s[None], (p, b, d)), ts, ys, fset,
        rtol=1e-4, atol=1e-6, max_steps=16, method="dopri5",
    ))
    intervals = ts.shape[0] - 1
    st = np.asarray(steps)
    assert (st >= intervals).all() and (st <= intervals * 16).all(), st

    ev = SREvaluator(fset, substeps=8, method="adaptive", rtol=1e-4,
                     atol=1e-6, adaptive_method="dopri5",
                     interpreter="gather")
    xs, alive_l = ev._rollout(pop, x0s, ts)
    err = np.asarray(xs) - np.asarray(jnp.transpose(ys, (1, 0, 2)))[:, None]
    mse_ref = np.mean(np.sum(err**2, axis=-1), axis=0)
    af, al = np.asarray(alive), np.asarray(alive_l[-1])
    assert (af == al).mean() > 0.99
    both = af & al
    rel = np.abs(np.asarray(mse)[both] - mse_ref[both]) / (
        np.abs(mse_ref[both]) + 1e-9)
    assert (rel < 1e-3).mean() > 0.97 and np.median(rel) < 1e-4, (
        rel.max(), np.median(rel))


@requires_tpu
def test_fused_policy_rollouts_match_general():
    """Static + dynamic policy fused kernels vs the general scan path on
    Acrobot (measured bit-identical for the clipped/wrapped dynamics)."""
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import Acrobot
    from multitreegp_tpu.models.evaluators import (
        DynamicPolicyEvaluator,
        StaticPolicyEvaluator,
        generate_control_data,
    )
    from multitreegp_tpu.ops.initialization import make_population_sampler

    ops = [("+", jnp.add, 2), ("-", jnp.subtract, 2), ("*", jnp.multiply, 2),
           ("sin", jnp.sin, 1), ("cos", jnp.cos, 1)]
    env = Acrobot(0.0, 0.0)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_control_data(env, jr.PRNGKey(0), ts, batch_size=8)

    fs = build_function_set(ops, [[f"y{i}" for i in range(4)]], [1])
    pop = make_population_sampler(fs, 4, 32)(jr.PRNGKey(1), 128)
    a = np.asarray(jax.jit(lambda p: StaticPolicyEvaluator(
        env, fs, substeps=2).evaluate_population(p, data))(pop))
    b = np.asarray(jax.jit(lambda p: StaticPolicyEvaluator(
        env, fs, substeps=2, interpreter="ladder").evaluate_population(p, data))(pop))
    both = (a < 1e4) & (b < 1e4)
    rel = np.abs(a[both] - b[both]) / (np.abs(b[both]) + 1e-6)
    assert (rel < 1e-3).mean() > 0.98

    fs3 = build_function_set(
        ops, [[f"y{i}" for i in range(4)] + ["a0", "a1", "u"], ["a0", "a1"]], [2, 1]
    )
    pop3 = make_population_sampler(fs3, 4, 32)(jr.PRNGKey(1), 128)
    a = np.asarray(jax.jit(lambda p: DynamicPolicyEvaluator(
        env, fs3, state_size=2, substeps=2).evaluate_population(p, data))(pop3))
    b = np.asarray(jax.jit(lambda p: DynamicPolicyEvaluator(
        env, fs3, state_size=2, substeps=2, interpreter="ladder"
    ).evaluate_population(p, data))(pop3))
    both = (a < 1e4) & (b < 1e4)
    rel = np.abs(a[both] - b[both]) / (np.abs(b[both]) + 1e-6)
    assert (rel < 1e-3).mean() > 0.98


@requires_tpu
@pytest.mark.parametrize("max_nodes", [32, 128])
def test_fused_reproduction_kernel(max_nodes):
    """One-launch Pallas reproduce: valid trees, elites kept, migration gen.

    N=128 exercises the log2(N)-stage shift_rows surgery (the deep-tree
    reproduction path enabled by MAX_KERNEL_NODES=256)."""
    from multitreegp_tpu.core.trees import validate_host
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.ops.pallas_evolve import make_evolve_populations_fused
    from multitreegp_tpu.ops.reproduction import island_hyperparams

    fset = _fset()
    islands, pop_size, elite = 4, 128, 12
    tp, rtp, rp = island_hyperparams(
        islands, 7, (0.6, 0.9), (1.0, 0.5), (0.9, 0.4), (0.1, 0.5), (0.0, 0.1)
    )
    fused = jax.jit(make_evolve_populations_fused(
        fset, pop_size, elite, 7, 10, 13, rtp, rp, tp,
        max_nodes=max_nodes, max_init_depth=4,
    ))
    pops = jax.vmap(
        lambda k: make_population_sampler(fset, 4, max_nodes)(k, pop_size)
    )(jr.split(jr.PRNGKey(0), islands))
    fitness = jr.uniform(jr.PRNGKey(1), (islands, pop_size))
    out = jax.block_until_ready(fused(pops, fitness, jr.PRNGKey(2), jnp.int32(0)))
    validate_host(out, fset.slots)
    order = np.argsort(np.asarray(fitness), axis=1)
    for i in range(islands):
        np.testing.assert_array_equal(
            np.asarray(out.ops[i, :elite]), np.asarray(pops.ops[i, order[i, :elite]])
        )
    out2 = jax.block_until_ready(fused(pops, fitness, jr.PRNGKey(3), jnp.int32(9)))
    validate_host(out2, fset.slots)


@requires_tpu
def test_fused_rollout_deep_trees():
    """Deep-tree (N=128) fused fitness kernel — the windowed-gather rolled-row
    path — vs the ladder reference. Mosaic-legalization + parity check for the
    DEEP_MAX_NODES coverage."""
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    env = VanDerPolOscillator(0.0, 0.0)
    pop = make_population_sampler(fset, 7, 128)(jr.PRNGKey(1), 256)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8, substeps=8)

    # reference = the gather interpreter: parity-equal to the ladder (CPU
    # tests pin that) but O(N) HLO — the ladder's O(N^2) select program at
    # N=128 takes ~30 min of remote compile and once EOF'd the tunnel;
    # runtime doesn't matter at this tiny shape
    ev_f = SREvaluator(fset, substeps=1)  # auto -> deep windowed kernel
    ev_r = SREvaluator(fset, substeps=1, interpreter="gather")
    a = np.asarray(jax.jit(lambda p: ev_f.evaluate_population(p, data))(pop))
    b = np.asarray(jax.jit(lambda p: ev_r.evaluate_population(p, data))(pop))
    both = (a < ev_f.max_fitness) & (b < ev_r.max_fitness)
    rel = np.abs(a[both] - b[both]) / (np.abs(b[both]) + 1e-6)
    # statistical parity: fused vs ladder differ in fp summation order, and
    # N=128 grow-sampled populations carry near-chaotic candidates whose
    # trajectories amplify ulp differences (r2 hardware run: 98.8% at 1e-3);
    # the bulk must sit at fp noise
    assert (rel < 1e-3).mean() > 0.97
    assert np.median(rel) < 1e-5
    assert np.mean((a >= 1e5) == (b >= 1e5)) > 0.995


@requires_tpu
def test_pallas_kernels_inside_shard_map():
    """Multi-chip composition on a 1-device mesh: the fused reproduce and the
    fused rollout eval launch inside shard_map (GSPMD cannot partition a
    pallas_call, so this is the only sharded path that engages the kernels)."""
    from multitreegp_tpu.core.trees import validate_host
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.ops.pallas_evolve import make_reproduce_islands
    from multitreegp_tpu.ops.reproduction import island_hyperparams
    from multitreegp_tpu.parallel.collective import (
        make_evolve_populations_collective_fused,
        make_sharded_evaluator,
    )
    from multitreegp_tpu.parallel.mesh import make_mesh

    fset = _fset()
    mesh = make_mesh(1)
    islands, pop_size, elite = 4, 128, 12
    tp, rtp, rp = island_hyperparams(
        islands, 7, (0.6, 0.9), (1.0, 0.5), (0.9, 0.4), (0.1, 0.5), (0.0, 0.1)
    )
    step = jax.jit(make_evolve_populations_collective_fused(
        make_reproduce_islands(fset, pop_size, elite, 7, 32, 4),
        mesh, 10, 13, rtp, rp, tp,
    ))
    pops = jax.vmap(lambda k: make_population_sampler(fset, 4, 32)(k, pop_size))(
        jr.split(jr.PRNGKey(0), islands)
    )
    fitness = jr.uniform(jr.PRNGKey(1), (islands, pop_size))
    out = jax.block_until_ready(step(pops, fitness, jr.PRNGKey(2), jnp.int32(0)))
    validate_host(out, fset.slots)

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 4.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8, substeps=8)
    ev = SREvaluator(fset, substeps=1)

    def eval_islands(p):
        flat = jax.tree_util.tree_map(lambda x: x.reshape((-1,) + x.shape[2:]), p)
        return ev.evaluate_population(flat, data).reshape(p.ops.shape[0], -1)

    a = np.asarray(jax.jit(make_sharded_evaluator(eval_islands, mesh))(pops))
    b = np.asarray(jax.jit(eval_islands)(pops))
    np.testing.assert_allclose(a, b, rtol=1e-6)


@requires_tpu
def test_constant_opt_through_fused_rollout():
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.constant_opt import make_constant_optimiser
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    env = VanDerPolOscillator(0.0, 0.0)
    pop = make_population_sampler(fset, 3, 16)(jr.PRNGKey(0), 16)
    ts = jnp.arange(0.0, 2.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=4, substeps=8)
    ev = SREvaluator(fset, substeps=1)
    opt = make_constant_optimiser(
        lambda p, d: ev.evaluate_population(p, d), gradient_steps=5
    )
    base = np.asarray(jax.jit(lambda p: ev.evaluate_population(p, data))(pop))
    fit, _ = jax.jit(lambda c: opt(c, data))(pop)
    fit = np.asarray(fit)
    # monotone within fp tolerance (cross-compilation noise on chaotic lanes)
    assert (fit <= base * (1 + 1e-3) + 1e-4).all()


@requires_tpu
def test_global_budget_adaptive_on_hardware():
    """The global-budget adaptive kernel (diffrax whole-solve max_steps
    semantics, the r5 production default for method='adaptive') vs the
    per-interval kernel on hardware: aliveness agrees on lanes where
    neither budget binds, mse matches bit-for-bit there, and the
    returned per-tile step telemetry respects the budget."""
    from multitreegp_tpu.core import pallas_rollout as prl
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = _fset()
    env = VanDerPolOscillator(0.0, 0.0)
    pop = make_population_sampler(fset, 4, 32)(jr.PRNGKey(1), 256)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=8, substeps=8)
    x0s, _, ys, _ = data
    p, b, d = 256, 8, 2
    x0 = jnp.broadcast_to(x0s[None], (p, b, d))

    per_interval = 16
    budget = per_interval * (ts.shape[0] - 1)  # neither side binds first
    mse_g, alive_g, steps = jax.block_until_ready(
        prl.rollout_sr_fitness_adaptive_global_pallas(
            pop, x0, ts, ys, fset, rtol=1e-4, atol=1e-6,
            budget=budget, method="dopri5", return_steps=True,
        )
    )
    mse_i, alive_i = jax.block_until_ready(
        prl.rollout_sr_fitness_adaptive_pallas(
            pop, x0, ts, ys, fset, rtol=1e-4, atol=1e-6,
            max_steps=per_interval, method="dopri5",
        )
    )
    ag, ai = np.asarray(alive_g), np.asarray(alive_i)
    st = np.asarray(steps)
    assert (st <= budget).all(), st.max()
    # equal-budget runs agree on aliveness except lanes where exactly one
    # budgeting style binds (rare at a generous budget)
    assert (ag == ai).mean() > 0.99, (ag != ai).mean()
    both = ag & ai
    # interpret mode pins BIT-identity on non-binding lanes
    # (test_adaptive_global_budget_matches_interval); on hardware the two
    # kernels are separate Mosaic compilations, so allow codegen-level fp
    # reassociation noise
    np.testing.assert_allclose(
        np.asarray(mse_g)[both], np.asarray(mse_i)[both], rtol=1e-5
    )
