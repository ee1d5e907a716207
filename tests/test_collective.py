"""Explicit-collective (shard_map + ppermute) generation step vs the
GSPMD-propagated reference path, on the faked 8-device CPU platform."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.trees import TreeTensors
from multitreegp_tpu.ops.reproduction import migrate_ring
from multitreegp_tpu.parallel.collective import (
    global_best,
    make_evolve_populations_collective,
)
from multitreegp_tpu.parallel.mesh import make_mesh

ISLANDS, POP, TREES, NODES = 8, 6, 2, 8
MIG = 2


def _tagged_population(key):
    """Population whose const field encodes a unique per-candidate id, so
    migration results can be compared as id-sets."""
    ids = jnp.arange(ISLANDS * POP, dtype=jnp.float32).reshape(ISLANDS, POP)
    ops = jnp.ones((ISLANDS, POP, TREES, NODES), jnp.int32)
    c1 = jnp.full((ISLANDS, POP, TREES, NODES), -1, jnp.int32)
    c2 = jnp.full((ISLANDS, POP, TREES, NODES), -1, jnp.int32)
    const = jnp.broadcast_to(ids[..., None, None], ops.shape).astype(jnp.float32)
    fitness = jr.uniform(key, (ISLANDS, POP))
    return TreeTensors(ops, c1, c2, const), fitness


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_collective_migration_matches_reference():
    mesh = make_mesh(8)
    pop, fitness = _tagged_population(jr.PRNGKey(0))

    # evolve_island = identity so the step's output IS the migrated population
    identity = lambda p, f, k, a, b, c: p
    step = make_evolve_populations_collective(
        identity,
        mesh,
        migration_period=2,
        migration_size=MIG,
        reproduction_type_probabilities=jnp.zeros((ISLANDS, 3)),
        reproduction_probabilities=jnp.zeros(ISLANDS),
        tournament_probabilities=jnp.zeros((ISLANDS, 4)),
    )

    # generation=1, period=2 -> migration active
    out = jax.jit(step)(pop, fitness, jr.PRNGKey(1), jnp.int32(1))
    ref, _ = migrate_ring(pop, fitness, MIG)

    got_ids = np.sort(np.asarray(out.const[..., 0, 0]), axis=1)
    ref_ids = np.sort(np.asarray(ref.const[..., 0, 0]), axis=1)
    np.testing.assert_array_equal(got_ids, ref_ids)

    # generation=0 -> no migration; population unchanged (identity evolve)
    out2 = jax.jit(step)(pop, fitness, jr.PRNGKey(1), jnp.int32(0))
    np.testing.assert_array_equal(
        np.asarray(out2.const), np.asarray(pop.const)
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_global_best_matches_argmin():
    mesh = make_mesh(8)
    pop, fitness = _tagged_population(jr.PRNGKey(2))
    best_fit, best_cand = jax.jit(
        lambda f, p: global_best(f, p, mesh)
    )(fitness, pop)

    flat = np.asarray(fitness).reshape(-1)
    want = flat.min()
    np.testing.assert_allclose(float(best_fit), want, rtol=1e-6)
    np.testing.assert_allclose(
        float(best_cand.const[0, 0]), float(np.argmin(flat)), rtol=1e-6
    )


def test_fused_collective_evolve_interpret_kernels():
    """The TRUE multi-chip fused path: the reproduction kernel (interpret
    mode) launches per-device inside shard_map over all 8 faked devices, with
    ring migration crossing boundaries via ppermute — the composition a
    single real chip cannot exercise."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import validate_host
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.ops.pallas_evolve import make_reproduce_islands
    from multitreegp_tpu.ops.reproduction import island_hyperparams
    from multitreegp_tpu.parallel.collective import (
        make_evolve_populations_collective_fused,
    )
    from multitreegp_tpu.parallel.mesh import make_mesh

    if not hasattr(pltpu, "force_tpu_interpret_mode"):
        import pytest

        pytest.skip("needs pallas TPU interpret mode")

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)], [["x0", "x1"]], [2],
    )
    mesh = make_mesh(8)
    islands, pop_size, elite = 8, 32, 4
    tp, rtp, rp = island_hyperparams(
        islands, 5, (0.6, 0.9), (1.0, 0.5), (0.9, 0.4), (0.1, 0.5), (0.0, 0.1)
    )
    step = make_evolve_populations_collective_fused(
        make_reproduce_islands(fset, pop_size, elite, 5, 16, 3),
        mesh, 3, 4, rtp, rp, tp,
    )
    pops = jax.vmap(lambda k: make_population_sampler(fset, 3, 16)(k, pop_size))(
        jr.split(jr.PRNGKey(0), islands)
    )
    fitness = jr.uniform(jr.PRNGKey(1), (islands, pop_size))
    with pltpu.force_tpu_interpret_mode():
        out = jax.block_until_ready(step(pops, fitness, jr.PRNGKey(2), jnp.int32(0)))
        out2 = jax.block_until_ready(step(pops, fitness, jr.PRNGKey(3), jnp.int32(2)))
    validate_host(out, fset.slots)
    validate_host(out2, fset.slots)
    order = np.argsort(np.asarray(fitness), axis=1)
    for i in range(islands):
        np.testing.assert_array_equal(
            np.asarray(out.ops[i, :elite]),
            np.asarray(pops.ops[i, order[i, :elite]]),
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.parametrize("top_k", [8, 50])
def test_collective_constant_opt_matches_unsharded(top_k):
    """Distributed top-k const-opt (local top-k -> all_gather -> merge ->
    per-device refine -> owner write-back) vs the plain global-argsort path.

    top_k=50 is the production default (coefficient_opt_top_k) and exceeds
    the 6-candidate local populations here: the per-device refinement share
    must cap at the local pool or the write-back scatter shape-mismatches
    (regression: ceil(50/8)=7 > 6 crashed with 'Incompatible shapes for
    broadcasting')."""
    from multitreegp_tpu.ops.constant_opt import make_constant_optimiser
    from multitreegp_tpu.parallel.collective import make_constant_opt_collective

    islands, pop_size, trees, nodes = 8, 6, 2, 8
    key = jr.PRNGKey(7)
    k1, k2 = jr.split(key)
    ops = jnp.ones((islands, pop_size, trees, nodes), jnp.int32)  # all consts
    c1 = jnp.full_like(ops, -1)
    c2 = jnp.full_like(ops, -1)
    const = jr.normal(k1, ops.shape, jnp.float32)
    pops = TreeTensors(ops, c1, c2, const)

    target = 1.5

    def evaluate(pop, data=None):
        # smooth per-candidate loss over const slots -> Adam moves them
        return jnp.sum(jnp.square(pop.const - target), axis=(-1, -2))

    fitness = jr.uniform(k2, (islands, pop_size))
    optimise = make_constant_optimiser(evaluate, gradient_steps=4)

    mesh = make_mesh(8)
    step = make_constant_opt_collective(
        lambda c: optimise(c, None), mesh, top_k
    )
    out_pop, out_fit = jax.jit(step)(pops, fitness)

    # unsharded reference: same k_pad winners, batch-refined, scattered back
    flat_fit = np.asarray(fitness).reshape(-1)
    flat_const = np.asarray(const).reshape((-1, trees, nodes))
    k_eff = min(top_k, islands * pop_size)
    order = np.argsort(flat_fit)[:k_eff]
    sel = TreeTensors(
        jnp.asarray(np.ones((k_eff, trees, nodes), np.int32)),
        jnp.full((k_eff, trees, nodes), -1, jnp.int32),
        jnp.full((k_eff, trees, nodes), -1, jnp.int32),
        jnp.asarray(flat_const[order]),
    )
    ref_fit, ref_cands = optimise(sel, None)
    want_fit = flat_fit.copy()
    want_const = flat_const.copy()
    want_fit[order] = np.asarray(ref_fit)
    want_const[order] = np.asarray(ref_cands.const)

    np.testing.assert_allclose(
        np.asarray(out_fit).reshape(-1), want_fit, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_pop.const).reshape((-1, trees, nodes)),
        want_const,
        rtol=1e-5,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_collective_migration_2d_dcn_mesh():
    """Multi-slice shape: the same generation step over a 2x4 (dcn x ici)
    mesh — the global island ring crosses DCN only at slice boundaries; the
    result must equal the reference ring migration, like the 1-D case."""
    from multitreegp_tpu.parallel.mesh import make_mesh_2d, mesh_axes

    mesh = make_mesh_2d(2, 4)
    assert mesh.axis_names == ("dcn", "i") and mesh.devices.shape == (2, 4)
    pop, fitness = _tagged_population(jr.PRNGKey(0))

    identity = lambda p, f, k, a, b, c: p
    step = make_evolve_populations_collective(
        identity,
        mesh,
        migration_period=2,
        migration_size=MIG,
        reproduction_type_probabilities=jnp.zeros((ISLANDS, 3)),
        reproduction_probabilities=jnp.zeros(ISLANDS),
        tournament_probabilities=jnp.zeros((ISLANDS, 4)),
        axis_name=mesh_axes(mesh),
    )
    out = jax.jit(step)(pop, fitness, jr.PRNGKey(1), jnp.int32(1))
    ref, _ = migrate_ring(pop, fitness, MIG)
    got_ids = np.sort(np.asarray(out.const[..., 0, 0]), axis=1)
    ref_ids = np.sort(np.asarray(ref.const[..., 0, 0]), axis=1)
    np.testing.assert_array_equal(got_ids, ref_ids)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_fit_shard_2d_dcn_mesh():
    """fit(shard=True) end-to-end on a 2x4 dcn x ici mesh (non-fused CPU
    path): the multi-slice configuration compiles and runs."""
    from multitreegp_tpu import GeneticProgramming
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.parallel.mesh import make_mesh_2d

    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 1.0, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=4)
    gp = GeneticProgramming(
        num_generations=2,
        population_size=8,
        fitness_function=SREvaluator(substeps=1),
        operator_list=[("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
                       ("*", jnp.multiply, 2, 0.5)],
        variable_list=[["x0", "x1"]],
        layer_sizes=[2],
        num_populations=8,
        max_init_depth=3,
        max_nodes=16,
        elite_percentage=0.25,
        migration_percentage=0.25,
        migration_period=2,
        mesh=make_mesh_2d(2, 4),
    )
    hist, _, _, fit = gp.fit(jr.PRNGKey(1), data, shard=True)
    assert hist.shape == (2,)
    assert bool(jnp.isfinite(fit).all())


def test_sharded_adaptive_evaluator_matches_unsharded():
    """The r5 production adaptive default (global-budget kernel) inside
    shard_map, interpret mode — the actual multi-chip fused-adaptive
    composition — must equal the unsharded evaluation exactly. 4 ranks:
    the interpret simulator deadlocks with >4 shard participants (the
    documented limitation the 8-rank dryrun also works around; an 8-rank
    run of this test hung with ~0% CPU)."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.models.environments import VanDerPolOscillator
    from multitreegp_tpu.models.evaluators import SREvaluator, generate_sr_data
    from multitreegp_tpu.ops.initialization import make_population_sampler
    from multitreegp_tpu.parallel.collective import make_sharded_evaluator
    from multitreegp_tpu.parallel.mesh import make_mesh

    if not hasattr(pltpu, "force_tpu_interpret_mode"):
        pytest.skip("needs pallas TPU interpret mode")

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5)], [["x0", "x1"]], [2],
    )
    env = VanDerPolOscillator(0.0, 0.0)
    ts = jnp.arange(0.0, 0.6, 0.2)
    data = generate_sr_data(env, jr.PRNGKey(0), ts, batch_size=2, substeps=8)
    ev = SREvaluator(fset, method="adaptive", adaptive_method="dopri5",
                     rtol=1e-3, atol=1e-5, adaptive_budget=64)
    islands, pop_size = 4, 8
    pops = jax.vmap(
        lambda k: make_population_sampler(fset, 3, 16)(k, pop_size)
    )(jr.split(jr.PRNGKey(1), islands))
    mesh = make_mesh(4)

    def eval_islands(p):
        # p is the LOCAL shard inside shard_map: use its own island count
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), p
        )
        return ev.evaluate_population(flat, data).reshape(p.ops.shape[0], -1)

    with pltpu.force_tpu_interpret_mode():
        sharded = np.asarray(
            jax.jit(make_sharded_evaluator(eval_islands, mesh))(pops)
        )
        unsharded = np.asarray(jax.jit(eval_islands)(pops))
    np.testing.assert_array_equal(sharded, unsharded)
