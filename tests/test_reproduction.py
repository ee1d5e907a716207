"""Generation step: elitism, tournament selection, reproduction dispatch,
and ring migration semantics."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from multitreegp_tpu.core.registry import build_function_set, default_sr_operators
from multitreegp_tpu.core.trees import tree_sizes, validate_host, TreeTensors
from multitreegp_tpu.ops.initialization import make_population_sampler, make_tree_sampler
from multitreegp_tpu.ops.mutation import make_mutators
from multitreegp_tpu.ops.reproduction import (
    island_hyperparams,
    make_evolve_island,
    make_evolve_populations,
    migrate_ring,
    tournament_select,
)

N = 32
POP = 20
ELITE = 2


@pytest.fixture(scope="module")
def setup():
    fset = build_function_set(default_sr_operators(), [["x0", "x1"]], [2])
    sample_tree = make_tree_sampler(fset, 4, N)
    sample_pop = make_population_sampler(fset, 4, N)
    mutate_candidate, _, _ = make_mutators(fset, sample_tree, N, 4)

    def sample_candidate(key):
        keys = jr.split(key, fset.num_trees)
        return jax.vmap(sample_tree, in_axes=(0, None, 0))(
            keys, jnp.int32(4), fset.variable_mask
        )

    evolve_island = make_evolve_island(
        fset, mutate_candidate, sample_candidate, POP, ELITE, tournament_size=5
    )
    return fset, sample_pop, evolve_island


def test_tournament_prefers_fit(setup):
    fset, sample_pop, _ = setup
    pop = sample_pop(jr.PRNGKey(0), POP)
    fitness = jnp.arange(POP, dtype=jnp.float32)  # candidate 0 is best
    probs = 0.9 * (1 - 0.9) ** jnp.arange(5)
    picks = jax.vmap(
        lambda k: tournament_select(pop, fitness, k, probs, 5).ops[0, -1]
    )(jr.split(jr.PRNGKey(1), 200))
    # winners should be biased toward low-index (fit) candidates; compare root
    # opcodes frequency with the best candidate's root
    best_root = pop.ops[0, 0, -1]
    assert (picks == best_root).mean() > 0.2


def test_evolve_island_shapes_and_elite(setup):
    fset, sample_pop, evolve_island = setup
    pop = sample_pop(jr.PRNGKey(2), POP)
    fitness = jr.uniform(jr.PRNGKey(3), (POP,))
    tp = 0.8 * (1 - 0.8) ** jnp.arange(5)
    new = jax.jit(evolve_island)(
        pop, fitness, jr.PRNGKey(4), jnp.asarray([0.6, 0.3, 0.1]), 0.5, tp
    )
    assert new.ops.shape == pop.ops.shape
    validate_host(new, fset.slots)
    # elite preserved: best ELITE candidates appear unchanged at the front
    order = np.argsort(np.asarray(fitness))
    np.testing.assert_array_equal(
        np.asarray(new.ops[:ELITE]), np.asarray(pop.ops[order[:ELITE]])
    )


def test_migrate_ring(setup):
    fset, sample_pop, _ = setup
    islands = 4
    pops = jax.vmap(lambda k: sample_pop(k, POP))(jr.split(jr.PRNGKey(5), islands))
    fitness = jr.uniform(jr.PRNGKey(6), (islands, POP))
    msize = 3
    out, out_fit = migrate_ring(pops, fitness, msize)
    assert out.ops.shape == pops.ops.shape
    validate_host(out, fset.slots)
    f = np.asarray(fitness)
    of = np.asarray(out_fit)
    for i in range(islands):
        sender = (i - 1) % islands
        best_sender = np.sort(f[sender])[:msize]
        # migrated rows carry the sender's best fitness values
        np.testing.assert_allclose(np.sort(of[i][:msize]), best_sender)
        # the receiver's best survivors are intact
        kept = np.sort(f[i])[: POP - msize]
        np.testing.assert_allclose(np.sort(of[i][msize:]), kept)


def test_evolve_populations_migration_gate(setup):
    fset, sample_pop, evolve_island = setup
    islands = 3
    tp, rtp, rp = island_hyperparams(
        islands, 5, (0.6, 0.9), (1.0, 0.5), (0.9, 0.4), (0.1, 0.5), (0.0, 0.1)
    )
    evolve_populations = make_evolve_populations(evolve_island, 10, 2, rtp, rp, tp)
    pops = jax.vmap(lambda k: sample_pop(k, POP))(jr.split(jr.PRNGKey(7), islands))
    fitness = jr.uniform(jr.PRNGKey(8), (islands, POP))
    out = jax.jit(evolve_populations)(pops, fitness, jr.PRNGKey(9), jnp.int32(0))
    assert out.ops.shape == pops.ops.shape
    validate_host(out, fset.slots)
    # generation 9 triggers migration ((9+1)%10==0) — still valid trees
    out2 = jax.jit(evolve_populations)(pops, fitness, jr.PRNGKey(9), jnp.int32(9))
    validate_host(out2, fset.slots)
