"""Fused reproduction kernel under CPU interpret mode.

Runs the REAL `reproduce_pairs_pallas` kernel — on-core PRNG included — via
``pltpu.force_tpu_interpret_mode``, so the one remaining TPU-only kernel is
pinned in CI: every child satisfies the tree-tensor invariants, crossover
lanes conserve nodes as multisets, pass-through lanes copy parents exactly.
(Law-level equivalence of the surgery algorithms themselves is pinned by
tests/test_tile_surgery.py against the per-tree XLA ops.)
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

try:
    from jax.experimental.pallas import tpu as pltpu

    HAS_INTERPRET = hasattr(pltpu, "force_tpu_interpret_mode")
except Exception:  # pragma: no cover
    HAS_INTERPRET = False

pytestmark = pytest.mark.skipif(
    not HAS_INTERPRET, reason="needs pallas TPU interpret mode"
)


@pytest.mark.parametrize("max_nodes,p", [(32, 64), (128, 16)])
def test_reproduce_pairs_kernel_invariants(max_nodes, p):
    from multitreegp_tpu.core import tile_surgery as ts
    from multitreegp_tpu.core.pallas_reproduction import reproduce_pairs_pallas
    from multitreegp_tpu.core.registry import build_function_set
    from multitreegp_tpu.core.trees import validate_host
    from multitreegp_tpu.ops.initialization import make_population_sampler

    fset = build_function_set(
        [("+", jnp.add, 2, 0.5), ("-", jnp.subtract, 2, 0.1),
         ("*", jnp.multiply, 2, 0.5), ("/", jnp.divide, 2, 0.1)],
        [["x0", "x1"]], [2],
    )
    cfg = ts.make_config(fset, max_nodes, 4)
    left = make_population_sampler(fset, 4, max_nodes)(jr.PRNGKey(0), p)
    right = make_population_sampler(fset, 4, max_nodes)(jr.PRNGKey(1), p)
    cx = jr.bernoulli(jr.PRNGKey(2), 0.4, (p, 2))
    act1 = jr.randint(jr.PRNGKey(3), (p, 2), 0, 3)
    act2 = jr.randint(jr.PRNGKey(4), (p, 2), 0, 3)
    with pltpu.force_tpu_interpret_mode():
        c1, c2 = reproduce_pairs_pallas(
            left, right, cx, act1, act2, jnp.int32(1234), fset, cfg
        )
    validate_host(c1, fset.slots)
    validate_host(c2, fset.slots)

    cxm = np.asarray(cx)
    for pi in range(0, p, 9):
        for t in range(2):
            if cxm[pi, t]:
                parents = sorted(
                    np.asarray(left.ops[pi, t]).tolist()
                    + np.asarray(right.ops[pi, t]).tolist()
                )
                children = sorted(
                    np.asarray(c1.ops[pi, t]).tolist()
                    + np.asarray(c2.ops[pi, t]).tolist()
                )
                assert parents == children, (pi, t)

    passm = (np.asarray(act1) == 0) & ~cxm
    np.testing.assert_array_equal(
        np.asarray(c1.ops)[passm], np.asarray(left.ops)[passm]
    )
