"""Dispatch-gate regression tests (pure host logic, no device work).

Pins the policy kernel's VMEM byte gate — the policy kernel keeps 3 tree
streams + a row-value scratch resident at 32-sublane rows (16 KB/row, 4x the
SR deep kernel's 8-sublane rows), so the SR ``m*n <= 512`` budget would admit
configs needing ~24 MB of VMEM against the ~16 MB/core budget — and the
adaptive kernel's method validation (an unknown method must raise like
``integrators.integrate_adaptive``, not silently integrate with the dopri5
tableau).
"""
import jax.numpy as jnp
import pytest

from multitreegp_tpu.core import pallas_policy as pp
from multitreegp_tpu.core import pallas_rollout as prl
from multitreegp_tpu.core.trees import TreeTensors


class _TileEnv:
    tile_safe_drift = True


def _trees(p, m, n):
    z = jnp.zeros((p, m, n), jnp.int32)
    return TreeTensors(z, z, z, jnp.zeros((p, m, n), jnp.float32))


def test_policy_vmem_gate(monkeypatch):
    monkeypatch.setattr(pp, "tpu_kernels_available", lambda: True)
    env = _TileEnv()
    avail = lambda m, n: pp.policy_rollout_available(env, None, _trees(4, m, n), {})

    # (2*m*n + stack_planes(n)) rows of 16 KB must stay under 10 MB ->
    # <= 640 rows (the stack eval ships 2 tree streams, no child indices)
    assert avail(1, 128)  # 321 rows
    assert avail(1, 192)  # 481 rows (the old 3-stream gate rejected this)
    assert avail(3, 30)  # the dynamic-policy notebook shape
    assert avail(2, 64)  # 289 rows
    assert avail(2, 128)  # 577 rows — admitted since the stack rewrite
    assert not avail(1, 256)  # 641 rows: one over the budget
    assert not avail(3, 128)  # 833 rows
    # hard node ceiling independent of m
    assert not avail(1, prl.DEEP_MAX_NODES * 2)


def test_adaptive_kernel_rejects_unknown_method():
    with pytest.raises(ValueError, match="unknown adaptive method"):
        prl._make_adaptive_fitness_kernel(
            None, 32, 2, 10, 8, 1e-3, 1e-5, 0.9, "tsit5", 8
        )
