"""Run-level golden parity vs the executing reference (tools/golden_run.py).

Full-scale runs (pop 60 x 2 islands, 25-30 gens, 3 seeds) are committed to
docs/GOLDEN_PARITY.md; these pin TINY configs in CI so the full-loop
plumbing — reference initializer/operators/evaluators driven through the
refshim vs our strategy on identical data — cannot silently regress.
Decay criteria are relaxed (short runs are decay-noisy); the load-bearing
assertions are finiteness + same quality class.

Skipped when the read-only reference checkout is absent.
"""
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/MultiTreeGP"),
    reason="reference checkout not present",
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_golden_run_sr_small(tmp_path):
    import golden_run

    golden_run.main(
        generations=8, population_size=40, num_islands=2, batch_size=4,
        horizon=3.0, seeds=(0,), report_path=str(tmp_path / "report.md"),
        decay_factor=1.01, agree_slack=2.0,
    )


def test_golden_run_static_policy_small(tmp_path):
    import golden_run

    golden_run.main_policy_run(
        generations=6, population_size=40, num_islands=2, batch_size=4,
        horizon=2.0, seeds=(0,), env_name="harmonic",
        report_path=str(tmp_path / "report.md"),
        expect_decay=False, agree_tol=15.0,
    )


def test_golden_run_dynamic_policy_small(tmp_path):
    import golden_run

    golden_run.main_dynamic_run(
        generations=6, population_size=40, num_islands=2, batch_size=4,
        horizon=2.0, seeds=(0,), env_name="harmonic",
        report_path=str(tmp_path / "report.md"),
        expect_decay=False, agree_tol=15.0,
    )
