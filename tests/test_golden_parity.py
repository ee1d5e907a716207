"""Golden parity vs the executing reference (tools/golden_parity.py).

Skipped when the read-only reference checkout is absent. The full-size run
and the committed report are docs/GOLDEN_PARITY.md; this pins a small config
in CI so representation compatibility and evaluator equivalence cannot
silently regress.
"""
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/MultiTreeGP"),
    reason="reference checkout not present",
)


def test_golden_parity_small(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main(
        population_size=20, batch_size=4, horizon=3.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_policy_parity_small(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_policy(
        population_size=20, batch_size=4, horizon=2.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_dynamic_parity_small(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_dynamic(
        population_size=20, batch_size=4, horizon=2.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_acrobot_diverging_horizon(tmp_path):
    # pins the succeed-then-die fitness semantics (diffrax inf-fill + acrobot
    # post-success cost zeroing) that the notebook-scale runs depend on
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_acrobot(
        population_size=200, batch_size=4, horizon=20.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_adaptive_parity_small(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_adaptive(
        population_size=20, batch_size=4, horizon=3.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_adaptive_policy_parity_small(tmp_path):
    """The policy notebooks' Dopri5+PID config, closed loop, ref vs ours
    (r5; the fused adaptive policy kernel's semantics are pinned to this
    general path exactly in test_policy_interpret.py)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_policy_adaptive(
        population_size=20, batch_size=4, horizon=2.0,
        report_path=str(tmp_path / "report.md"),
    )


def test_golden_adaptive_dynamic_parity_small(tmp_path):
    """Dynamic (stateful) policy under Dopri5+PID, ref vs ours (r5) — the
    last cell of the reference-solver parity matrix."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import golden_parity

    golden_parity.main_dynamic_adaptive(
        population_size=20, batch_size=4, horizon=2.0,
        report_path=str(tmp_path / "report.md"),
    )
