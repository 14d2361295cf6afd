"""Physical-plan property regression tests.

Each flagship query's plan must keep the properties documented in
PLANS.md (pushdown, pruning, broadcast choice, single-scan pivots,
generator fan-out, top-k shape). A refactor that silently loses one —
e.g. a filter that stops reaching the scan, or a pivot that regresses to
a double scan — fails here, not in production at 1000× the data.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_plans import CHECKS, check_plan  # noqa: E402


@pytest.mark.parametrize("name,fragments", [(c[0], c[1]) for c in CHECKS],
                         ids=[c[0] for c in CHECKS])
def test_plan_keeps_required_properties(spark, name, fragments):
    missing, plan = check_plan(spark, name, fragments)
    assert not missing, (
        f"{name} lost plan properties {missing}; operator tree:\n"
        + plan.split("\n\n")[0]
    )
