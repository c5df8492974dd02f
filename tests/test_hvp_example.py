"""Smoke test for the Newton-CG / radau_hvp example: second-order steps with
forward-over-adjoint curvature must beat gradient descent at an equal
adjoint-solve budget on the Mayer+Lagrange oscillator fit."""

import os
import sys
import pytest

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_newton_cg_hvp_beats_gd_at_equal_budget():
    import newton_cg_hvp as ex

    l_newton, l_gd = ex.main(newton_iters=4)
    assert l_newton < l_gd
