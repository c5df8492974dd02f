"""Smoke test for the learned-continuation example (the reference's SSSC-ML
workload, sssc_ml_vdp.py role): solver-generated Δλ_max data -> native
binary IO round-trip -> MLP policy -> homotopy(dlam_fn=policy) takes fewer
continuation steps than the fixed schedule on held-out instances."""

import os
import sys
import pytest

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_learned_continuation_beats_fixed_schedule():
    import learned_continuation as lc

    r_fixed, r_react, r_ml = lc.main()
    assert bool(r_ml.converged.all())
    assert float(r_ml.iters.mean()) < float(r_fixed.iters.mean())
