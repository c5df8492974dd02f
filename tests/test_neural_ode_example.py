"""Neural-ODE training smoke test: reverse mode through the ADAPTIVE dopri5
solve (examples/neural_ode_dopri.py) must actually learn the vector field —
the end-to-end certification of dopri_adjoint's gradients inside a real
optimizer loop (compare the reference's forward-dual-only explicit family,
dopri853ted.hpp)."""

import pytest

pytestmark = pytest.mark.slow


def test_neural_ode_trains():
    from examples.neural_ode_dopri import main

    loss0, lossN, holdout = main(steps=200, verbose=False)
    assert lossN < loss0 / 20.0          # measured ~180x in 200 Adam steps
    assert holdout < 0.5                 # generalizes, not memorizes


def test_neural_ode_trains_with_running_cost():
    """Kinetic-energy-regularized training (loss = fit + λ·∫‖f_θ‖² dt):
    the Lagrange term's gradient rides dopri_adjoint(cost=) — the
    integral-cost reverse mode must steer a real optimizer, not just pass
    FD checks."""
    from examples.neural_ode_dopri import main

    loss0, lossN, holdout = main(steps=120, verbose=False, reg=1e-3)
    assert lossN < loss0 / 5.0
    assert holdout < 0.5
