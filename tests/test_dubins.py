"""Dubins-car problems (reference dubins_pmp family): forward dynamics and a
PMP steering BVP solved by shooting."""

import jax.numpy as jnp
import numpy as np

from janus_tpu.control import single_shooting
from janus_tpu.models.problems import dubins_rhs, dubins_pmp_rhs
from janus_tpu.solve import solve_ivp, Options
import pytest

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def test_dubins_circle():
    """Constant turn rate traces a circle of radius v/u."""
    args = {"v": 1.0, "u": 0.5}
    y0 = jnp.zeros((1, 3))
    sol = solve_ivp(dubins_rhs, (0.0, 2 * np.pi / 0.5), y0, args=args,
                    rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sol.y[0], [0.0, 0.0, 2 * np.pi], atol=1e-6)


def test_dubins_pmp_steering():
    """Steer to a target position (free heading) in fixed time via shooting
    on the initial costates (smoothed control)."""
    args = {"v": 1.0, "umax": 2.0, "eps": 0.2}
    target = jnp.array([1.2, 0.8])
    tf = 2.0

    def residual(p0):
        m = p0.shape[0]
        y0 = jnp.concatenate([jnp.zeros((m, 3)), p0[:, :2],
                              p0[:, 2:]], axis=-1)
        sol = solve_ivp(dubins_pmp_rhs, (0.0, tf), y0, method="radau",
                        args=args, options=Options(rtol=1e-9, atol=1e-12))
        # position defect + free-heading transversality p3(T)=0
        return jnp.concatenate([sol.y[:, :2] - target[None], sol.y[:, 5:6]],
                               axis=-1)

    res = single_shooting(residual, jnp.array([[0.1, 0.1, 0.1]]), tol=1e-8)
    assert bool(res.converged[0]), float(res.fnorm[0])
    # verify by forward integration
    y0 = jnp.concatenate([jnp.zeros((1, 3)), res.x[:, :2], res.x[:, 2:]],
                         axis=-1)
    sol = solve_ivp(dubins_pmp_rhs, (0.0, tf), y0, method="radau", args=args,
                    options=Options(rtol=1e-10, atol=1e-13))
    np.testing.assert_allclose(sol.y[0, :2], target, atol=1e-7)
