"""Problem-library oracle checks (Robertson, Brusselator, Pleiades, Hairer II
stiff set: HIRES, Oregonator, E5)."""

import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp as ss

from janus_tpu.models.problems import (robertson_rhs, brusselator_rhs,
                                       pleiades_rhs)
from janus_tpu.solve import solve_ivp, SUCCESS


def test_robertson_long_horizon():
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 1e4), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-9, atol=1e-13)
    sol = solve_ivp(robertson_rhs, (0.0, 1e4), jnp.array([[1.0, 0.0, 0.0]]),
                    method="radau", rtol=1e-7, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-3, atol=1e-9)
    # mass conservation
    np.testing.assert_allclose(float(jnp.sum(sol.y[0])), 1.0, rtol=1e-9)


def test_brusselator_limit_cycle():
    ref = ss(lambda t, y: [1 + y[0] ** 2 * y[1] - 4 * y[0],
                           3 * y[0] - y[0] ** 2 * y[1]],
             (0.0, 10.0), [1.5, 3.0], method="Radau", rtol=1e-10, atol=1e-13)
    sol = solve_ivp(brusselator_rhs, (0.0, 10.0), jnp.array([[1.5, 3.0]]),
                    method="radau", args={"a": 1.0, "b": 3.0},
                    rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-5, atol=1e-7)


def test_pleiades_explicit():
    """7-body gravitational problem with dopri853 vs scipy DOP853."""
    q0 = np.array([3.0, 3.0, -1.0, -3.0, 2.0, -2.0, 2.0,
                   3.0, -3.0, 2.0, 0.0, 0.0, -4.0, 4.0])
    v0 = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.75, -1.5,
                   0.0, 0.0, 0.0, -1.25, 1.0, 0.0, 0.0])
    y0 = np.concatenate([q0, v0])

    def np_rhs(t, y):
        return np.asarray(pleiades_rhs(t, jnp.asarray(y)[None, :], None))[0]

    ref = ss(np_rhs, (0.0, 1.0), y0, method="DOP853", rtol=1e-10, atol=1e-12)
    sol = solve_ivp(pleiades_rhs, (0.0, 1.0), jnp.asarray(y0)[None, :],
                    method="dopri853", rtol=1e-10, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-7, atol=1e-8)


def test_hires_vs_scipy():
    """HIRES (Hairer II stiff set) full horizon, variable-order radaup."""
    from janus_tpu.models.problems import hires_rhs, HIRES_Y0, HIRES_TF
    y0 = jnp.array([HIRES_Y0])
    ref = ss(lambda t, y: np.asarray(hires_rhs(t, y[None, :], None))[0],
             (0.0, HIRES_TF), list(HIRES_Y0), method="Radau",
             rtol=1e-10, atol=1e-12)
    sol = solve_ivp(hires_rhs, (0.0, HIRES_TF), y0, method="radaup",
                    rtol=1e-8, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-8)


def test_orego_vs_scipy():
    """Oregonator limit cycle (5-decade state swings), fixed-order radau."""
    from janus_tpu.models.problems import orego_rhs, OREGO_Y0, OREGO_TF
    y0 = jnp.array([OREGO_Y0])
    ref = ss(lambda t, y: np.asarray(orego_rhs(t, y[None, :], None))[0],
             (0.0, OREGO_TF), list(OREGO_Y0), method="Radau",
             rtol=1e-10, atol=1e-12)
    sol = solve_ivp(orego_rhs, (0.0, OREGO_TF), y0, method="radau",
                    rtol=1e-8, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=5e-4, atol=1e-8)


def test_e5_short_horizon_vs_scipy():
    """E5 pyrolysis: extreme dynamic range needs honest per-component error
    weighting (atol ≪ any state scale); seulex on a shortened horizon."""
    from janus_tpu.models.problems import e5_rhs, E5_Y0, E5_TF
    y0 = jnp.array([E5_Y0])
    ref = ss(lambda t, y: np.asarray(e5_rhs(t, y[None, :], None))[0],
             (0.0, E5_TF), list(E5_Y0), method="Radau",
             rtol=1e-11, atol=1e-22)
    sol = solve_ivp(e5_rhs, (0.0, E5_TF), y0, method="seulex",
                    rtol=1e-9, atol=1e-20)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4,
                               atol=1e-25)
