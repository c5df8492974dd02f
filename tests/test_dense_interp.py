"""Post-hoc dense output: solve_ivp(dense=N) -> Solution.interpolate(ts)
(scipy's dense_output/sol(t) role; the reference's on-demand ntrprad)."""

import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options, solve_ivp


def test_interpolate_matches_t_eval_and_scipy():
    from scipy.integrate import solve_ivp as sp

    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mus = jnp.array([20.0, 80.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    ts = jnp.linspace(0.05, 0.95, 7)
    sol = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="radau", args=mus,
                    options=opts, jac=vdp_jac, t_eval=ts, dense=512)
    yi = sol.interpolate(ts)
    # identical polynomial as the in-loop t_eval sampling
    np.testing.assert_allclose(np.asarray(yi), np.asarray(sol.ys),
                               rtol=1e-12, atol=1e-14)
    # and correct vs scipy at solver accuracy
    for i in range(2):
        ref = sp(lambda t, y, mu=float(mus[i]):
                 [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
                 (0.0, 1.0), np.asarray(y0[i]), method="Radau",
                 rtol=1e-11, atol=1e-13, dense_output=True)
        np.testing.assert_allclose(np.asarray(yi[i]),
                                   ref.sol(np.asarray(ts)).T, rtol=1e-6,
                                   atol=1e-9)


def test_interpolate_per_lane_queries_clamp_and_reverse_time():
    y0 = jnp.array([[1.0, 0.0], [0.5, 0.2]])
    opts = Options(rtol=1e-10, atol=1e-13)

    def osc(t, y, k):
        return jnp.stack([y[:, 1], -k * y[:, 0]], axis=-1)

    # reverse time: tf < t0
    sol = solve_ivp(osc, (1.0, 0.0), y0, method="radau", args=2.0,
                    options=opts, dense=256)
    ts = jnp.array([[0.9, 0.3, -5.0],      # -5 clamps to the endpoint 0
                    [0.7, 0.1, 2.0]])      # 2 clamps to the start 1
    yi = sol.interpolate(ts)
    assert yi.shape == (2, 3, 2)
    # endpoints: clamped queries hit the terminal/initial states
    np.testing.assert_allclose(np.asarray(yi[0, 2]), np.asarray(sol.y[0]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(yi[1, 2]), np.asarray(y0[1]),
                               rtol=1e-10)
    # interior vs a fresh solve to that time
    s2 = solve_ivp(osc, (1.0, 0.3), y0, method="radau", args=2.0,
                   options=opts)
    np.testing.assert_allclose(np.asarray(yi[0, 1]), np.asarray(s2.y[0]),
                               rtol=1e-8)


def test_interpolate_overflow_is_nan_and_guards():
    y0 = jnp.array([[2.0, 0.0]])
    opts = Options(rtol=1e-9, atol=1e-12)
    sol = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="radau",
                    args=jnp.array([300.0]), options=opts, jac=vdp_jac,
                    dense=8)                      # far too small
    yi = sol.interpolate(jnp.array([0.5]))
    assert bool(jnp.all(jnp.isnan(yi)))

    plain = solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="radau",
                      args=jnp.array([300.0]), options=opts, jac=vdp_jac)
    with pytest.raises(ValueError, match="dense"):
        plain.interpolate(jnp.array([0.5]))
    with pytest.raises(ValueError, match="dense"):
        solve_ivp(vdp_rhs, (0.0, 1.0), y0, method="bdf2",
                  args=jnp.array([300.0]), jac=vdp_jac, dense=64)


def test_radaup_dense_mesh_interpolate():
    """dense= on the variable-order ladder: the stored per-step collocation
    coefficients ARE the shared power basis, so interpolate must equal the
    t_eval sampling path bitwise."""
    from janus_tpu.models.problems import vdp_rhs as _vdp

    mus = jnp.array([10.0, 500.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    ts = jnp.linspace(0.0, 2.0, 17)
    sol = solve_ivp(_vdp, (0.0, 2.0), y0, method="radaup", args=mus,
                    rtol=1e-9, atol=1e-12, dense=1024)
    yi = sol.interpolate(ts)
    ref = solve_ivp(_vdp, (0.0, 2.0), y0, method="radaup", args=mus,
                    rtol=1e-9, atol=1e-12, t_eval=ts)
    np.testing.assert_array_equal(np.asarray(yi), np.asarray(ref.ys))
