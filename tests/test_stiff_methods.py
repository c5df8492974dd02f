"""BDF2 / SEULEX / ROS4 oracle tests — scipy cross-checks at matched
tolerances, heterogeneous batches, Robertson-style kinetics."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

from janus_tpu.solve import solve_ivp, Options, SUCCESS
from janus_tpu.models.problems import vdp_rhs, harmonic_rhs


def scipy_vdp(mu, tf, rtol, atol, method="Radau"):
    return ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
              (0.0, tf), [2.0, 0.0], method=method, rtol=rtol, atol=atol)


METHODS = ["bdf2", "seulex", "rodas"]


@pytest.mark.parametrize("method", METHODS)
def test_mild_vdp(method):
    mu = 5.0
    ref = scipy_vdp(mu, 10.0, 1e-8, 1e-11)
    sol = solve_ivp(vdp_rhs, (0.0, 10.0), jnp.array([[2.0, 0.0]]),
                    method=method, args=mu, rtol=1e-6, atol=1e-9)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("method", METHODS)
def test_stiff_vdp_mu1000(method):
    mu = 1000.0
    ref = scipy_vdp(mu, 2.0, 1e-9, 1e-12)
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method=method, args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)
    # must exploit stiffness: far fewer steps than an explicit method would
    assert int(sol.stats["nsteps"][0]) < 2000


@pytest.mark.parametrize("method", METHODS)
def test_heterogeneous_batch(method):
    mus = jnp.array([1.0, 100.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    sol = solve_ivp(vdp_rhs, (0.0, 5.0), y0, method=method, args=mus,
                    rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = scipy_vdp(float(mu), 5.0, 1e-9, 1e-12)
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1], rtol=5e-4,
                                   atol=5e-5)


def robertson_rhs(t, y, args):
    a, b, c = 0.04, 1e4, 3e7
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    d1 = -a * y1 + b * y2 * y3
    d3 = c * y2 * y2
    return jnp.stack([d1, -d1 - d3, d3], axis=-1)


@pytest.mark.parametrize("method", ["radau", "bdf2", "seulex", "rodas"])
def test_robertson_kinetics(method):
    """The classic extremely stiff chemistry problem over 4 decades of t."""
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 100.0), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-8, atol=1e-12)
    sol = solve_ivp(robertson_rhs, (0.0, 100.0), jnp.array([[1.0, 0.0, 0.0]]),
                    method=method, args=None, rtol=1e-6, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS, sol.status
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=2e-3, atol=1e-7)


@pytest.mark.parametrize("method", METHODS)
def test_dense_output(method):
    omega = 1.0
    t_eval = jnp.linspace(0.0, 5.0, 11)
    sol = solve_ivp(harmonic_rhs, (0.0, 5.0), jnp.array([[1.0, 0.0]]),
                    method=method, args=omega, rtol=1e-8, atol=1e-11,
                    t_eval=t_eval)
    assert not np.any(np.isnan(np.asarray(sol.ys)))
    np.testing.assert_allclose(sol.ys[0, :, 0], np.cos(np.asarray(t_eval)),
                               rtol=2e-3, atol=2e-4)
