"""solve_adjoint — the unified reverse-mode entry (solve_ivp's counterpart).

Routes method names (and solve_ivp's aliases) onto the per-family adjoints
and raises loudly for families without reverse mode. Analytic oracle: for
y' = -a y, loss = y(T)^2, the gradients are 2 y0 e^{-2aT} (y0) and
-2 T y0^2 e^{-2aT} (a) — checked per family at its tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import Options, solve_adjoint

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


def rhs(t, y, a):
    return -a[:, None] * y


T = 1.5


@pytest.mark.parametrize("method", ["radau", "rodas", "seulex", "dopri5",
                                    "dop853", "bdf"])
def test_analytic_linear_decay(method):
    y0 = jnp.array([[2.0], [0.7]])
    a = jnp.array([0.8, 1.6])
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=128, seulex_kmax=6)

    def loss(y0, a):
        yT = solve_adjoint(rhs, (0.0, T), y0, method=method, args=a,
                           options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_a = jax.grad(loss, argnums=(0, 1))(y0, a)
    ref_y0 = 2.0 * y0[:, 0] * jnp.exp(-2.0 * a * T)
    ref_a = -2.0 * T * y0[:, 0] ** 2 * jnp.exp(-2.0 * a * T)
    np.testing.assert_allclose(np.asarray(g_y0[:, 0]), np.asarray(ref_y0),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(ref_a),
                               rtol=1e-5)


def test_unsupported_method_raises():
    y0 = jnp.array([[1.0]])
    with pytest.raises(ValueError, match="no reverse mode"):
        solve_adjoint(rhs, (0.0, 1.0), y0, method="grk4t",
                      args=jnp.array([1.0]))


def test_t_eval_routes():
    y0 = jnp.array([[2.0], [0.7]])
    a = jnp.array([0.8, 1.6])
    ts = jnp.array([0.5, 1.0, 1.5])
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=64)

    def loss(y0):
        ys = solve_adjoint(rhs, (0.0, T), y0, method="dopri5", args=a,
                           options=opts, t_eval=ts)
        return jnp.sum(ys ** 2)

    g = jax.grad(loss)(y0)
    ref = 2.0 * y0[:, 0] * jnp.sum(
        jnp.exp(-2.0 * a[:, None] * ts[None, :]), axis=1)
    np.testing.assert_allclose(np.asarray(g[:, 0]), np.asarray(ref),
                               rtol=1e-5)
