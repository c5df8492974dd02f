"""Sensitivities through solves on locally-polynomial dynamics.

Constant-derivative dynamics make every RK/collocation error estimate and
second Newton correction EXACTLY zero. Two NaN-tangent traps lurked there
(debugged round 2): d(sqrt)(0) = 0/0 in the scaled norms (fixed by
cm.safe_sqrt's zero subgradient), and lax.min's mask-multiplied JVP turning
the ±inf tangent of max_step/|h| (max_step = inf default) into inf·0 = NaN
(fixed by a finite cap in ndf.py). jacfwd through every method must return
the exact constant sensitivity, no NaNs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import Options, solve_ivp


def rhs(t, y, args):
    return jnp.broadcast_to(jnp.stack([args, 2.0 * args], axis=-1), y.shape)


METHODS = ["dopri5", "dopri853", "radau", "radaup", "bdf", "bdf2", "rodas",
           "grk4t", "seulex"]


@pytest.mark.parametrize("method", METHODS)
def test_jacfwd_constant_dynamics(method):
    def final(a):
        sol = solve_ivp(rhs, (0.0, 2.0), jnp.array([[0.1, 0.2]]),
                        method=method, args=a,
                        options=Options(rtol=1e-7, atol=1e-10))
        return sol.y

    J = jax.jacfwd(final)(jnp.array(0.3))
    assert not bool(jnp.any(jnp.isnan(J))), np.asarray(J)
    # y(T) = y0 + T*(a, 2a)  =>  dy/da = (T, 2T) = (2, 4)
    np.testing.assert_allclose(np.asarray(J).ravel(), [2.0, 4.0],
                               rtol=1e-6, atol=1e-8)


def test_safe_sqrt_tangent_at_zero():
    from janus_tpu.solve.common import safe_sqrt

    val, tan = jax.jvp(safe_sqrt, (jnp.array(0.0),), (jnp.array(0.0),))
    assert float(val) == 0.0 and float(tan) == 0.0
    val, tan = jax.jvp(safe_sqrt, (jnp.array(4.0),), (jnp.array(1.0),))
    np.testing.assert_allclose([float(val), float(tan)], [2.0, 0.25])
