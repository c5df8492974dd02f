"""Mass-matrix / index-1 DAE support in Radau (reference NbrInd1-3 role)."""

import jax.numpy as jnp
import numpy as np

from janus_tpu.solve import Options, SUCCESS
from janus_tpu.solve.radau import solve_radau


def test_index1_dae_exponential():
    """M = diag(1,0):  y1' = −y1 ;  0 = y2 − y1  ⇒ y1 = y2 = e^{−t}."""
    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    sol = solve_radau(f, 0.0, 2.0, jnp.array([[1.0, 1.0]]), mass=mass,
                      options=Options(rtol=1e-9, atol=1e-12))
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], np.exp(-2.0), rtol=1e-7)


def test_dae_constrained_oscillator():
    """q' = v, v' = −q + λ, 0 = q − sin-free... use algebraic coupling:
    z must track q² (index-1): M=diag(1,1,0), z − q² = 0."""
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))

    def f(t, y, args):
        q, v, z = y[..., 0], y[..., 1], y[..., 2]
        return jnp.stack([v, -q, z - q * q], axis=-1)

    sol = solve_radau(f, 0.0, 3.0, jnp.array([[1.0, 0.0, 1.0]]), mass=mass,
                      options=Options(rtol=1e-10, atol=1e-13))
    assert int(sol.status[0]) == SUCCESS
    q = np.cos(3.0)
    np.testing.assert_allclose(sol.y[0, 0], q, rtol=1e-7)
    np.testing.assert_allclose(sol.y[0, 2], q * q, rtol=1e-6)


def test_singular_mass_batched():
    """Batched per-instance mass matrices."""
    m1 = jnp.diag(jnp.array([1.0, 0.0]))
    m2 = jnp.eye(2)
    mass = jnp.stack([m1, m2])

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    sol = solve_radau(f, 0.0, 1.0, jnp.array([[1.0, 1.0], [1.0, 1.0]]),
                      mass=mass, options=Options(rtol=1e-9, atol=1e-12))
    assert bool(jnp.all(sol.status == SUCCESS))
    # lane 0 (DAE): y2 = y1 = e^-1 ; lane 1 (ODE): y2' = y2−y1 from y2(0)=1
    np.testing.assert_allclose(sol.y[0], np.exp(-1.0), rtol=1e-7)
    np.testing.assert_allclose(sol.y[1, 0], np.exp(-1.0), rtol=1e-7)


def test_index3_pendulum():
    """Index-3 Cartesian pendulum (the canonical NIND3 test, Hairer II.VII):
    x' = vx, y' = vy, vx' = -lam*x, vy' = -lam*y - g, 0 = x²+y²-1, with
    M = diag(1,1,1,1,0), NIND1=2, NIND2=2, NIND3=1. Oracle: the angle ODE
    th'' = -g sin th (x = sin th, y = -cos th) integrated by dopri853."""
    g = 9.81
    mass = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0, 0.0]))

    def f(t, y, args):
        x, yy, vx, vy, lam = (y[..., i] for i in range(5))
        return jnp.stack([vx, vy, -lam * x, -lam * yy - g,
                          x * x + yy * yy - 1.0], axis=-1)

    # start at theta = pi/2 (horizontal), at rest: consistent lam = 0
    y0 = jnp.array([[1.0, 0.0, 0.0, 0.0, 0.0]])
    tf = 1.2
    sol = solve_radau(f, 0.0, tf, y0, mass=mass,
                      options=Options(rtol=1e-8, atol=1e-10, nind1=2,
                                      nind2=2, nind3=1))
    assert int(sol.status[0]) == SUCCESS

    from janus_tpu.solve import solve_ivp

    def angle(t, th, args):
        return jnp.stack([th[..., 1], -g * jnp.sin(th[..., 0])], axis=-1)

    ref = solve_ivp(angle, (0.0, tf), jnp.array([[jnp.pi / 2, 0.0]]),
                    method="dopri853",
                    options=Options(rtol=1e-12, atol=1e-14))
    th = float(ref.y[0, 0])
    np.testing.assert_allclose(np.asarray(sol.y[0, :2]),
                               [np.sin(th), -np.cos(th)],
                               rtol=1e-5, atol=1e-6)
    # constraint and its hidden derivative both hold at the endpoint
    x, yy, vx, vy = (float(sol.y[0, i]) for i in range(4))
    assert abs(x * x + yy * yy - 1.0) < 1e-7
    assert abs(x * vx + yy * vy) < 1e-5


def test_index2_dae():
    """Index-2: x' = z, 0 = x − sin t ⇒ x = sin t, z = cos t (z enters only
    through the differential equation). Needs the nind2 error weighting."""
    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        x, z = y[..., 0], y[..., 1]
        return jnp.stack([z, x - jnp.sin(t)], axis=-1)

    sol = solve_radau(f, 0.0, 2.0, jnp.array([[0.0, 1.0]]), mass=mass,
                      options=Options(rtol=1e-8, atol=1e-11, nind1=1,
                                      nind2=1))
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [np.sin(2.0), np.cos(2.0)],
                               rtol=1e-7)


def test_index2_dae_radaup():
    """radaup honors nind2 (round-3: the index weighting moved into the
    shared scale path — variable order no longer silently integrates
    higher-index DAEs with the wrong error weights)."""
    from janus_tpu.solve import solve_ivp

    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        x, z = y[..., 0], y[..., 1]
        return jnp.stack([z, x - jnp.sin(t)], axis=-1)

    sol = solve_ivp(f, (0.0, 2.0), jnp.array([[0.0, 1.0]]), method="radaup",
                    mass=mass, options=Options(rtol=1e-8, atol=1e-11,
                                               nind1=1, nind2=1))
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [np.sin(2.0), np.cos(2.0)],
                               rtol=1e-6)


def test_mass_matrix_radaup():
    """radaup + mass matrix (regression: the variable-order Newton used to
    drop the mass from the residuals)."""
    from janus_tpu.solve import solve_ivp

    mass = jnp.diag(jnp.array([1.0, 0.0]))

    def f(t, y, args):
        return jnp.stack([-y[..., 0], y[..., 1] - y[..., 0]], axis=-1)

    sol = solve_ivp(f, (0.0, 2.0), jnp.array([[1.0, 1.0]]), method="radaup",
                    mass=mass, options=Options(rtol=1e-9, atol=1e-12))
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], np.exp(-2.0), rtol=1e-7)


def _amplifier():
    """Hairer-Wanner one-transistor amplifier (Solving ODEs II, the
    'Amplifier' circuit; reference oracle family src/fortran/radau.f):
    index-1 DAE with a NON-diagonal singular capacitance matrix."""
    ub, uf, alpha, beta = 6.0, 0.026, 0.99, 1e-6
    r0, rk = 1000.0, 9000.0
    c1, c2, c3 = 1e-6, 2e-6, 3e-6
    mass = jnp.asarray(np.array([
        [-c1, c1, 0.0, 0.0, 0.0],
        [c1, -c1, 0.0, 0.0, 0.0],
        [0.0, 0.0, -c2, 0.0, 0.0],
        [0.0, 0.0, 0.0, -c3, c3],
        [0.0, 0.0, 0.0, c3, -c3]]))

    def f(t, y, args):
        ue = 0.4 * jnp.sin(200.0 * jnp.pi * t)
        y1, y2, y3, y4, y5 = (y[..., i] for i in range(5))
        g = beta * (jnp.exp(jnp.minimum((y2 - y3) / uf, 60.0)) - 1.0)
        return jnp.stack([
            (y1 - ue) / r0,
            y2 * 2.0 / rk - ub / rk - (alpha - 1.0) * g,
            y3 / rk - g,
            (y4 - ub) / rk + alpha * g,
            y5 / rk], axis=-1)

    y0 = jnp.array([[0.0, ub / 2.0, ub / 2.0, ub, 0.0]])
    return f, mass, y0


def test_amplifier_circuit():
    """The amplifier must amplify (|U5| swings well beyond the 0.4 V
    input) and radau/rodas must agree — cross-implementation consistency,
    the house oracle convention for problems without a scipy mass-matrix
    reference."""
    from janus_tpu.solve import solve_ivp

    f, mass, y0 = _amplifier()
    tf = 0.05
    grid = jnp.linspace(0.01, tf, 30)
    sr = solve_ivp(f, (0.0, tf), y0, method="radau", mass=mass,
                   t_eval=grid, options=Options(rtol=1e-7, atol=1e-10,
                                                h0=1e-6))
    assert int(sr.status[0]) == SUCCESS
    out = np.asarray(sr.ys[0, :, 4])
    assert np.nanmax(np.abs(out)) > 0.8          # gain > 2x the 0.4 V input

    so = solve_ivp(f, (0.0, tf), y0, method="rodas", mass=mass,
                   options=Options(rtol=1e-6, atol=1e-9, h0=1e-6))
    assert int(so.status[0]) == SUCCESS
    np.testing.assert_allclose(np.asarray(so.y[0]), np.asarray(sr.y[0]),
                               rtol=1e-3, atol=1e-5)


def test_nind_unsupported_methods_raise():
    """nind2/nind3 must be loud everywhere they are not honored."""
    import pytest
    from janus_tpu.solve.seulex import solve_seulex
    from janus_tpu.solve.rodas import solve_rodas

    y0 = jnp.zeros((1, 3))
    f = lambda t, y, a: -y                            # noqa: E731
    opts = Options(nind1=2, nind2=1)
    with pytest.raises(ValueError, match="nind"):
        solve_seulex(f, 0.0, 1.0, y0, options=opts)
    with pytest.raises(ValueError, match="nind"):
        solve_rodas(f, 0.0, 1.0, y0, options=opts)
