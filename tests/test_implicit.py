"""Implicit-function-theorem reverse mode through the outer root solvers.

control.implicit_root is a jax.custom_vjp: forward = any root engine to
convergence, backward = one transposed linear solve at the root + one vjp
pull of the residual in the parameters. Oracles: analytic gradients, FD
re-solves, lu-vs-gmres backward agreement, and a Ψtc engine swap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.control import implicit_root, psitc


def test_cube_root_analytic_gradient():
    """x³ = θ per lane: d x*/dθ = 1/(3 θ^{2/3}) analytically."""
    theta = jnp.array([1.0, 8.0, 27.0])

    def loss(th):
        f = lambda x, a: x ** 3 - a[:, None]
        x = implicit_root(f, jnp.ones((3, 1)), th, tol=1e-12)
        return jnp.sum(x)

    g = jax.grad(loss)(theta)
    np.testing.assert_allclose(np.asarray(g),
                               1.0 / (3.0 * np.asarray(theta) ** (2.0 / 3)),
                               rtol=1e-8)


def test_multivariate_pytree_grads_match_fd():
    """2-D nonlinear system with a pytree of parameters (one int leaf for
    the float0 path); gradients vs central FD re-solves."""
    m = 2
    p0 = {"a": jnp.array([1.3, 0.7]), "b": jnp.array([0.4, 0.9])}

    def resid(x, p):
        u, v = x[:, 0], x[:, 1]
        return jnp.stack([u + p["a"] * jnp.tanh(v) - 1.0,
                          v ** p["n"] + p["b"] * u - 2.0], axis=-1)

    def loss(p):
        # the int leaf rides inside args (implicit_root must hand it a
        # float0 cotangent); jax.grad differentiates the float leaves only
        x = implicit_root(resid, jnp.ones((m, 2)),
                          {**p, "n": np.int32(2)}, tol=1e-12)
        return jnp.sum(x ** 2 * jnp.array([[1.0, 2.0]]))

    g = jax.grad(loss)(p0)
    eps = 1e-6
    for name in ("a", "b"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            pp = dict(p0); pm = dict(p0)
            pp[name] = p0[name] + e
            pm[name] = p0[name] - e
            fd = (loss(pp) - loss(pm)) / (2 * eps)
            np.testing.assert_allclose(float(g[name][i]), float(fd),
                                       rtol=2e-5, atol=1e-10,
                                       err_msg=f"d/d{name}[{i}]")


def test_gmres_backward_matches_lu():
    """Matrix-free transposed solve (Jᵀ·v by vjp pull) agrees with the
    dense-LU backward on a 16-D diffusion-like system."""
    n = 16
    key = jax.random.PRNGKey(0)
    theta = 1.0 + 0.1 * jax.random.uniform(key, (n,))

    def resid(x, th):
        # tridiagonal diffusion + cubic reaction, forced
        lap = -2.0 * x + jnp.roll(x, 1, -1) + jnp.roll(x, -1, -1)
        return 0.5 * lap - th[None, :] * x ** 3 + 1.0

    def loss(th, linear):
        x = implicit_root(resid, jnp.full((1, n), 0.5), th, tol=1e-12,
                          linear=linear, gmres_iters=n + 4)
        return jnp.sum(jnp.sin(x))

    g_lu = jax.grad(loss)(theta, "lu")
    g_gm = jax.grad(loss)(theta, "gmres")
    np.testing.assert_allclose(np.asarray(g_gm), np.asarray(g_lu),
                               rtol=1e-7, atol=1e-12)


def test_custom_solver_engine_psitc():
    """Swapping the forward engine (Ψtc) leaves the gradient unchanged —
    the backward pass only sees the root."""
    theta = jnp.array([2.0])

    def resid(x, a):
        return x ** 3 - a[:, None]

    def loss(th, solver):
        x = implicit_root(resid, jnp.ones((1, 1)), th, solver=solver)
        return jnp.sum(x)

    g_newton = jax.grad(loss)(theta, None)
    g_psitc = jax.grad(loss)(theta, lambda g, x0: psitc(g, x0, tol=1e-12))
    np.testing.assert_allclose(float(g_psitc[0]), float(g_newton[0]),
                               rtol=1e-7)


def test_nonconverged_lane_poisons_gradient():
    theta = jnp.array([1.0])

    def resid(x, a):
        return x ** 2 + a[:, None] + 1.0      # no real root

    def loss(th):
        x = implicit_root(resid, jnp.ones((1, 1)), th, tol=1e-12,
                          max_iter=5)
        return jnp.sum(x)

    g = jax.grad(loss)(theta)
    assert not bool(jnp.isfinite(g).all())


def test_x0_gets_zero_cotangent():
    theta = jnp.array([8.0])

    def loss(x0):
        x = implicit_root(lambda x, a: x ** 3 - a[:, None], x0, theta,
                          tol=1e-12)
        return jnp.sum(x)

    g = jax.grad(loss)(jnp.full((1, 1), 1.5))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_bilevel_ode_steady_state_vs_fd():
    """Bilevel with an ODE-derived residual: the steady state of the
    damped-forced oscillator family ẏ = A(θ)y + b, fit θ so the steady
    state hits a target; gradient vs FD."""
    m = 3
    k = jnp.array([1.0, 2.0, 3.0])

    def resid(x, kk):
        # steady state of q' = v, v' = -kk q - 0.4 v + 1
        q, v = x[:, 0], x[:, 1]
        return jnp.stack([v, -kk * q - 0.4 * v + 1.0], axis=-1)

    def loss(kk):
        x = implicit_root(resid, jnp.zeros((m, 2)), kk, tol=1e-13)
        return jnp.sum((x[:, 0] - 0.75) ** 2)

    g = jax.grad(loss)(k)
    # analytic: q* = 1/k ⇒ dL/dk = 2(q*−0.75)·(−1/k²)
    qs = 1.0 / np.asarray(k)
    np.testing.assert_allclose(np.asarray(g),
                               2 * (qs - 0.75) * (-qs ** 2), rtol=1e-6)


def test_bilevel_through_ode_shooting_vs_analytic():
    """Reverse mode through a shooting root whose residual contains a whole
    adaptive ODE solve: the residual uses radau_adjoint (vjp-able), the
    forward Newton uses FD Jacobians (custom_vjp blocks jvp), and the
    backward pass pulls Jᵀ·v through the continuous adjoint. Oracle: the
    harmonic BVP's closed form."""
    from janus_tpu.solve import Options
    from janus_tpu.solve.adjoint import radau_adjoint

    m = 2
    ks = jnp.array([1.0, 2.5])
    q0, qT, T = 1.0, 0.3, 1.0
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=256)

    def rhs(t, y, k):
        return jnp.stack([y[:, 1], -k * y[:, 0]], axis=-1)

    def resid(v0, k):
        y0 = jnp.concatenate([jnp.full((v0.shape[0], 1), q0), v0], axis=-1)
        yT = radau_adjoint(rhs, (0.0, T), y0, args=k, options=opts)
        return yT[:, :1] - qT

    def loss(k, linear):
        v0 = implicit_root(resid, jnp.zeros((m, 1)), k, linear=linear,
                           gmres_iters=4, jac_mode="fd", tol=1e-10)
        return jnp.sum(v0[:, 0] ** 2)

    # closed form: v0*(k) = (qT − q0 cos ωT)·ω / sin ωT, ω = √k
    def v0_star(k):
        w = np.sqrt(k)
        return (qT - q0 * np.cos(w * T)) * w / np.sin(w * T)

    kn = np.asarray(ks, np.float64)
    eps = 1e-7
    dv0 = (v0_star(kn + eps) - v0_star(kn - eps)) / (2 * eps)
    expected = 2.0 * v0_star(kn) * dv0

    for linear in ("gmres", "lu"):
        g = jax.grad(loss)(ks, linear)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6,
                                   err_msg=f"linear={linear}")
