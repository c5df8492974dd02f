"""control.optimize: matrix-free Newton-CG (HVP curvature) unit tests.

Pure-function oracles (quadratics, Rosenbrock) so the optimizer's own logic
is tested apart from the solver; the ODE-in-the-loop pairing is
tests/test_hvp_example.py."""

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.control import newton_cg, cg_steihaug


def test_quadratic_one_step():
    """Exact CG on a pd quadratic converges in one Newton step."""
    a = jnp.array([[3.0, 0.5], [0.5, 1.0]])
    b = jnp.array([1.0, -2.0])

    def f(x):
        return 0.5 * x @ a @ x - b @ x

    vg = jax.value_and_grad(f)
    hvp = lambda x, v: a @ v                                 # noqa: E731
    res = newton_cg(vg, hvp, jnp.zeros(2), max_iter=3, cg_iters=2, tol=1e-12)
    assert res.converged and res.iters <= 2
    np.testing.assert_allclose(np.asarray(res.x),
                               np.asarray(jnp.linalg.solve(a, b)),
                               rtol=1e-10)


def test_rosenbrock_pytree():
    """Nonconvex start (negative curvature along the valley wall) over a
    pytree of parameters."""
    def f(p):
        x, y = p["x"], p["y"]
        return (1 - x) ** 2 + 100.0 * (y - x ** 2) ** 2

    vg = jax.jit(jax.value_and_grad(f))
    hvp = jax.jit(lambda p, v: jax.jvp(jax.grad(f), (p,), (v,))[1])
    x0 = {"x": jnp.asarray(-1.2), "y": jnp.asarray(1.0)}
    # exact CG (tight cg_rtol) = true Newton: 23 iterations; the default
    # truncated cg_rtol=0.1 crawls in the valley (~60+)
    res = newton_cg(vg, hvp, x0, max_iter=40, cg_iters=10, cg_rtol=1e-12,
                    tol=1e-10)
    assert res.converged
    np.testing.assert_allclose(float(res.x["x"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(res.x["y"]), 1.0, rtol=1e-6)


def test_cg_steihaug_negative_curvature_and_cap():
    """Indefinite H: first-direction negative curvature falls back to the
    (scaled) gradient direction; step_cap bounds the step norm."""
    h = jnp.diag(jnp.array([-2.0, 1.0]))
    g = jnp.array([1.0, 0.0])                 # -g aligned with the -2 mode
    d, n = cg_steihaug(lambda v: h @ v, g, max_iter=5, step_cap=0.3)
    assert n == 1
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 0.3, rtol=1e-12)
    assert float(d @ g) < 0                   # still a descent direction

    h2 = jnp.eye(2) * 1e-3                    # huge Newton step, capped
    g2 = jnp.array([1.0, 1.0])
    d2, _ = cg_steihaug(lambda v: h2 @ v, g2, max_iter=5, step_cap=0.5)
    assert float(jnp.linalg.norm(d2)) <= 0.5 + 1e-12


def test_zero_gradient_immediate():
    f = lambda x: jnp.sum(x ** 2)                            # noqa: E731
    res = newton_cg(jax.value_and_grad(f),
                    lambda x, v: 2.0 * v, jnp.zeros(3), tol=1e-12)
    assert res.converged and res.nhvp == 0
