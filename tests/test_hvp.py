"""Second-order sensitivities: radau_hvp (forward-over-adjoint HVPs).

Oracles: central differences OF THE first-order adjoint gradient (the object
radau_hvp differentiates), an analytic linear-flow Hessian, and the
⟨∇L, v⟩ = gdotv first-order consistency identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.hvp import radau_hvp

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    # same custom-vjp executable-accumulation workaround as test_adjoint.py
    yield
    jax.clear_caches()


def _adj_grad(loss, f, tspan, y0, mus, opts):
    def L(z, mm):
        return loss(radau_adjoint(f, tspan, z, args=mm, options=opts), mm)
    return jax.grad(L, argnums=(0, 1))(y0, mus)


def test_hvp_linear_flow_analytic():
    """y' = a·y ⇒ y(T) = y0·e^{aT}; L = Σ y(T)² has a closed-form Hessian."""
    a = jnp.array([0.4, -0.7])
    y0 = jnp.array([[1.3], [0.8]])
    T = 1.5
    opts = Options(rtol=1e-11, atol=1e-13, adjoint_steps=256)
    v_y0 = jnp.array([[0.3], [-1.1]])
    v_a = jnp.array([0.7, 0.2])

    def f(t, y, aa):
        return aa[:, None] * y

    (h_y0, h_a), gdotv = radau_hvp(
        f, (0.0, T), y0, a, loss=lambda yT, aa: jnp.sum(yT ** 2),
        v_y0=v_y0, v_args=v_a, options=opts)
    e = jnp.exp(a * T)
    y0v = y0[:, 0]
    # ∇_{y0}L = 2 y0 e^{2aT}; ∇_a L = 2 T y0² e^{2aT}
    h_y0_exact = 2 * e**2 * v_y0[:, 0] + 4 * T * y0v * e**2 * v_a
    h_a_exact = 4 * T * y0v * e**2 * v_y0[:, 0] \
        + 4 * T**2 * y0v**2 * e**2 * v_a
    g_exact = (2 * y0v * e**2 * v_y0[:, 0]
               + 2 * T * y0v**2 * e**2 * v_a).sum()
    np.testing.assert_allclose(np.asarray(h_y0[:, 0]), np.asarray(h_y0_exact),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_a_exact),
                               rtol=1e-8)
    np.testing.assert_allclose(float(gdotv), float(g_exact), rtol=1e-8)


def test_hvp_matches_fd_of_adjoint_gradient_stiff_vdp():
    """H·v vs central differences of the adjoint gradient along v, on a
    stiff VdP batch with mixed (y0, θ) direction."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mus = jnp.array([30.0, 80.0])
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=1536)
    v_y0 = jnp.array([[0.5, -0.3], [0.2, 0.9]])
    v_mu = jnp.array([1.0, -0.4])

    def loss(yT, mm):
        return jnp.sum(yT ** 2) + 1e-3 * jnp.sum(mm * yT[:, 0])

    (h_y0, h_mu), gdotv = radau_hvp(
        vdp_rhs, (0.0, 1.0), y0, mus, loss=loss, v_y0=v_y0, v_args=v_mu,
        options=opts)
    # eps can't be small here: the FD numerator carries the O(rtol) mesh
    # error of two INDEPENDENTLY-meshed gradients (measured: FD converges
    # TOWARD the HVP as eps grows 1e-5 → 1e-3)
    eps = 1e-3
    gp = _adj_grad(loss, vdp_rhs, (0.0, 1.0), y0 + eps * v_y0,
                   mus + eps * v_mu, opts)
    gm = _adj_grad(loss, vdp_rhs, (0.0, 1.0), y0 - eps * v_y0,
                   mus - eps * v_mu, opts)
    fd_y0 = (gp[0] - gm[0]) / (2 * eps)
    fd_mu = (gp[1] - gm[1]) / (2 * eps)
    np.testing.assert_allclose(np.asarray(h_y0), np.asarray(fd_y0),
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(h_mu), np.asarray(fd_mu),
                               rtol=5e-3, atol=1e-8)
    # first-order consistency: gdotv = ⟨∇L, v⟩ of the plain adjoint gradient
    g = _adj_grad(loss, vdp_rhs, (0.0, 1.0), y0, mus, opts)
    gv = float(jnp.sum(g[0] * v_y0) + jnp.sum(g[1] * v_mu))
    np.testing.assert_allclose(float(gdotv), gv, rtol=1e-6)


def test_hvp_integral_cost_and_mass():
    """Lagrange-term objective loss(yT, q, θ) with a mass matrix: H·v vs FD
    of the adjoint gradient."""
    mass = jnp.array([[2.0, 0.3], [0.1, 1.5]])
    y0 = jnp.array([[1.0, 0.0], [0.5, 0.3]])
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=1536)
    v_y0 = jnp.array([[0.2, -0.1], [0.4, 0.3]])
    v_k = jnp.array(0.6)

    def fm(t, y, a):
        return jnp.stack([y[:, 1], -a * y[:, 0] - 0.2 * y[:, 1]], axis=-1)

    def cost(t, y, a):
        return a * y[:, 0] ** 2

    def loss(yT, q, a):
        return jnp.sum(q) + 0.3 * jnp.sum(yT ** 2)

    def adj_grad(z, k):
        def L(zz, kk):
            y, q = radau_adjoint(fm, (0.0, 3.0), zz, args=kk, options=opts,
                                 mass=mass, cost=cost)
            return loss(y, q, kk)
        return jax.grad(L, argnums=(0, 1))(z, k)

    (h_y0, h_k), gdotv = radau_hvp(
        fm, (0.0, 3.0), y0, jnp.array(1.7), loss=loss, v_y0=v_y0,
        v_args=v_k, options=opts, mass=mass, cost=cost)
    eps = 1e-5
    gp = adj_grad(y0 + eps * v_y0, jnp.array(1.7) + eps * v_k)
    gm = adj_grad(y0 - eps * v_y0, jnp.array(1.7) - eps * v_k)
    np.testing.assert_allclose(np.asarray(h_y0),
                               np.asarray((gp[0] - gm[0]) / (2 * eps)),
                               rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(float(h_k),
                               float((gp[1] - gm[1]) / (2 * eps)), rtol=5e-4)
    g = adj_grad(y0, jnp.array(1.7))
    gv = float(jnp.sum(g[0] * v_y0) + g[1] * v_k)
    np.testing.assert_allclose(float(gdotv), gv, rtol=1e-6)


def test_hvp_pytree_args_and_zero_direction():
    """Dict args with an int (non-diff) leaf; v_args=None differentiates in
    the pure-y0 direction; float0 zeros come back on the int slot."""
    y0 = jnp.array([[2.0, 0.0]])
    args = {"mu": jnp.array([20.0]), "n": jnp.array([3])}

    def f(t, y, a):
        return vdp_rhs(t, y, a["mu"])

    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=1536)
    v_y0 = jnp.array([[1.0, -0.5]])
    (h_y0, h_args), _ = radau_hvp(
        f, (0.0, 1.0), y0, args, loss=lambda yT, a: jnp.sum(yT ** 2),
        v_y0=v_y0, options=opts)
    assert h_args["n"].dtype == jax.dtypes.float0
    assert h_args["mu"].shape == (1,)

    def L(z, mm):
        return jnp.sum(radau_adjoint(vdp_rhs, (0.0, 1.0), z, args=mm,
                                     options=opts) ** 2)

    eps = 1e-3        # FD of independently-meshed gradients; see the VdP test
    gp = jax.grad(L, argnums=(0, 1))(y0 + eps * v_y0, args["mu"])
    gm = jax.grad(L, argnums=(0, 1))(y0 - eps * v_y0, args["mu"])
    np.testing.assert_allclose(np.asarray(h_y0),
                               np.asarray((gp[0] - gm[0]) / (2 * eps)),
                               rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(h_args["mu"]),
                               np.asarray((gp[1] - gm[1]) / (2 * eps)),
                               rtol=5e-3, atol=1e-8)


def test_hvp_vmap_full_hessian():
    """jax.vmap over the direction gives full Hessians: exact on the linear
    flow (diagonal in the per-lane parameters). Size adjoint_steps for the
    WORST direction — a 256 budget poisons the slow lane at rtol 1e-11."""
    a = jnp.array([0.4, -0.7])
    y0 = jnp.array([[1.3], [0.8]])
    T = 1.5
    opts = Options(rtol=1e-11, atol=1e-13, adjoint_steps=512)

    def f(t, y, aa):
        return aa[:, None] * y

    def hvp_a(v_a):
        (_, h_a), _ = radau_hvp(f, (0.0, T), y0, a,
                                loss=lambda yT, aa: jnp.sum(yT ** 2),
                                v_args=v_a, options=opts)
        return h_a

    H = jax.vmap(hvp_a)(jnp.eye(2))
    e = jnp.exp(a * T)
    exact = jnp.diag(4 * T ** 2 * y0[:, 0] ** 2 * e ** 2)
    np.testing.assert_allclose(np.asarray(H), np.asarray(exact),
                               rtol=1e-8, atol=1e-12)


def test_hvp_v_args_none_leaves_and_guards():
    """None leaves in v_args are a zero direction (tree_flatten used to DROP
    them — ValueError or silently shifted directions); singular mass raises."""
    y0 = jnp.array([[1.0, 0.1]])
    args = {"c": jnp.asarray(0.5), "k": jnp.asarray(1.0)}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)

    def f(t, y, a):
        return jnp.stack([y[:, 1],
                          -a["k"] * y[:, 0] - a["c"] * y[:, 1]], axis=-1)

    lss = lambda yT, a: jnp.sum(yT ** 2)                     # noqa: E731
    (_, h_none), _ = radau_hvp(f, (0.0, 2.0), y0, args, loss=lss,
                               v_args={"c": None, "k": jnp.asarray(1.0)},
                               options=opts)
    (_, h_zero), _ = radau_hvp(f, (0.0, 2.0), y0, args, loss=lss,
                               v_args={"c": jnp.asarray(0.0),
                                       "k": jnp.asarray(1.0)},
                               options=opts)
    np.testing.assert_array_equal(np.asarray(h_none["c"]),
                                  np.asarray(h_zero["c"]))
    np.testing.assert_array_equal(np.asarray(h_none["k"]),
                                  np.asarray(h_zero["k"]))

    with pytest.raises(ValueError, match="singular"):
        radau_hvp(f, (0.0, 1.0), jnp.zeros((1, 2)), args, loss=lss,
                  mass=jnp.diag(jnp.array([1.0, 0.0])), options=opts)
