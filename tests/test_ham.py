"""Hamiltonian calculus tests: FD oracles + explicit-vs-derived consistency.

The reference's two core patterns (tests/cpp/ode_solver_test.cpp):
- pxH/ppH vs central finite differences (:46-94);
- explicit hand-coded dynamics vs H-derived dynamics, real AND dual parts
  (DynsExplVsImplTest :372-431).
"""

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu import ham
from janus_tpu.models.problems import vdp_hamiltonian, vdp_rhs


def _h(x, p, args):
    # smooth nonlinear H mixing x and p
    return jnp.sum(p * p) * 0.5 + jnp.sum(jnp.cos(x) * p) + jnp.sum(x ** 4) / 4


def test_grads_vs_fd(rng):
    gx = ham.grad_x(_h)
    gp = ham.grad_p(_h)
    x = jnp.asarray(rng.standard_normal(3))
    p = jnp.asarray(rng.standard_normal(3))
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fdx = (_h(x + e, p, None) - _h(x - e, p, None)) / (2 * eps)
        fdp = (_h(x, p + e, None) - _h(x, p - e, None)) / (2 * eps)
        np.testing.assert_allclose(gx(x, p, None)[i], fdx, rtol=1e-6)
        np.testing.assert_allclose(gp(x, p, None)[i], fdp, rtol=1e-6)


def test_hessians_symmetry(rng):
    x = jnp.asarray(rng.standard_normal(3))
    p = jnp.asarray(rng.standard_normal(3))
    hxx = ham.hessian_xx(_h)(x, p, None)
    hpp = ham.hessian_pp(_h)(x, p, None)
    np.testing.assert_allclose(hxx, hxx.T, atol=1e-12)
    np.testing.assert_allclose(hpp, jnp.eye(3), atol=1e-12)  # H quadratic in p... plus cos coupling
    # ∂²H/∂p∂x == (∂²H/∂x∂p)ᵀ
    hxp = ham.hessian_xp(_h)(x, p, None)
    hpx = jax.jacfwd(lambda xx: ham.grad_p(_h)(xx, p, None))(x)
    np.testing.assert_allclose(hxp, hpx.T, atol=1e-12)


def test_dynamics_sign_convention(rng):
    """ṗ = +∂H/∂x, ẋ = +∂H/∂p exactly (reference janus_ode_common.hpp:2106-2110)."""
    f = ham.hamiltonian_dynamics(_h, batched=False)
    p = jnp.asarray(rng.standard_normal(3))
    x = jnp.asarray(rng.standard_normal(3))
    y = jnp.concatenate([p, x])
    dy = f(0.0, y, None)
    np.testing.assert_allclose(dy[:3], ham.grad_x(_h)(x, p, None), rtol=1e-12)
    np.testing.assert_allclose(dy[3:], ham.grad_p(_h)(x, p, None), rtol=1e-12)


def test_vdp_explicit_vs_hamiltonian(rng):
    """The PMP VdP Hamiltonian's ẋ part must equal the explicit VdP RHS
    (cross-implementation consistency, reference DynsExplVsImplTest pattern)."""
    mu = 3.0
    f = ham.hamiltonian_dynamics(vdp_hamiltonian, batched=True)
    m = 5
    x = jnp.asarray(rng.standard_normal((m, 2)))
    p = jnp.asarray(rng.standard_normal((m, 2)))
    y = jnp.concatenate([p, x], axis=-1)
    dy = f(jnp.zeros(m), y, {"mu": mu})
    expl = vdp_rhs(0.0, x, {"mu": mu})
    np.testing.assert_allclose(dy[:, 2:], expl, rtol=1e-12)


def test_jacobian_vs_fd(rng):
    jfn = ham.hamiltonian_jacobian(_h, batched=False)
    ffn = ham.hamiltonian_dynamics(_h, batched=False)
    y = jnp.asarray(rng.standard_normal(6))
    jac = jfn(0.0, y, None)
    eps = 1e-6
    for i in range(6):
        e = jnp.zeros(6).at[i].set(eps)
        fd = (ffn(0.0, y + e, None) - ffn(0.0, y - e, None)) / (2 * eps)
        np.testing.assert_allclose(jac[:, i], fd, rtol=2e-5, atol=1e-7)


def test_control_hook(rng):
    """u*(x,p) folded into H (reference ode_solver_test.cpp:17-37 pattern)."""
    def h_u(x, p, u, args):
        return jnp.sum(p * u) - 0.5 * jnp.sum(u * u) + jnp.sum(x * p)

    def ustar(x, p, args):
        return p  # maximizer of p·u − u²/2

    f = ham.hamiltonian_dynamics(h_u, u=ustar, batched=False)
    x = jnp.asarray(rng.standard_normal(2))
    p = jnp.asarray(rng.standard_normal(2))
    dy = f(0.0, jnp.concatenate([p, x]), None)
    # With u*=p: H = |p|²/2 + x·p ⇒ ∂H/∂x = p, ∂H/∂p = p + x (envelope thm:
    # ∂H/∂u = 0 at u*)
    np.testing.assert_allclose(dy[:2], p, rtol=1e-12)
    np.testing.assert_allclose(dy[2:], p + x, rtol=1e-12)


def test_batched_matches_single(rng):
    fb = ham.hamiltonian_dynamics(_h, batched=True)
    fs = ham.hamiltonian_dynamics(_h, batched=False)
    y = jnp.asarray(rng.standard_normal((4, 6)))
    out = fb(jnp.zeros(4), y, None)
    for i in range(4):
        np.testing.assert_allclose(out[i], fs(0.0, y[i], None), rtol=1e-12)


def test_safe_dynamics_masks_singularities(rng):
    """safe_jac role: a Hamiltonian with a pole must not emit NaNs
    (reference janus_ode_common.hpp:116-134)."""
    def h_sing(x, p, args):
        return jnp.sum(p * p) / (2.0 * x[0])   # pole at x0 = 0

    f = ham.safe_dynamics(h_sing, batched=True)
    p = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    x = jnp.array([[0.0, 1.0], [2.0, 1.0]])    # lane 0 sits ON the pole
    y = jnp.concatenate([p, x], axis=-1)
    dy = f(jnp.zeros(2), y, None)
    assert bool(jnp.all(jnp.isfinite(dy)))
    # the regular lane is untouched
    fr = ham.hamiltonian_dynamics(h_sing, batched=True)(jnp.zeros(2), y, None)
    np.testing.assert_allclose(dy[1], fr[1], rtol=1e-12)
