"""Dynamics [ṗ, ẋ] and Jacobians from a user Hamiltonian H(x, p[, u], args).

Conventions (matched to the reference so its problems port unchanged):
- state vector ``y = [p, x]`` with the costate FIRST
  (reference src/cpp/janus_ode_common.hpp:2080-2081);
- dynamics are ``ṗ = +∂H/∂x, ẋ = +∂H/∂p`` exactly as coded at
  reference src/cpp/janus_ode_common.hpp:2106-2110 — the reference's examples bake
  any PMP sign flips into H itself, and so do ours (see tests vs explicit costate
  ODEs, the pattern of reference examples/python/aug_vdp_ref_test.py).

The user H is a per-sample scalar ``H(x, p, args) -> ()`` for x, p of shape [D].
An optimal-control hook ``u(x, p, args)`` may be folded in, mirroring the
reference's u*(x, p) closure pattern (tests/cpp/ode_solver_test.cpp:17-37).
All derivatives are per-sample and vmapped over the leading batch axis.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def split_px(y):
    """y = [p, x] → (p, x). D must be even over the last axis."""
    dim = y.shape[-1] // 2
    return y[..., :dim], y[..., dim:]


def join_px(p, x):
    return jnp.concatenate([p, x], axis=-1)


def _fold_control(ham: Callable, u: Optional[Callable]) -> Callable:
    if u is None:
        return ham

    def hc(x, p, args):
        return ham(x, p, u(x, p, args), args)

    return hc


def hamiltonian_dynamics(ham: Callable, u: Optional[Callable] = None,
                         batched: bool = True) -> Callable:
    """Build ``f(t, y, args) -> [ṗ, ẋ]`` from a scalar Hamiltonian.

    ham: H(x, p, args) -> scalar  (or H(x, p, u, args) when ``u`` is given).
    Returns a dynamics function with the solver signature ``f(t, y, args)``;
    with ``batched=True`` it accepts y of shape [M, 2D] (t: scalar or [M]).
    """
    hc = _fold_control(ham, u)

    def single(t, y, args):
        p, x = split_px(y)
        gx = jax.grad(lambda xx: hc(xx, p, args))(x)
        gp = jax.grad(lambda pp: hc(x, pp, args))(p)
        return join_px(gx, gp)  # ṗ = +∂H/∂x, ẋ = +∂H/∂p

    if not batched:
        return single

    def batched_f(t, y, args):
        tb = jnp.broadcast_to(jnp.asarray(t), y.shape[:-1])
        return jax.vmap(single, in_axes=(0, 0, None))(tb, y, args)

    return batched_f


def hamiltonian_jacobian(ham: Callable, u: Optional[Callable] = None,
                         batched: bool = True) -> Callable:
    """Build ``J(t, y, args) -> ∂f/∂y`` ([2D, 2D] per sample) by forward-over-
    reverse AD — replacing the reference's hand-assembled third-partial
    contractions (evalJacDual, src/cpp/janus_ode_common.hpp:2303-2356)."""
    single = hamiltonian_dynamics(ham, u, batched=False)

    def jac_single(t, y, args):
        return jax.jacfwd(lambda yy: single(t, yy, args))(y)

    if not batched:
        return jac_single

    def batched_j(t, y, args):
        tb = jnp.broadcast_to(jnp.asarray(t), y.shape[:-1])
        return jax.vmap(jac_single, in_axes=(0, 0, None))(tb, y, args)

    return batched_j


# -- individual partials (parity with reference pxH/ppH/…; per-sample) -------

def grad_x(ham, u=None):
    hc = _fold_control(ham, u)
    return lambda x, p, args: jax.grad(lambda xx: hc(xx, p, args))(x)


def grad_p(ham, u=None):
    hc = _fold_control(ham, u)
    return lambda x, p, args: jax.grad(lambda pp: hc(x, pp, args))(p)


def hessian_xx(ham, u=None):
    gx = grad_x(ham, u)
    return lambda x, p, args: jax.jacfwd(lambda xx: gx(xx, p, args))(x)


def hessian_pp(ham, u=None):
    gp = grad_p(ham, u)
    return lambda x, p, args: jax.jacfwd(lambda pp: gp(x, pp, args))(p)


def hessian_xp(ham, u=None):
    gx = grad_x(ham, u)
    return lambda x, p, args: jax.jacfwd(lambda pp: gx(x, pp, args))(p)


# -- explicit-control variants (the reference's Hu twins: pxHu/ppHu/puHu and
#    evalDynsU/evalDynsUDual/evalJacDualU, janus_ode_common.hpp:178-2074,
#    2117-2189, 2260, 2359). H takes u EXPLICITLY: H(x, p, u, args) -> (). --

def grad_u(ham):
    """∂H/∂u for an explicit-control Hamiltonian (per-sample; u: [K])."""
    return lambda x, p, u, args: jax.grad(
        lambda uu: ham(x, p, uu, args))(u)


def hessian_uu(ham):
    gu = grad_u(ham)
    return lambda x, p, u, args: jax.jacfwd(
        lambda uu: gu(x, p, uu, args))(u)


def hessian_ux(ham):
    """∂²H/∂u∂x (rows: u components, cols: x components)."""
    gu = grad_u(ham)
    return lambda x, p, u, args: jax.jacfwd(
        lambda xx: gu(xx, p, u, args))(x)


def hessian_up(ham):
    gu = grad_u(ham)
    return lambda x, p, u, args: jax.jacfwd(
        lambda pp: gu(x, pp, u, args))(p)


def hamiltonian_dynamics_u(ham: Callable, batched: bool = True) -> Callable:
    """``f(t, y, u, args)`` with an explicit control input (evalDynsU role),
    in the repo's baked-sign convention (ṗ = +∂H/∂x, ẋ = +∂H/∂p)."""

    def single(t, y, u, args):
        p, x = split_px(y)
        gx = jax.grad(lambda xx: ham(xx, p, u, args))(x)
        gp = jax.grad(lambda pp: ham(x, pp, u, args))(p)
        return join_px(gx, gp)

    if not batched:
        return single

    def batched_f(t, y, u, args):
        tb = jnp.broadcast_to(jnp.asarray(t), y.shape[:-1])
        return jax.vmap(single, in_axes=(0, 0, 0, None))(tb, y, u, args)

    return batched_f


def pmp_dynamics_u(ham: Callable, batched: bool = True) -> Callable:
    """``f(t, y, u, args)`` with the STANDARD PMP signs: ẋ = +∂H/∂p,
    ṗ = −∂H/∂x, for H = L(x, u) + p·f(x, u) written directly (no sign
    baking — coupled p·f(x) terms make baking impossible in one scalar).
    State layout stays y = [p, x]."""

    def single(t, y, u, args):
        p, x = split_px(y)
        gx = jax.grad(lambda xx: ham(xx, p, u, args))(x)
        gp = jax.grad(lambda pp: ham(x, pp, u, args))(p)
        return join_px(-gx, gp)

    if not batched:
        return single

    def batched_f(t, y, u, args):
        tb = jnp.broadcast_to(jnp.asarray(t), y.shape[:-1])
        return jax.vmap(single, in_axes=(0, 0, 0, None))(tb, y, u, args)

    return batched_f


def stationarity_residual(ham: Callable, batched: bool = True) -> Callable:
    """PMP interior-arc stationarity residual ``r(x, p, u, args) = ∂H/∂u``
    (zero along an optimal interior arc). Stack it over trajectory nodes to
    close a direct/indirect transcription system — the capability the
    reference exposes through its Hu partial zoo (pxHu/ppHu/puHu twins) and
    u2d_pmp_solver.hpp."""
    gu = grad_u(ham)
    if not batched:
        return gu

    def batched_r(x, p, u, args):
        return jax.vmap(gu, in_axes=(0, 0, 0, None))(x, p, u, args)

    return batched_r


def safe_dynamics(ham: Callable, u: Optional[Callable] = None,
                  batched: bool = True, fill: float = 0.0) -> Callable:
    """Dynamics with non-finite entries replaced by ``fill`` — the
    reference's safe_jac zero-fallback for Hamiltonians with singular points
    (janus_ode_common.hpp:116-134, safe_gradients_example.cpp). Keeps a
    single bad trajectory from poisoning the batch with NaNs (the lockstep
    driver then rejects/min-steps that lane instead of crashing)."""
    f = hamiltonian_dynamics(ham, u, batched)

    def safe(t, y, args):
        dy = f(t, y, args)
        return jnp.where(jnp.isfinite(dy), dy, fill)

    return safe
