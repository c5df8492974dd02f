"""Canonical test problems.

Van der Pol is THE reference workload (stiff μ up to 1e4: reference
examples/cpp/radauted_hamiltonian_example.cpp:84-104, tests/cpp/
ode_solver_test.cpp:620-763). The harmonic oscillator is the smoke problem.
All RHS are batched: f(t[M], y[M,D], args) -> [M,D].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# -- harmonic oscillator ------------------------------------------------------

def harmonic_hamiltonian(x, p, args):
    """H = (p² + ω²x²)/2 per sample; x,p shape [1]."""
    omega = args["omega"] if isinstance(args, dict) else args
    return 0.5 * (jnp.sum(p * p) + omega ** 2 * jnp.sum(x * x))


def harmonic_rhs(t, y, args):
    """y = [q, v]: q' = v, v' = -ω² q (batched [M,2])."""
    omega = args["omega"] if isinstance(args, dict) else args
    q, v = y[..., 0], y[..., 1]
    return jnp.stack([v, -(omega ** 2) * q], axis=-1)


# -- Van der Pol --------------------------------------------------------------

def vdp_rhs(t, y, args):
    """Stiff Van der Pol: y0' = y1, y1' = μ((1−y0²)y1) − y0. args: μ [M] or scalar."""
    mu = args["mu"] if isinstance(args, dict) else args
    mu = jnp.broadcast_to(jnp.asarray(mu, y.dtype), y.shape[:-1])
    x, v = y[..., 0], y[..., 1]
    return jnp.stack([v, mu * (1.0 - x * x) * v - x], axis=-1)


def vdp_jac(t, y, args):
    """Analytic Jacobian [M,2,2] of vdp_rhs."""
    mu = args["mu"] if isinstance(args, dict) else args
    mu = jnp.broadcast_to(jnp.asarray(mu, y.dtype), y.shape[:-1])
    x, v = y[..., 0], y[..., 1]
    z = jnp.zeros_like(x)
    row0 = jnp.stack([z, jnp.ones_like(x)], axis=-1)
    row1 = jnp.stack([-2.0 * mu * x * v - 1.0, mu * (1.0 - x * x)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def vdp_hamiltonian(x, p, args):
    """PMP-style Hamiltonian whose dynamics reproduce the augmented VdP system
    of the reference examples (costates ride along): H = p·f(x) with the
    reference's sign convention baked in (SURVEY §3.3).

    x: [2] state, p: [2] costate; args: {'mu': μ}.
    """
    mu = args["mu"] if isinstance(args, dict) else args
    f0 = x[1]
    f1 = mu * (1.0 - x[0] ** 2) * x[1] - x[0]
    return p[0] * f0 + p[1] * f1


# -- Dubins car (the reference's second PMP family: dubins_pmp_*.py) ---------

def dubins_rhs(t, y, args):
    """Dubins car [x, y, θ] with turn-rate control u(t,·) from args:
    args = {'v': speed, 'u': callable u(t) or scalar}. Batched."""
    v = args.get("v", 1.0) if isinstance(args, dict) else 1.0
    u = args["u"] if isinstance(args, dict) else args
    uval = u(t) if callable(u) else u
    th = y[..., 2]
    return jnp.stack([v * jnp.cos(th), v * jnp.sin(th),
                      jnp.broadcast_to(jnp.asarray(uval, y.dtype), th.shape)],
                     axis=-1)


def robertson_rhs(t, y, args):
    """Robertson chemical kinetics — the canonical extreme-stiffness test.
    y = [y1, y2, y3], rates (a, b, c) from args or the classic defaults."""
    if isinstance(args, dict):
        a, b, c = args.get("a", 0.04), args.get("b", 1e4), args.get("c", 3e7)
    else:
        a, b, c = 0.04, 1e4, 3e7
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    d1 = -a * y1 + b * y2 * y3
    d3 = c * y2 * y2
    return jnp.stack([d1, -d1 - d3, d3], axis=-1)


def brusselator_rhs(t, y, args):
    """Brusselator oscillator: x' = a + x²y − (b+1)x, y' = bx − x²y."""
    a = args.get("a", 1.0) if isinstance(args, dict) else 1.0
    b = args.get("b", 3.0) if isinstance(args, dict) else jnp.asarray(args)
    x, z = y[..., 0], y[..., 1]
    return jnp.stack([a + x * x * z - (b + 1.0) * x, b * x - x * x * z],
                     axis=-1)


def pleiades_rhs(t, y, args):
    """Pleiades 7-body problem (Hairer's non-stiff test set): y = [q(14), v(14)]."""
    q, v = y[..., :14], y[..., 14:]
    x = q[..., :7]
    z = q[..., 7:]
    masses = jnp.arange(1.0, 8.0, dtype=y.dtype)
    dx = x[..., :, None] - x[..., None, :]
    dz = z[..., :, None] - z[..., None, :]
    r2 = dx * dx + dz * dz + jnp.eye(7, dtype=y.dtype)
    r32 = r2 ** 1.5
    ax = jnp.sum(masses[None, None, :] * dx / r32, axis=-1) * -1.0
    az = jnp.sum(masses[None, None, :] * dz / r32, axis=-1) * -1.0
    return jnp.concatenate([v, ax, az], axis=-1)


def dubins_pmp_rhs(t, y, args):
    """Smoothed min-time Dubins PMP system, y = [x, y, θ, p1, p2, p3]:
    u* = −umax·tanh(p3/ε) (bang-bang as ε → 0 — the reference reaches the
    bang-bang limit by homotopy, dubins_pmp_homotopy.py)."""
    v = args.get("v", 1.0)
    umax = args.get("umax", 1.0)
    eps = args.get("eps", 0.1)
    th, p1, p2, p3 = y[..., 2], y[..., 3], y[..., 4], y[..., 5]
    u = -umax * jnp.tanh(p3 / eps)
    return jnp.stack([
        v * jnp.cos(th), v * jnp.sin(th), u,
        jnp.zeros_like(th), jnp.zeros_like(th),
        p1 * v * jnp.sin(th) - p2 * v * jnp.cos(th),
    ], axis=-1)
