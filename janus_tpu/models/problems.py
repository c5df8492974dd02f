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
