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


# -- Hairer II stiff test set -------------------------------------------------
# Published benchmark problems (Hairer & Wanner, "Solving ODEs II", 1996;
# also the Bari IVP test set). The coefficient values below are the
# published problem definitions, not code from any implementation.

HIRES_Y0 = (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0057)
HIRES_TF = 321.8122


def hires_rhs(t, y, args):
    """HIRES (High Irradiance RESponse, 8 species plant-physiology
    kinetics): the Hairer II 'chemistry' stiff benchmark."""
    y1, y2, y3, y4, y5, y6, y7, y8 = [y[..., i] for i in range(8)]
    r67 = 280.0 * y6 * y8
    return jnp.stack([
        -1.71 * y1 + 0.43 * y2 + 8.32 * y3 + 0.0007,
        1.71 * y1 - 8.75 * y2,
        -10.03 * y3 + 0.43 * y4 + 0.035 * y5,
        8.32 * y2 + 1.71 * y3 - 1.12 * y4,
        -1.745 * y5 + 0.43 * y6 + 0.43 * y7,
        -r67 + 0.69 * y4 + 1.71 * y5 - 0.43 * y6 + 0.69 * y7,
        r67 - 1.81 * y7,
        -r67 + 1.81 * y7,
    ], axis=-1)


OREGO_Y0 = (1.0, 2.0, 3.0)
OREGO_TF = 360.0


def orego_rhs(t, y, args):
    """Oregonator (Belousov-Zhabotinsky 3-species limit cycle): stiff with
    state magnitudes swinging over 5 decades along the orbit."""
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    return jnp.stack([
        77.27 * (y2 + y1 * (1.0 - 8.375e-6 * y1 - y2)),
        (y3 - (1.0 + y1) * y2) / 77.27,
        0.161 * (y1 - y3),
    ], axis=-1)


E5_Y0 = (1.76e-3, 0.0, 0.0, 0.0)
E5_TF = 1e3      # classic horizon is 1e13; 1e3 already exercises the cliff


def e5_rhs(t, y, args):
    """E5 chemical pyrolysis (Hairer II): extreme dynamic range — honest
    integrations need tiny atol (~1.7e-24 classically); used here on a
    shortened horizon as an error-weighting stress test."""
    y1, y2, y3, y4 = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    a, b, c, m_ = 7.89e-10, 1.1e7, 1.13e3, 1.0e6
    d1 = -a * y1 - b * y1 * y3
    d2 = a * y1 - m_ * c * y2 * y3
    d4 = b * y1 * y3 - c * y4
    d3 = d2 - d4
    return jnp.stack([d1, d2, d3, d4], axis=-1)


# -- 2-D method-of-lines problems ---------------------------------------------
# The reference's PDE-line workload is meinhart_pseudo_transient.cpp (a
# reaction-diffusion system solved with GMRES+ILU stage solves,
# odesolvers/linsolve.py:60-111). These are the 2-D equivalents for the
# matrix-free stage path: 5-point Laplacian stencils on an [ny, nx] grid,
# Dirichlet-0 boundaries, flattened row-major so each grid ROW is one
# line of length nx (Options(precond='lines', precond_block=nx)).

def laplacian_2d(u, nx, ny, dx):
    """5-point Dirichlet-0 Laplacian of u [M, ny*nx] -> [M, ny*nx]."""
    g = u.reshape(u.shape[0], ny, nx)
    left = jnp.pad(g[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    right = jnp.pad(g[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    up = jnp.pad(g[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    down = jnp.pad(g[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    lap = (left + right + up + down - 4.0 * g) / dx ** 2
    return lap.reshape(u.shape)


def heat_2d_rhs(nx, ny, dx):
    """u' = ν·Δu + r·u(1−u) (2-D Fisher-KPP), y [M, ny*nx], args (ν, r)."""
    def rhs(t, y, args):
        nu, r = args
        return nu * laplacian_2d(y, nx, ny, dx) + r * y * (1.0 - y)
    return rhs


def brusselator_2d_rhs(nx, ny, dx):
    """2-D Brusselator, SPECIES-MAJOR layout y = [u (ny·nx), v (ny·nx)]:

        u' = Du·Δu + a − (b+1)·u + u²v
        v' = Dv·Δv + b·u − u²v

    args (a, b, Du, Dv); a/b may carry a batch axis [M] or [M, 1].
    NOTE for Options(precond='lines', precond_block=nx): the cross-species
    coupling is diagonal at offset ±ny·nx — choose ny ODD so it lands in
    the opposite line-parity group of the 6-color probe (exact in-line
    bands); with even ny it merely pollutes the preconditioner slightly
    (GMRES still converges, one or two extra iterations).
    """
    def rhs(t, y, args):
        a, b, du_, dv_ = args
        n = nx * ny
        u, v = y[..., :n], y[..., n:]
        a = a[..., None] if jnp.ndim(a) == 1 else a
        b = b[..., None] if jnp.ndim(b) == 1 else b
        uu = u * u * v
        fu = du_ * laplacian_2d(u, nx, ny, dx) + a - (b + 1.0) * u + uu
        fv = dv_ * laplacian_2d(v, nx, ny, dx) + b * u - uu
        return jnp.concatenate([fu, fv], axis=-1)
    return rhs
