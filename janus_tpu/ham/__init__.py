"""Hamiltonian calculus: dynamics and Jacobians derived from a scalar H.

Replaces the reference's ~2400-line derivative zoo (src/cpp/janus_ode_common.hpp:
178-2410 — pxH/ppH, all 2nd/3rd partials, evalDyns[U][Dual], evalJac[U][Dual])
with a handful of grad/jacfwd compositions. Forward sensitivities come from
``jax.jvp`` over these functions (or Jet lifting), not hand-contracted einsums.
"""

from janus_tpu.ham.core import (
    hamiltonian_dynamics,
    hamiltonian_jacobian,
    safe_dynamics,
    grad_x,
    grad_p,
    hessian_xx,
    hessian_pp,
    hessian_xp,
    grad_u,
    hessian_uu,
    hessian_ux,
    hessian_up,
    hamiltonian_dynamics_u,
    pmp_dynamics_u,
    stationarity_residual,
    split_px,
    join_px,
)

__all__ = [
    "hamiltonian_dynamics",
    "hamiltonian_jacobian",
    "safe_dynamics",
    "grad_x",
    "grad_p",
    "hessian_xx",
    "hessian_pp",
    "hessian_xp",
    "split_px",
    "join_px",
]
