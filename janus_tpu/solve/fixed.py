"""Fixed-grid integrators under lax.scan — the reverse-differentiable path.

The adaptive lockstep solvers use ``lax.while_loop`` (forward-mode / jvp
differentiable only). Training neural-network Hamiltonians THROUGH the solver
(the reference's L4 workload, examples/python/sssc_dnn_vdp_model.py) needs
reverse mode, so this module provides fixed-step RK methods over ``lax.scan``
with optional rematerialization — gradients flow by checkpointed backprop
through the whole trajectory. Per-step parameter slabs (piecewise-constant
controls; reference seulexted.py:17-27 ``nparams_step``, dopri853ted.hpp
``theta`` :224-229) are supported via ``step_args``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def _rk4_step(f, t, y, h, args):
    k1 = f(t, y, args)
    k2 = f(t + 0.5 * h, y + 0.5 * h[..., None] * k1, args)
    k3 = f(t + 0.5 * h, y + 0.5 * h[..., None] * k2, args)
    k4 = f(t + h, y + h[..., None] * k3, args)
    return y + (h[..., None] / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def _midpoint_step(f, t, y, h, args):
    k1 = f(t, y, args)
    return y + h[..., None] * f(t + 0.5 * h, y + 0.5 * h[..., None] * k1, args)


_STEPPERS = {"rk4": _rk4_step, "midpoint": _midpoint_step}


def odeint_fixed(f: Callable, t0, tf, y0, n_steps: int, args: Any = None,
                 method: str = "rk4", step_args: Optional[Any] = None,
                 remat: bool = True, save_trajectory: bool = False):
    """Integrate on a fixed grid of ``n_steps`` steps; reverse-differentiable.

    f         : batched RHS ``f(t[M], y[M,D], args)``
    t0, tf    : scalars or [M]
    step_args : optional pytree with leading axis ``n_steps`` — sliced per step
                and passed to f as ``(args, slab_k)`` (piecewise controls)
    save_trajectory : also return ys [n_steps+1, M, D]

    Returns y_final [M, D] (and the trajectory if requested).
    """
    stepper = _STEPPERS[method]
    y0 = jnp.atleast_2d(y0)
    m = y0.shape[0]
    dtype = y0.dtype
    t0 = jnp.broadcast_to(jnp.asarray(t0, dtype), (m,))
    tf = jnp.broadcast_to(jnp.asarray(tf, dtype), (m,))
    h = (tf - t0) / n_steps

    def step(carry, xs):
        k, slab = xs
        t = t0 + h * k.astype(dtype)
        fa = args if slab is None else (args, slab)
        y = stepper(f, t, carry, h, fa)
        return y, (y if save_trajectory else None)

    if remat:
        step = jax.checkpoint(step)

    ks = jnp.arange(n_steps)
    xs = (ks, step_args)
    y_final, traj = jax.lax.scan(step, y0, xs)
    if save_trajectory:
        traj = jnp.concatenate([y0[None], traj], axis=0)
        return y_final, traj
    return y_final
