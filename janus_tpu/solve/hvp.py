"""Second-order sensitivities (Hessian-vector products) through the adaptive
Radau solve — the CVODES "forward-over-adjoint" role, beyond the reference
(which has first-order forward duals only, src/cpp/radauted_impl.hpp).

For L(y0, θ) = loss(y(T; y0, θ), θ) [+ ∫ cost dt], ``radau_hvp`` computes

    H·v = ∇²L · (v_y0, v_θ)

as the GRADIENT of the DIRECTIONAL DERIVATIVE  L̇ = ∇L·v:

1. Tangent augmentation (forward-over): the direction's first-order response
   δ' = f_y·δ + f_θ·v_θ, δ(0) = v_y0 is appended as extra state, giving the
   augmented system  Y = [y, δ],  Y' = (f(t, y, θ), jvp of f) — one
   ``jax.jvp`` per RHS call, no Jacobians materialized. Its Jacobian is block
   lower-triangular [[J, 0], [∂(Jδ), J]], so the augmented problem has the
   SAME stiffness spectrum (each eigenvalue doubled) and the adaptive
   controller's mesh stays honest for both halves.
2. Adjoint (over-adjoint): L̇ = ⟨∇_y loss(y_T, θ), δ_T⟩ + ⟨∇_θ loss, v_θ⟩ is
   an ordinary scalar function of the augmented terminal state, so ONE
   continuous-adjoint backward sweep (``radau_adjoint`` on the augmented
   system) of cost O(2D) yields the full (y0, θ) Hessian-vector product —
   second-order information for many parameters at two-first-order-solves
   cost. Newton's stage systems are 2D×2D: the unrolled-LU runtime is ~8×
   the plain solve per step (use ``Options(stage_solver="gmres")`` for
   large D).

Integral (Lagrange) costs ride the same machinery: the running cost l gets
the tangent integrand l̇ = l_y·δ + l_θ·v_θ stacked into one [M, 2Q]
quadrature, and loss sees (y_T, q, θ).

Accuracy contract: matches central differences OF THE ADJOINT GRADIENT to
O(rtol) — this is the exact derivative of the (mesh-consistent) first-order
adjoint gradient up to the controller's local error.

Typical uses: Newton-CG / trust-region steps on PMP shooting losses,
Gauss-Newton curvature for parameter fitting, and curvature-aware training
of NN Hamiltonians (L4) where K forward-over-forward directions would cost
K tangent sweeps. FULL Hessians compose as ``jax.vmap`` over the direction
(tests/test_hvp.py::test_hvp_vmap_full_hessian) — size
``Options.adjoint_steps`` for the WORST direction: every direction's
augmented solve picks its own mesh, and an undersized mesh poisons that
row to NaN by design.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.solve import common as cm
from janus_tpu.solve.adjoint import _split_diff, radau_adjoint
from janus_tpu.solve.options import Options


def _aug_mass(mass, dim):
    """blockdiag(M, M) for the augmented [y, δ] state."""
    if mass is None:
        return None
    mm = jnp.asarray(mass)
    z = jnp.zeros(mm.shape[:-2] + (dim, dim), mm.dtype)
    top = jnp.concatenate([mm, z], axis=-1)
    bot = jnp.concatenate([z, mm], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def radau_hvp(f: Callable, tspan, y0, args=None, *, loss: Callable,
              v_y0=None, v_args=None, options: Optional[Options] = None,
              mass=None, cost: Optional[Callable] = None,
              checkpoints: int = 0):
    """Hessian-vector product of a terminal(+integral) objective through the
    batched adaptive Radau solve.

    f       : batched RHS ``f(t[M], y[M,D], args) -> [M,D]``
    tspan   : (t0, tf) — scalars (no t-derivatives are produced)
    y0      : [M, D] initial state
    args    : parameter pytree (inexact leaves are differentiated)
    loss    : ``loss(yT [M,D], args) -> scalar`` — or, with ``cost``,
              ``loss(yT, q, args) -> scalar`` where q is the accumulated
              ∫ cost dt ([M] or [M, Q], matching the integrand)
    v_y0    : [M, D] direction in y0 (default zeros)
    v_args  : pytree direction matching args' inexact leaves (default zeros;
              missing/None leaves are zero)
    cost    : optional running integrand ``l(t, y, args) -> [M] | [M, Q]``
    checkpoints : forwarded to ``radau_adjoint`` (segmented-remat backward)

    Returns ``((h_y0, h_args), gdotv)``: the Hessian-vector product blocks —
    h_y0 = ∇²_{y0}L·v_y0 + ∇_{y0}∇_θL·v_θ [M, D], h_args a pytree like args
    (float0 zeros on non-inexact leaves) — and the directional derivative
    gdotv = ∇L·v (a free first-order consistency check:
    it must equal ⟨∇L, v⟩ of the plain ``radau_adjoint`` gradient).
    """
    opts = options if options is not None else Options()
    y0 = jnp.asarray(y0)
    if y0.ndim != 2:
        raise ValueError("radau_hvp expects batched y0 [M, D]")
    if mass is not None:
        try:                        # tracers can't be inspected — best effort
            mrows = np.abs(np.asarray(mass)).sum(axis=-1)
        except Exception:
            mrows = None
        if mrows is not None and np.any(mrows == 0.0):
            raise ValueError(
                "radau_hvp does not support singular (DAE) mass matrices — "
                "the backward sweep would silently produce NaN; first-order "
                "DAE gradients are radau_adjoint(n_alg=...)")
    m, dim = y0.shape
    dtype = y0.dtype
    v_y0 = jnp.zeros_like(y0) if v_y0 is None else \
        jnp.broadcast_to(jnp.asarray(v_y0, dtype), y0.shape)

    dleaves, rebuild, leaves, treedef, diff_idx = _split_diff(args)
    if v_args is None:
        v_dleaves = [jnp.zeros_like(l) for l in dleaves]
    else:
        # keep None leaves (zero direction) — default tree_flatten DROPS
        # them, which both broke the documented None handling and could
        # silently shift directions onto the wrong parameters
        vleaves = jax.tree_util.tree_flatten(
            v_args, is_leaf=lambda x: x is None)[0]
        if len(vleaves) == len(leaves):          # full-args-shaped direction
            vleaves = [vleaves[i] for i in diff_idx]
        if len(vleaves) != len(dleaves):
            raise ValueError(
                "v_args must match args' pytree (or its inexact leaves; "
                "None leaves mean a zero direction): "
                f"got {len(vleaves)} leaves for {len(dleaves)} inexact slots")
        v_dleaves = [jnp.zeros_like(l) if v is None
                     else jnp.broadcast_to(jnp.asarray(v, l.dtype), l.shape)
                     for l, v in zip(dleaves, vleaves)]

    use_cost = cost is not None
    if use_cost:
        q_scalar = len(jax.eval_shape(
            lambda: cost(jnp.zeros((m,), dtype), y0, args)).shape) == 1

    def f_aug(t, yy, dl):
        y, d = yy[:, :dim], yy[:, dim:]
        prim, tang = jax.jvp(lambda q, ll: f(t, q, rebuild(ll)),
                             (y, dl), (d, v_dleaves))
        return jnp.concatenate([prim, tang], axis=-1)

    if use_cost:
        def cost_aug(t, yy, dl):
            y, d = yy[:, :dim], yy[:, dim:]
            prim, tang = jax.jvp(
                lambda q, ll: cm.canon_cost(cost(t, q, rebuild(ll))),
                (y, dl), (d, v_dleaves))
            return jnp.concatenate([prim, tang], axis=-1)   # [M, 2Q]
    else:
        cost_aug = None

    mass_aug = _aug_mass(mass, dim)

    def dloss(z0, dl):
        out = radau_adjoint(f_aug, tspan, jnp.concatenate([z0, v_y0], -1),
                            args=dl, options=opts, mass=mass_aug,
                            cost=cost_aug, checkpoints=checkpoints)
        if use_cost:
            yy, q2 = out
            qn = q2.shape[-1] // 2
            q, qdot = q2[:, :qn], q2[:, qn:]
            if q_scalar:
                q, qdot = q[:, 0], qdot[:, 0]
            yT, dT = yy[:, :dim], yy[:, dim:]
            _, ldot = jax.jvp(
                lambda a, b, ll: loss(a, b, rebuild(ll)),
                (yT, q, dl), (dT, qdot, v_dleaves))
            return ldot
        yT_dT = out
        yT, dT = yT_dT[:, :dim], yT_dT[:, dim:]
        _, ldot = jax.jvp(lambda a, ll: loss(a, rebuild(ll)),
                          (yT, dl), (dT, v_dleaves))
        return ldot

    gdotv, (h_y0, h_dleaves) = jax.value_and_grad(
        dloss, argnums=(0, 1))(y0, dleaves)
    out_leaves = [np.zeros(jnp.shape(l), jax.dtypes.float0) for l in leaves]
    for i, g in zip(diff_idx, h_dleaves):
        out_leaves[i] = g
    h_args = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return (h_y0, h_args), gdotv
