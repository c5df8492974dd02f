"""Implicit-function-theorem reverse mode through the outer root solvers.

The batched Newton/Ψtc/Anderson/Krylov engines (this package) iterate inside
``lax.while_loop``, which JAX cannot reverse-differentiate — so until now a
converged BVP/steady-state/PMP solution was a dead end for ``jax.grad``
(forward mode works, but K-parameter gradients cost K solves). The PETSc/Tao
stacks the reference leans on (multi_shooting_petsc.cpp:44-116,
petsc_composite_example.cpp) have no gradient story at all; TAO users
hand-code adjoints. Here the fix is one wrapper:

    x* = implicit_root(F, x0, args)          # F(x*, args) = 0

is a ``jax.custom_vjp``: the forward pass runs any of the package's solvers
to convergence (iteration count, damping, and warm starts never enter the
tape), and the backward pass applies the implicit function theorem at the
root —

    x̄ ↦ θ̄ = −(∂F/∂θ)ᵀ w,   (∂F/∂x)ᵀ w = x̄

one batched transposed linear solve (dense LU for small N, matrix-free GMRES
with Jᵀ·v as a vjp pull for large N) plus one vjp pull of F in θ. Gradients
of bilevel objectives — fit-the-steady-state, differentiate-through-shooting,
learn-the-continuation — cost ONE extra linear solve per backward pass,
independent of the number of parameters.

The cotangent w.r.t. ``x0`` is zero by convention: at a converged root the
solution does not depend on the initial iterate (basin changes are
non-differentiable events). Non-converged lanes poison their gradient lanes
with NaN rather than returning silently-wrong values.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.control.newton import fd_or_ad_jacobian, newton_solve
from janus_tpu.linalg.gmres import gmres_batched
from janus_tpu.linalg.smalllu import lu_factor, lu_solve


def _split_diff(args):
    """Partition args leaves into differentiable (inexact) and passthrough."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    diff_idx = [i for i, l in enumerate(leaves)
                if jnp.issubdtype(jnp.result_type(l), jnp.inexact)]

    def rebuild(diff_leaves):
        out = list(leaves)
        for i, v in zip(diff_idx, diff_leaves):
            out[i] = v
        return jax.tree_util.tree_unflatten(treedef, out)

    dleaves = [jnp.asarray(leaves[i]) for i in diff_idx]
    return dleaves, rebuild, leaves, treedef, diff_idx


def implicit_root(f: Callable, x0, args: Any = None, *,
                  solver: Optional[Callable] = None,
                  linear: str = "lu", gmres_iters: int = 30,
                  precond: Optional[Callable] = None,
                  jac: Optional[Callable] = None, jac_mode: str = "ad",
                  **newton_kw):
    """Differentiable batched root solve: x*(args) with F(x*, args) = 0.

    f      : batched residual ``f(x [M,N], args) -> [M,N]``
    x0     : [M, N] initial iterate (or [N]; zero cotangent — see module
             docstring)
    args   : parameter pytree; every inexact leaf gets a gradient
    solver : optional ``solver(g, x0) -> x | NewtonResult`` running ANY
             root-finding engine on the closed residual ``g(x) = f(x, args)``
             (e.g. ``lambda g, x0: psitc_solve(g, x0).x``); default is this
             package's damped ``newton_solve`` (extra ``newton_kw`` pass
             through to it). The engine's internals are NOT differentiated.
    linear : 'lu' (batched dense, small N) or 'gmres' (matrix-free
             ``Jᵀ·v`` by vjp pull — method-of-lines N, no Jacobian
             materialized; optional right ``precond``).
    jac    : optional ``jac(x, args) -> [M, N, N]`` residual Jacobian for
             the 'lu' backward; jac_mode ('ad' | 'fd') picks the default
             when absent. Residuals containing ``radau_adjoint`` solves are
             vjp-able but NOT jvp-able (custom_vjp) — use linear='gmres'
             (pure vjp pulls), jac_mode='fd', or an IND-built ``jac`` there.

    Returns x* [M, N] (input rank preserved). ``jax.grad`` of any function
    of x* flows through the implicit function theorem at the root; lanes
    whose forward solve did not converge get NaN gradients.
    """
    if linear not in ("lu", "gmres"):
        raise ValueError("linear must be 'lu' or 'gmres'")
    if solver is not None and newton_kw:
        raise ValueError(f"extra keywords {sorted(newton_kw)} configure the "
                         "default newton_solve; configure your own engine "
                         "inside the solver callable instead")
    x0 = jnp.asarray(x0)
    squeeze = x0.ndim == 1
    x0b = jnp.atleast_2d(x0)

    @jax.custom_vjp
    def run(x0_, args_):
        x, _ = _solve(x0_, args_)
        return x

    def _solve(x0_, args_):
        def g(x):
            return f(x, args_)

        if solver is None:
            jac_cl = None if jac is None else (lambda xx: jac(xx, args_))
            res = newton_solve(g, x0_, jac_mode=jac_mode, jac=jac_cl,
                               **newton_kw)
        else:
            res = solver(g, x0_)
        if hasattr(res, "x"):
            x, conv = res.x, getattr(res, "converged", None)
        else:
            x, conv = res, None
        if conv is None:
            conv = jnp.ones(x.shape[:-1], bool)
        return x, conv

    def fwd(x0_, args_):
        x, conv = _solve(x0_, args_)
        return x, (x, conv, args_)

    def bwd(resids, xbar):
        x, conv, args_ = resids
        dleaves, rebuild, leaves, treedef, diff_idx = _split_diff(args_)

        def f_leaves(xx, dl):
            return f(xx, rebuild(dl))

        # solve (∂F/∂x)ᵀ w = x̄ at the root
        if linear == "lu":
            jmat = (jac(x, args_) if jac is not None else
                    fd_or_ad_jacobian(lambda xx: f_leaves(xx, dleaves), x,
                                      jac_mode))
            lu, piv = lu_factor(jnp.swapaxes(jmat, -1, -2))
            w = lu_solve(lu, piv, xbar)
        else:
            pull_x = jax.vjp(lambda xx: f_leaves(xx, dleaves), x)[1]
            w, _ = gmres_batched(lambda v: pull_x(v)[0], xbar,
                                 precond=precond, iters=gmres_iters)

        # θ̄ = −(∂F/∂θ)ᵀ w, and poison non-converged lanes
        w = jnp.where(conv[..., None], w, jnp.nan)
        gleaves = jax.vjp(lambda dl: f_leaves(x, dl), dleaves)[1](-w)[0]
        out = [np.zeros(jnp.shape(l), jax.dtypes.float0) for l in leaves]
        for i, gl in zip(diff_idx, gleaves):
            out[i] = gl
        args_ct = jax.tree_util.tree_unflatten(treedef, out)
        return (jnp.zeros_like(x), args_ct)

    run.defvjp(fwd, bwd)
    x = run(x0b, args)
    return x[0] if squeeze else x
