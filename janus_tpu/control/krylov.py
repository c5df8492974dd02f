"""Matrix-free Newton–Krylov (the PETSc SNES+GMRES role).

The reference leans on PETSc for Krylov solves: GMRES+ILU closures
(odesolvers/linsolve.py:60-111), matrix-free J·v shells
(examples/cpp/petsc_vdp_jv_example.cpp, vdp_shell.cpp), SNES/NGMRES. Here:
J·v by ``jax.jvp`` (exact, no FD), batched GMRES from
``jax.scipy.sparse.linalg``, damped outer Newton — for systems too large for
the dense unrolled LU (e.g. method-of-lines PDE residuals)."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.scipy.sparse.linalg import gmres

from janus_tpu.control.newton import NewtonResult


def newton_krylov(f: Callable, x0, tol: float = 1e-8, max_iter: int = 30,
                  gmres_tol: float = 1e-4, gmres_restart: int = 20,
                  gmres_maxiter: int = 40,
                  preconditioner: Optional[Callable] = None,
                  precond: Optional[object] = None,
                  precond_block: int = 4) -> NewtonResult:
    """Solve f(x)=0 with matrix-free Newton-GMRES, batched over M instances.

    f: [M,N] -> [M,N]. The Jacobian-vector product is an exact jvp of the
    batched residual (each lane's J·v; lanes are independent).
    preconditioner: optional FIXED preconditioner callable v -> M⁻¹v.
    precond: rebuilt-at-every-Newton-iteration preconditioner (the
      reference's ILU-per-linsolve role, odesolvers/linsolve.py:60-111):
      "block_jacobi" (with precond_block), "tridiag", or a factory
      x -> (v -> M⁻¹v) built from janus_tpu.control.precond.
    """
    from janus_tpu.control import precond as _pc

    if precond == "block_jacobi":
        factory = lambda xx: _pc.block_jacobi_precond(f, xx, precond_block)
    elif precond == "tridiag":
        factory = lambda xx: _pc.tridiag_precond(f, xx)
    elif callable(precond):
        factory = precond
    elif precond is None:
        factory = None
    else:
        raise ValueError(f"unknown precond {precond!r}")

    x0 = jnp.atleast_2d(x0)
    m, n = x0.shape

    def fnorm(x):
        return jnp.linalg.norm(f(x), axis=-1)

    state = (x0, fnorm(x0), jnp.zeros((m,), bool), jnp.zeros((m,), jnp.int32),
             jnp.ones((m,), bool))

    def cond(s):
        return jnp.any(s[4])

    def body(s):
        x, fn, convd, it, running = s

        def jv(v):
            _, out = jax.jvp(f, (x,), (v,))
            return out

        rhs = -f(x)
        M_apply = factory(x) if factory is not None else preconditioner
        step, _ = gmres(jv, rhs, tol=gmres_tol, restart=gmres_restart,
                        maxiter=gmres_maxiter, M=M_apply)
        step = jnp.where(jnp.isfinite(step), step, 0.0)

        # Armijo backtracking (4 fixed trials)
        lam = jnp.ones((m,), x.dtype)
        best_x, best_fn = x + step, fnorm(x + step)
        accepted = best_fn <= (1.0 - 1e-4) * fn
        for _ in range(4):
            lam = jnp.where(accepted, lam, lam * 0.5)
            cand = x + lam[:, None] * step
            cfn = fnorm(cand)
            better = ~accepted & (cfn < fn)
            best_x = jnp.where(better[:, None], cand, best_x)
            best_fn = jnp.where(better, cfn, best_fn)
            accepted = accepted | better

        x_new = jnp.where(running[:, None], best_x, x)
        fn_new = jnp.where(running, best_fn, fn)
        it_new = it + running
        conv_now = running & (fn_new < tol)
        stalled = running & (it_new >= max_iter)
        return (x_new, fn_new, convd | conv_now, it_new,
                running & ~conv_now & ~stalled)

    x, fn, convd, it, _ = jax.lax.while_loop(cond, body, state)
    return NewtonResult(x=x, fnorm=fn, converged=convd, iters=it)
