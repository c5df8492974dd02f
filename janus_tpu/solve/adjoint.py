"""Continuous-adjoint reverse-mode sensitivities on the adaptive Radau solver.

``radau_adjoint`` returns the final state of a batched adaptive Radau solve as
a ``jax.custom_vjp`` whose backward pass solves the adjoint ODE

    λ' = −J(t, y(t))ᵀ λ,        λ(T) = ∂L/∂y(T)

backward along the SAME accepted-step mesh the forward solve chose, with the
primal state reconstructed from each step's stored collocation (dense-output)
polynomial — the interpolated-primal continuous adjoint. Parameter gradients
accumulate by the step's own Radau quadrature

    ∂L/∂θ += h·Σ_i b_i · λ(τ_i)ᵀ ∂f/∂θ(τ_i, ŷ(τ_i)),

so many-parameter gradients (NN Hamiltonians, L4 training) cost ONE backward
sweep instead of K forward tangent directions — reverse mode at
adaptive-solver cost. The reference has forward duals only
(src/cpp/radauted_impl.hpp — no adjoint anywhere); this goes beyond it.

Design notes (TPU-first):
- the backward pass is a ``lax.scan`` over the step index k = S−1..0 with a
  per-lane live mask (lanes own different mesh lengths — same lockstep
  philosophy as the forward loop);
- each backward step factors (γ/h_b·Mᵀ + Jᵀ) once (unrolled batched LU) and
  runs the SAME transformed simplified iteration as the forward Newton — the
  adjoint stage system is linear in λ, so it converges at the primal's
  contraction rate;
- ∂f/∂θᵀλ and Jᵀλ come from per-stage ``jax.vjp`` pulls of the batched rhs —
  Jacobians are never materialized for the quadrature (VecOpDual's concern);
- invertible mass matrices use the substitution ν = M⁻ᵀλ: Mᵀν' = −Jᵀν with
  ν(T) = M⁻ᵀ∂L/∂y(T) and ∂L/∂y0 = Mᵀν(t0). Singular-mass (DAE) adjoints are
  not defined by this route and raise.

Accuracy contract: gradients match jvp/FD through the solve to O(rtol)
(discretize-then-optimize vs optimize-then-discretize differ by the local
error of the mesh, which the controller bounds by rtol).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import (_EINSUM_PRECISION, _factorize,
                                   default_jacobian, solve_radau)
from janus_tpu.solve.radau_tables import radau_tableau


def radau_adjoint(f: Callable, tspan, y0, args=None,
                  options: Optional[Options] = None,
                  jac: Optional[Callable] = None, mass=None):
    """Reverse-differentiable batched adaptive Radau solve.

    Returns the final state y(T) [M, D]. ``jax.grad``/``jax.vjp`` of any
    function of the result flows through the continuous adjoint w.r.t. y0,
    every inexact leaf of ``args``, t0, and tf. Forward-mode (jvp) requests
    fall through to the solver's ordinary jvp path.

    mass: optional INVERTIBLE mass matrix [D,D] or [M,D,D]. Singular (DAE)
    mass has no continuous adjoint of this form; invertibility is not
    detectable at trace time and is the caller's responsibility.
    """
    opts = options if options is not None else Options()
    if opts.min_stages != opts.max_stages:
        raise ValueError("radau_adjoint needs a fixed stage count "
                         "(Options.min_stages == max_stages)")
    if opts.stage_solver != "lu":
        raise ValueError("radau_adjoint's backward pass factors the adjoint "
                         "stage systems with the dense LU; "
                         "stage_solver='gmres' is not supported")
    t0, tf = tspan
    run = _build_adjoint(f, opts, jac, mass)
    return run(t0, tf, y0, args)


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


def _build_adjoint(f, opts, jac_user, mass):
    cap = opts.adjoint_steps

    @jax.custom_vjp
    def run(t0, tf, y0, args):
        sol = solve_radau(f, t0, tf, y0, args=args, options=opts,
                          jac=jac_user, mass=mass)
        return sol.y

    def fwd(t0, tf, y0, args):
        sol = solve_radau(f, t0, tf, y0, args=args, options=opts,
                          jac=jac_user, mass=mass, _mesh_size=cap)
        res = (sol.mesh, sol.stats["naccept"], t0, tf, y0, args, sol.y)
        return sol.y, res

    def bwd(res, ybar):
        mesh, nacc, t0, tf, y0, args, yT = res
        t0b, tfb, y0b = cm.broadcast_batch(t0, tf, y0)
        lam0, gleaves, t0bar, tfbar = _adjoint_sweep(
            f, opts, jac_user, mass, mesh, nacc, t0b, tfb, y0b, args, yT,
            ybar)
        # reduce cotangents back to the primal input shapes
        t0_ct = jnp.sum(t0bar) if jnp.ndim(t0) == 0 else t0bar
        tf_ct = jnp.sum(tfbar) if jnp.ndim(tf) == 0 else tfbar
        y0_ct = jnp.reshape(lam0, jnp.shape(y0))
        # scatter leaf grads back into the args tree; non-inexact leaves get
        # float0 zeros (JAX's cotangent type for integer primals)
        _, _, leaves, treedef, diff_idx = _split_diff(args)
        out = [np.zeros(jnp.shape(l), jax.dtypes.float0) for l in leaves]
        for i, g in zip(diff_idx, gleaves):
            out[i] = g
        args_ct = jax.tree_util.tree_unflatten(treedef, out)
        return (t0_ct, tf_ct, y0_ct, args_ct)

    run.defvjp(fwd, bwd)
    return run


def _adjoint_sweep(f, opts, jac_user, mass, mesh, nacc, t0b, tfb, y0b, args,
                   yT, ybar):
    """Backward lax.scan over the stored accepted-step mesh."""
    m, dim = yT.shape
    dtype = yT.dtype
    s = opts.min_stages
    tab = radau_tableau(s)
    cap = mesh["t"].shape[1]
    npair = (s - 1) // 2
    c_nodes = jnp.asarray(tab.c, dtype)
    b_w = jnp.asarray(tab.b, dtype)
    t_mat = jnp.asarray(tab.t_mat, dtype)
    ti_mat = jnp.asarray(tab.ti_mat, dtype)
    tol = (opts.newton_tol if opts.newton_tol > 0
           else cm.derived_newton_tol(dtype, opts.rtol))

    dleaves, rebuild, _, _, _ = _split_diff(args)

    def f2(t, y, dl):
        return f(t, y, rebuild(dl))

    jac_fn = (lambda t, y, dl: jac_user(t, y, rebuild(dl))) if jac_user \
        else (lambda t, y, dl: default_jacobian(
            lambda tt, yy, dd: f2(tt, yy, dd))(t, y, dl))

    if mass is not None:
        massT = jnp.swapaxes(jnp.asarray(mass, dtype), -1, -2)

        def mdotT(w):                                # [M, ..., D]
            if massT.ndim == 2:
                return jnp.einsum("ij,m...j->m...i", massT, w,
                                  precision=_EINSUM_PRECISION)
            eq = "mij,msj->msi" if w.ndim == 3 else "mij,mj->mi"
            return jnp.einsum(eq, massT, w, precision=_EINSUM_PRECISION)

        mTb = jnp.broadcast_to(massT, (m, dim, dim))
        luM, pivM = lu_factor(mTb, pivot=True)
        lam_init = lu_solve(luM, pivM, ybar)         # ν(T) = M⁻ᵀ λ(T)
    else:
        massT = None
        mdotT = lambda w: w                          # noqa: E731
        lam_init = ybar

    # tf cotangent: dL/dT = λ(T)ᵀ y'(T) = ν(T)ᵀ f(T, y(T))
    f_T = f2(tfb, yT, dleaves)
    tfbar = jnp.sum(lam_init * f_T, axis=-1)

    grads0 = [jnp.zeros(l.shape, l.dtype) for l in dleaves]
    bad0 = nacc > cap                                 # mesh overflow

    def step(carry, k):
        lam, grads, bad = carry
        live = k < nacc                               # [M]

        tn = jnp.take(mesh["t"], k, axis=1)           # [M] step start
        hn = jnp.take(mesh["h"], k, axis=1)           # [M] signed primal h
        yn = jnp.take(mesh["y"], k, axis=1)           # [M, D]
        qq = jnp.take(mesh["q"], k, axis=1)           # [M, s, D]
        t_end = tn + hn
        hb = jnp.where(live, -hn, -1.0)               # signed backward step

        # primal interpolant at the backward stage nodes τ_i = t_end + c_i·h_b
        # ⇒ θ_i = 1 − c_i on the primal step polynomial
        theta = 1.0 - c_nodes                         # [s]
        powers = jnp.stack([theta ** (q + 1) for q in range(s)], axis=-1)
        ys = yn[:, None, :] + jnp.einsum("sq,mqd->msd", powers, qq,
                                         precision=_EINSUM_PRECISION)
        taus = t_end[:, None] + c_nodes[None, :] * hb[:, None]
        y_end = yn + jnp.sum(qq, axis=1)              # poly(1)

        # dead lanes: substitute safe (finite) evaluation points
        ys = jnp.where(live[:, None, None], ys, yT[:, None, :])
        taus = jnp.where(live[:, None], taus, tfb[:, None])
        y_end = jnp.where(live[:, None], y_end, yT)
        t_end_s = jnp.where(live, t_end, tfb)

        # per-stage vjp pulls: y-only (iteration) and (y, θ) (quadrature)
        pulls_y, pulls_full = [], []
        for i in range(s):
            ti, yi = taus[:, i], ys[:, i]
            _, py = jax.vjp(lambda yy, _t=ti: f2(_t, yy, dleaves), yi)
            _, pf = jax.vjp(lambda yy, dl, _t=ti: f2(_t, yy, dl), yi,
                            dleaves)
            pulls_y.append(py)
            pulls_full.append(pf)

        # frozen iteration matrix: (γ/h_b·Mᵀ + Jᵀ) from J at the step's
        # later end (where the backward step starts)
        jmat = jac_fn(t_end_s, y_end, dleaves)        # [M, D, D]
        jac_adj = -jnp.swapaxes(jmat, -1, -2)
        lu_r, piv_r, lu_c, piv_c, ok = _factorize(
            tab, hb, jac_adj, massT, opts.pivoting)

        # transformed simplified iteration on the LINEAR adjoint stage system
        lam_e = lam

        def g_stage(i, z_i):
            return -pulls_y[i](lam_e + z_i)[0]

        init = (jnp.zeros((m, s, dim), dtype), jnp.zeros((m, s, dim), dtype),
                jnp.zeros((), jnp.int32), jnp.ones((), bool))

        def cond_it(stt):
            return stt[3] & (stt[2] < 10)

        def body_it(stt):
            w, z, it, _ = stt
            gs = jnp.stack([g_stage(i, z[:, i]) for i in range(s)], axis=1)
            tif = jnp.einsum("ij,mjd->mid", ti_mat, gs,
                             precision=_EINSUM_PRECISION)
            mw = mdotT(w)
            rhs_r = tif[:, 0] - (float(tab.mu_real) / hb)[:, None] * mw[:, 0]
            dws = [lu_solve(lu_r, piv_r, rhs_r)]
            for p in range(npair):
                mu = tab.mu_complex[p]
                mur, mui = float(mu.real), float(mu.imag)
                w1, w2 = mw[:, 1 + 2 * p], mw[:, 2 + 2 * p]
                fr = tif[:, 1 + 2 * p] - (mur * w1 - mui * w2) / hb[:, None]
                fi = tif[:, 2 + 2 * p] - (mur * w2 + mui * w1) / hb[:, None]
                sol = lu_solve(lu_c[:, p], piv_c[:, p],
                               jnp.concatenate([fr, fi], axis=-1))
                dws.append(sol[:, :dim])
                dws.append(sol[:, dim:])
            dw = jnp.stack(dws, axis=1)
            w2n = w + dw
            z2n = jnp.einsum("ij,mjd->mid", t_mat, w2n,
                             precision=_EINSUM_PRECISION)
            scale = 1.0 + jnp.abs(lam_e)[:, None, :]
            dn = cm.safe_sqrt(jnp.mean(jnp.square(dw / scale), axis=(1, 2)))
            keep = jnp.any(live & ok & (dn > tol) & jnp.isfinite(dn))
            return (w2n, z2n, it + 1, keep)

        _, z, _, _ = jax.lax.while_loop(cond_it, body_it, init)

        lam_n = lam_e + z[:, -1, :]                   # c_s = 1 ⇒ τ_s = t_n
        lam = jnp.where(live[:, None], lam_n, lam)
        bad = bad | (live & ~ok)

        # quadrature: ∂L/∂θ += h_n Σ_i b_i · (∂f/∂θ)ᵀ ν(τ_i)
        for i in range(s):
            wgt = jnp.where(live, hn * b_w[i], 0.0)   # [M]
            lam_i = lam_e + z[:, i, :]
            contrib = pulls_full[i]((wgt[:, None] * lam_i))[1]
            grads = [ga + gc for ga, gc in zip(grads, contrib)]

        return (lam, grads, bad), None

    ks = jnp.arange(cap - 1, -1, -1)
    (lam, grads, bad), _ = jax.lax.scan(step, (lam_init, grads0, bad0), ks)

    # y0 cotangent: λ(t0) = Mᵀ ν(t0)
    lam0 = mdotT(lam) if mass is not None else lam
    # t0 cotangent: dL/dt0 = −ν(t0)ᵀ f(t0, y0)
    f_0 = f2(t0b, y0b, dleaves)
    t0bar = -jnp.sum(lam * f_0, axis=-1)

    # poison everything if any lane overflowed the mesh or hit a singular
    # backward factorization — a silent wrong gradient is worse than NaN
    any_bad = jnp.any(bad)
    nan = jnp.asarray(jnp.nan, dtype)
    lam0 = jnp.where(any_bad, nan, lam0)
    grads = [jnp.where(any_bad, jnp.asarray(jnp.nan, g.dtype), g)
             for g in grads]
    t0bar = jnp.where(any_bad, nan, t0bar)
    tfbar = jnp.where(any_bad, nan, tfbar)
    return lam0, grads, t0bar, tfbar
