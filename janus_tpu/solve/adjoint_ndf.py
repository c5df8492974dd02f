"""Discrete-adjoint reverse mode on the batched variable-order NDF/BDF solver.

``ndf_adjoint`` returns the final state of an adaptive ``solve_bdf`` run as a
``jax.custom_vjp`` whose backward pass differentiates the solver's step map on
the recorded accepted-step mesh. A multistep method's state is its backward-
difference array D, so — unlike the one-step rodas/seulex/dopri adjoints —
the backward scan carries a cotangent for the WHOLE array λ_D [M, SLOTS, dim]
and the recorded mesh stores, per accepted step:

    t, h, order          the frozen controls,
    D'                   the post-clamp prediction basis,
    d                    the converged corrector increment,
    T                    the composed inter-step rescale transform.

T folds EVERY ``_change_D`` application between two accepted-step predictions
(the boundary clamp, the post-accept order/step rescale, and all rejected or
Newton-failed attempts' rescales in between) into one frozen per-lane [K, K]
matrix — each application is linear in D with controller-chosen (order,
factor), so their product is the exact inter-step map (recorded
multiplicatively by ``solve_bdf(_mesh_size=...)``, ndf.py ``pmat``).

One accepted step then factors as

    Dhist_k = HistUpdate(D'_k, d_k)          (linear, frozen order)
    D'_k    = T_k ⋆ Dhist_{k-1}              (linear, frozen T)
    d_k     : M (d + ψ(D'_k)) − c f(t+h, y_pred(D'_k) + d) = 0   (implicit)

and the backward pass pulls each factor: the linear parts by ``jax.vjp`` of
their replay, the corrector by the implicit-function theorem — one transposed
solve (M − c·J(t+h, y_new))ᵀ w = λ_d with a FRESH Jacobian at the converged
point (the forward's possibly-stale J is only an iteration matrix; the
converged d is J-independent to newton_tol). Gradients are therefore exact to
O(newton_tol) for the computed map — the same contract as radau's continuous
adjoint transposed stage solves — and match FD of the full solver to O(rtol).

y(T) = Dhist[0] of the lane's LAST accepted step, so the terminal cotangent
injects as e₀ ⊗ ȳ at slot nacc−1 per lane during the backward scan (lanes
finish at different slots). Dead slots and dead (lane, slot) pairs use
benign-value substitution with live-masked RHS evaluations — the recorded
rodas/seulex/dopri lesson: 0-cotangent × inf = NaN pollutes per-lane
arg-leaf gradients.

Startup: D₀ = [y0, d₁] with d₁ = h₀·f(t0, y0) (or the linearized
backward-Euler increment (M − h₀J₀)⁻¹h₀f₀ under a mass matrix, singular
index-1 included); h₀ is recorded and frozen, and the pull through d₁
carries the startup's y0/θ dependence.

Scope: terminal mode, ``t_eval=`` trajectory sampling (chained
warm-started adaptive segments — note each segment RESTARTS the difference
array at order 1, the multistep analog of the one-step chaining convention;
samples remain O(rtol)-accurate solve endpoints), and terminal ``events=``
— ``(y*, t*)`` both reverse-differentiable via the vjp of the triggering
step's backward-difference interpolant (linear in the replayed history
array) with a differentiable Newton re-polish of θ* from the recorded
root (the rodas_adjoint event mechanics; events COMPOSE with t_eval —
zero-length post-trigger segments, NaN samples past t*, the dopri/radau
seg_ev convention). ``stage_solver='gmres'/'tridiag'`` runs the backward IFT
solves MATRIX-FREE: (M − cJ)ᵀw = λ_d by batched GMRES whose operator
applies Jᵀ·v as a vjp pull at the converged point (reverse mode is the
natural direction for transposed operators) preconditioned by the
TRANSPOSED probed structure (``gmres_shifted_solver_T``; bands shift,
blocks transpose) — large-D MOL reverse mode on the multistep family with
J never materialized (the reference's BDF+Krylov role,
examples/cpp/vdp_bdf_gmres.cpp + odesolvers/linsolve.py:60-111, which has
no reverse mode). Gradient accuracy then tracks the Krylov solve like the
forward corrector tracks its own (exact for tridiagonal-structure J under
'tridiag'; the radau continuous adjoint's backward-gmres contract).
Memory: the D' ring is [M, cap, 8, dim] — 8× the one-step adjoints' y ring;
size ``options.adjoint_steps`` accordingly on large-D problems.

The reference's BDF prototypes (bdf_torch.py, CVODES BDF role) have no
reverse mode; MATLAB's ode15s has none either.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve import ndf as nd
from janus_tpu.solve.adjoint import _split_diff, constrained_ydot
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import _EINSUM_PRECISION, default_jacobian

_K = nd._K
_SLOTS = nd._SLOTS


def _alpha_gamma(ndf, dtype):
    kappa_np = nd._KAPPA_NDF if ndf else np.zeros(_K)
    gamma_np = np.hstack([0.0, np.cumsum(1.0 / np.arange(1, _K))])
    alpha = jnp.asarray((1.0 - kappa_np) * gamma_np, dtype)
    gamma_slots = jnp.asarray(np.hstack([gamma_np, np.zeros(_SLOTS - _K)]),
                              dtype)
    return alpha, gamma_slots


def _hist_update(Dp, d_fin, order):
    """Replay of the accepted-step difference update (ndf.py body, 'history
    update on accept'): write d into slot order+1, d − D'[order+1] into slot
    order+2, reverse-cumsum slots <= order+1. Linear in (Dp, d_fin)."""
    slot_idx = jnp.arange(_SLOTS)
    oh1 = slot_idx[None, :] == (order[:, None] + 1)
    oh2 = slot_idx[None, :] == (order[:, None] + 2)
    d_old_op1 = nd._pick_slot(Dp, order + 1)
    Dw = jnp.where(oh1[..., None], d_fin[:, None, :], Dp)
    Dw = jnp.where(oh2[..., None], (d_fin - d_old_op1)[:, None, :], Dw)
    le1 = slot_idx[None, :] <= (order[:, None] + 1)
    suff = jax.lax.cumsum(jnp.where(le1[..., None], Dw, 0.0), axis=1,
                          reverse=True)
    return jnp.where(le1[..., None], suff, Dw)


def _predict(Dp, order, gamma_slots, alpha):
    """y_pred and psi from the prediction basis (ndf.py body)."""
    slot_idx = jnp.arange(_SLOTS)
    le = slot_idx[None, :] <= order[:, None]
    y_pred = jnp.sum(jnp.where(le[..., None], Dp, 0.0), axis=1)
    ge1 = (slot_idx[None, :] >= 1) & le
    gamma_w = jnp.where(ge1, gamma_slots[None, :], 0.0)
    alpha_ord = nd._pick(alpha, order)
    psi = jnp.sum(gamma_w[:, :, None] * Dp, axis=1) / alpha_ord[:, None]
    return y_pred, psi, alpha_ord


def _bdf_interp(Dh, tk, hk, kk):
    """The accepted step's backward-difference interpolant as
    ``yi: θ[M] -> y[M, D]`` — the forward dense/events polynomial
    (solve/ndf.py 'dense output & events') rebuilt from the replayed
    post-accept history array ``_hist_update(D', d)``, LINEAR in Dh."""
    dtype = tk.dtype
    t_new = tk + hk
    iidx = jnp.arange(nd.MAX_ORDER, dtype=dtype)
    kmask = jnp.arange(nd.MAX_ORDER)[None, :] < kk[:, None]

    def yi(th):
        tq = tk + th * hk
        x = ((tq[:, None]
              - (t_new[:, None] - iidx[None, :] * hk[:, None]))
             / ((iidx[None, :] + 1.0) * hk[:, None]))
        cp = jnp.cumprod(x, axis=-1)
        w = jnp.where(kmask, cp, 0.0)
        return Dh[:, 0] + jnp.sum(w[:, :, None] * Dh[:, 1:_K], axis=1)

    return yi


def _gl3_inc(lq, t, h, yi, theta_q):
    """One step's running-cost increment: 3-point Gauss-Legendre of ``lq``
    on the replayed interpolant over [0, θ_q] — the same arithmetic as the
    forward ``cm.quad_gl3_step`` on ``solve_bdf(quad=)``'s interpolant, so
    the increment (θ_q = 1) reproduces the forward accumulation and its
    vjp is the exact discrete quadrature adjoint (the rodas_adjoint
    convention)."""
    dtype = t.dtype
    s35 = 0.6 ** 0.5
    gl_xi = jnp.asarray([0.5 * (1 - s35), 0.5, 0.5 * (1 + s35)], dtype)
    gl_w = jnp.asarray([5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0], dtype)
    nodes = theta_q[:, None] * gl_xi[None, :]                  # [M, 3]
    lv = jnp.stack([lq(t + nodes[:, i] * h, yi(nodes[:, i]))
                    for i in range(3)], axis=1)                # [M, 3, Q]
    return (h * theta_q)[:, None] * jnp.sum(gl_w[None, :, None] * lv,
                                            axis=1)


def ndf_adjoint(f: Callable, tspan, y0, args=None,
                options: Optional[Options] = None,
                jac: Optional[Callable] = None, mass=None, t_eval=None,
                ndf: bool = True, events=None,
                cost: Optional[Callable] = None, n_alg: int = 0):
    """Reverse-differentiable batched adaptive NDF/BDF (orders 1-5) solve.

    Returns the final state y(T) [M, D], or — with ``t_eval`` — the sampled
    trajectory ys [M, T, D]. ``jax.grad``/``jax.vjp`` of any function of the
    result flows through the discrete adjoint w.r.t. y0, every inexact leaf
    of ``args``, t0, tf, and (in t_eval mode) the sample times. Memory: one
    (t, h, order, d, D', T)-slot per accepted step, ``options.adjoint_steps``
    slots per lane PER SEGMENT (gradient poisoned with NaN on overflow).

    events: optional TERMINAL event spec(s). Returns ``(y, t)``: the state
    and time each lane stopped at ((y*, t*) on triggered lanes), BOTH
    reverse-differentiable. The triggering step's cotangents pull through
    the vjp of its backward-difference interpolant — linear in the
    replayed history array ``_hist_update(D', d)``, so the pull composes
    with the corrector IFT and the rescale chain like the plain terminal
    cotangent — with θ* re-polished by a differentiable Newton step from
    the recorded root (the rodas_adjoint event mechanics). Composes with
    t_eval (the dopri/radau seg_ev convention): returns ``(ys, y*, t*)``
    with samples strictly past t* NaN. NOTE a no-trigger lane in an
    events batch integrates the whole span — size ``adjoint_steps`` for
    it (per SEGMENT in t_eval mode).

    cost: optional running-cost integrand ``l(t[M], y[M,D], args) -> [M]``
    (or ``[M, Q]``). Appends ``q = ∫ l dt`` (``solve_bdf(quad=...)``, the
    CVODES quadrature role) to the outputs — ``(y, q)``, ``(ys, q)`` with
    t_eval (q summed over the grid span), ``(y, t_term, q)`` with events
    (q truncated at t*) — and q's cotangent flows through the SAME
    backward sweep: each recorded step's GL-3 increment is recomputed on
    the backward-difference interpolant of the replayed history array
    ``_hist_update(D', d)`` (bit-identical to the forward accumulation),
    LINEAR in (D', d), so the pull composes with the corrector IFT and
    rescale chain like the event pull. Exact discrete-adjoint gradients of
    the computed q — the rodas_adjoint cost= mechanics on the multistep
    family.

    n_alg: trailing algebraic variables of a semi-explicit index-1 DAE
    (mass = blockdiag(A, 0)): t0/tf cotangents then use the CONSTRAINED
    velocity ẋ = A⁻¹f_x, ż = −g_z⁻¹(g_t + g_x ẋ) instead of M⁻¹f
    (solve/adjoint.py ``constrained_ydot``; matrix-free under
    ``stage_solver='gmres'``), so DAE lanes get boundary-time gradients.
    """
    opts = options if options is not None else Options()
    use_cost = cost is not None
    if n_alg and mass is None:
        raise ValueError("n_alg > 0 (semi-explicit index-1 DAE boundary "
                         "velocity) needs mass=blockdiag(A, 0); without a "
                         "mass matrix the system is an ODE")
    use_gmres = opts.stage_solver != "lu"
    if use_gmres and jac is not None:
        raise ValueError("stage_solver='gmres' is matrix-free (Jᵀ·v by "
                         "vjp, transposed probed preconditioner); drop "
                         "jac=")
    from janus_tpu.solve.events import normalize_events
    specs = normalize_events(events)
    if specs and not all(e.terminal for e in specs):
        raise ValueError("ndf_adjoint(events=...) requires every event "
                         "terminal (non-terminal recordings have no "
                         "gradient contract)")
    cap = opts.adjoint_steps
    jac_user = jac

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = nd.solve_bdf(f, t0, tf, y0, args, opts, jac=jac_user,
                           mass=mass, ndf=ndf, events=events or None,
                           quad=cost, _h0=h0)
        if specs:
            outs = (sol.y, sol.t, sol.h_next, sol.event_idx)
        else:
            outs = (sol.y, sol.h_next)
        return outs + ((sol.quad,) if use_cost else ())

    def fwd(t0, tf, y0, args, h0):
        sol = nd.solve_bdf(f, t0, tf, y0, args, opts, jac=jac_user,
                           mass=mass, ndf=ndf, events=events or None,
                           quad=cost, _mesh_size=cap, _h0=h0)
        res = (sol.mesh, sol.stats["naccept"], t0, tf,
               y0, args, sol.y, sol.t, h0,
               sol.event_idx if specs else None)
        if specs:
            outs = (sol.y, sol.t, sol.h_next, sol.event_idx)
        else:
            outs = (sol.y, sol.h_next)
        return outs + ((sol.quad,) if use_cost else ()), res

    def bwd(res, out_bar):
        qbar_in = out_bar[-1] if use_cost else None
        if use_cost:
            out_bar = out_bar[:-1]
        if specs:
            ybar, tbar_in, _, _ = out_bar    # h_next/event_idx: knobs
        else:
            ybar, _ = out_bar        # h_next is a non-differentiable knob
        mesh, nacc, t0, tf, y0, args, yT, t_end, h0, ev_idx = res
        t0b, tfb, y0b = cm.broadcast_batch(t0, tf, y0)
        m, dim = y0b.shape
        dtype = y0b.dtype
        ybar = jnp.asarray(ybar, dtype)
        alpha, gamma_slots = _alpha_gamma(ndf, dtype)
        eyeK = jnp.eye(_K, dtype=dtype)
        eyeD = jnp.eye(dim, dtype=dtype)

        dleaves, rebuild, leaves, treedef, diff_idx = _split_diff(args)

        def fa(t, y, dl):
            return f(t, y, rebuild(dl))

        if use_gmres:
            from janus_tpu.solve.radau import (gmres_shifted_solver,
                                               gmres_shifted_solver_T,
                                               precond_probe_fn)
            g_iters = 0 if opts.stage_solver == "tridiag" \
                else opts.gmres_iters
        else:
            jac_fn = (lambda t, y, dl: jac_user(t, y, rebuild(dl))) \
                if jac_user else default_jacobian(fa)

        def mdot(v):
            if mass is None:
                return v
            mb = mass[None] if mass.ndim == 2 else mass
            mb = jnp.broadcast_to(mb, (m, dim, dim))
            return jnp.einsum("mij,mj->mi", mb, v,
                              precision=_EINSUM_PRECISION)

        mmat = eyeD[None] if mass is None else (
            jnp.broadcast_to(mass[None] if mass.ndim == 2 else mass,
                             (m, dim, dim)))

        if use_cost:
            def lfun(t, y, dl):                        # canon [M, Q]
                return cm.canon_cost(cost(t, y, rebuild(dl)))

            qb = jnp.asarray(qbar_in, dtype)
            qb = qb if qb.ndim == 2 else qb[:, None]   # [M, Q]

        gl0 = [jnp.zeros(jnp.shape(l), dtype) for l in dleaves]
        e0bar = jnp.zeros((m, _SLOTS, dim), dtype).at[:, 0].set(ybar)

        # benign substitutes for dead (lane, slot) pairs: order 1, h 1,
        # D' = [y0, 0, ...] (a consistent basis), d = 0, T = I
        D_ben = jnp.zeros((m, _SLOTS, dim), dtype).at[:, 0].set(y0b)

        if specs:
            triggered = ev_idx >= 0
            tbar = jnp.asarray(tbar_in, dtype)
            # triggered lanes' terminal cotangent enters through the event
            # endpoint inside the scan body, not the e₀ ⊗ ȳ injection
            e0bar = jnp.where(triggered[:, None, None], 0.0, e0bar)

            def g_sel(t, y, dl):
                # the lane's OWN terminating event function (one-hot over
                # the spec list by the recorded event_idx)
                a = rebuild(dl)
                vals = jnp.stack([jnp.asarray(e.fn(t, y, a), dtype)
                                  for e in specs], axis=0)      # [K, M]
                oh = (jnp.arange(len(specs))[:, None]
                      == jnp.maximum(ev_idx, 0)[None, :]).astype(dtype)
                return jnp.sum(oh * vals, axis=0)

            def evt_endpoint(tk, hk, kk, Dp, d, dl, th0, emask):
                # (y*, t*) of the triggering step as a differentiable map:
                # rebuild the post-accept history array (linear), evaluate
                # the backward-difference interpolant at θ, and re-polish
                # θ* by TWO Newton iterations from the recorded root
                # (starting converged, the polished iterate's derivative
                # equals the implicit-function derivative to O(residual²)).
                # Mirrors the forward interp (solve/ndf.py 'dense output &
                # events') on a single θ per lane.
                yi = _bdf_interp(_hist_update(Dp, d, kk), tk, hk, kk)

                def gfun(th):
                    return g_sel(tk + th * hk, yi(th), dl)

                th = th0
                for _ in range(2):
                    gv, dg = jax.jvp(gfun, (th,), (jnp.ones_like(th),))
                    th = th - gv / jnp.where(dg == 0.0, 1.0, dg)
                outs = (yi(th), tk + th * hk)
                if use_cost:
                    # the lane's LAST quadrature increment is the GL-3 rule
                    # truncated at θ* (the forward's event-lane convention),
                    # so dq/dt* also falls out of the vjp
                    outs = outs + (_gl3_inc(
                        lambda tt, yy: jnp.where(emask[:, None],
                                                 lfun(tt, yy, dl), 0.0),
                        tk, hk, yi, th),)
                return outs

        def body(carry, k):
            lam, gl = carry
            live = k < nacc                                   # [M]
            lam_in = jnp.where((k == nacc - 1)[:, None, None], e0bar, lam)

            def do(_):
                tk = jnp.where(live, mesh["t"][:, k], t0b)
                hk = jnp.where(live, mesh["h"][:, k], 1.0)
                kk = jnp.where(live, mesh["k"][:, k], 1)
                dk = jnp.where(live[:, None], mesh["d"][:, k], 0.0)
                Dk = jnp.where(live[:, None, None], mesh["D"][:, k], D_ben)
                Tk = jnp.where(live[:, None, None], mesh["T"][:, k],
                               eyeK[None])
                lam_h = jnp.where(live[:, None, None], lam_in, 0.0)

                # 1) pull the linear accept-update
                _, pull_h = jax.vjp(
                    lambda Dp, d: _hist_update(Dp, d, kk), Dk, dk)
                lam_Dp, lam_d = pull_h(lam_h)

                if use_cost:
                    # each live step's GL-3 increment on the replayed
                    # backward-difference interpolant takes the whole q̄
                    # (q = Σ increments) — linear in (D', d), so the pull
                    # composes with the corrector IFT below exactly like
                    # the event pull; the triggering lane's last slot
                    # accumulated its (truncated) increment through
                    # evt_endpoint instead
                    qb_k = jnp.where(live[:, None], qb, 0.0)
                    if specs:
                        qb_k = jnp.where(
                            (live & triggered & (k == nacc - 1))[:, None],
                            0.0, qb_k)

                    def q_inc_fn(Dp, d, dl):
                        yi = _bdf_interp(_hist_update(Dp, d, kk), tk, hk, kk)
                        return _gl3_inc(
                            lambda tt, yy: jnp.where(
                                live[:, None], lfun(tt, yy, dl), 0.0),
                            tk, hk, yi, jnp.ones_like(tk))

                    _, pull_q = jax.vjp(q_inc_fn, Dk, dk, dleaves)
                    dDp_q, dd_q, dgl_q = pull_q(qb_k)
                    lam_Dp = lam_Dp + dDp_q
                    lam_d = lam_d + dd_q
                else:
                    dgl_q = [jnp.zeros(jnp.shape(l), dtype)
                             for l in dleaves]

                if specs:
                    # the triggering lane's LAST live slot carries the
                    # whole (ȳ*, t̄*) cotangent through the event endpoint
                    # — a direct function of (D', d, θ*) — instead of the
                    # e₀ ⊗ ȳ injection (zeroed above for these lanes)
                    is_evt = live & triggered & (k == nacc - 1)
                    th0 = jnp.clip(
                        (t_end - tk) / jnp.where(hk == 0.0, 1.0, hk),
                        0.0, 1.0)
                    th0 = jnp.where(is_evt, th0, 0.5)

                    def do_evt(_):
                        _, pull_e = jax.vjp(
                            lambda Dp, d, dl: evt_endpoint(
                                tk, hk, kk, Dp, d, dl, th0, is_evt),
                            Dk, dk, dleaves)
                        ct = (jnp.where(is_evt[:, None], ybar, 0.0),
                              jnp.where(is_evt, tbar, 0.0))
                        if use_cost:
                            ct = ct + (jnp.where(is_evt[:, None], qb, 0.0),)
                        return pull_e(ct)

                    dDp_e, dd_e, dgl_e = jax.lax.cond(
                        jnp.any(is_evt), do_evt,
                        lambda _: (jnp.zeros_like(lam_Dp),
                                   jnp.zeros_like(lam_d),
                                   [jnp.zeros(jnp.shape(l), dtype)
                                    for l in dleaves]), None)
                    lam_Dp = lam_Dp + jnp.where(is_evt[:, None, None],
                                                dDp_e, 0.0)
                    lam_d = lam_d + jnp.where(is_evt[:, None], dd_e, 0.0)
                else:
                    dgl_e = [jnp.zeros(jnp.shape(l), dtype)
                             for l in dleaves]

                # 2) corrector IFT: (M − c·J(t+h, y_new))ᵀ w = λ_d, fresh J
                # at the converged point, live-masked so dead lanes solve a
                # benign well-conditioned system with a zero rhs
                y_pred, psi, alpha_ord = _predict(Dk, kk, gamma_slots, alpha)
                c = hk / alpha_ord
                t_new = tk + hk
                y_new = y_pred + dk
                if use_gmres:
                    # matrix-free: Jᵀ·v by vjp pull at (t+h, y_new), the
                    # transposed probed structure as preconditioner (the
                    # reference's BDF+Krylov role, vdp_bdf_gmres.cpp, now
                    # in reverse); dead lanes' masked f makes their
                    # operator Mᵀ (identity when mass is None)
                    def f_live(t, y, dl):
                        fv = fa(t, y, dl)
                        return jnp.where(live[:, None], fv, 0.0)

                    pdata = precond_probe_fn(
                        f_live, opts.precond, opts.precond_block,
                        dim)(t_new, y_new, dleaves)
                    solve_T = gmres_shifted_solver_T(
                        f_live, t_new, y_new, dleaves, pdata,
                        jnp.ones_like(c), c, mass, g_iters,
                        precond=opts.precond, block=opts.precond_block)
                    w = solve_T(lam_d)
                else:
                    jm = jac_fn(t_new, y_new, dleaves)
                    jm = jnp.where(live[:, None, None], jm, 0.0)
                    amat_t = jnp.swapaxes(mmat - c[:, None, None] * jm,
                                          1, 2)
                    lu_t, piv_t = lu_factor(amat_t, pivot=opts.pivoting)
                    w = lu_solve(lu_t, piv_t, lam_d)

                # 3) pull −w through G(D', θ) at fixed d (the corrector
                # residual's explicit dependences); RHS live-masked
                def gres(Dp, dl):
                    yp, ps, a_o = _predict(Dp, kk, gamma_slots, alpha)
                    fv = fa(t_new, yp + dk, dl)
                    fv = jnp.where(live[:, None], fv, 0.0)
                    return mdot(dk + ps) - (hk / a_o)[:, None] * fv

                _, pull_g = jax.vjp(gres, Dk, dleaves)
                gD, gdl = pull_g(-w)
                lam_Dp = lam_Dp + gD

                # 4) chain through the frozen inter-step transform:
                # D'[j] = Σ_i T[i,j]·Dhist_prev[i] on the first K slots
                lam6 = jnp.sum(Tk[:, :, :, None] * lam_Dp[:, None, :_K, :],
                               axis=2)
                lam_prev = jnp.concatenate([lam6, lam_Dp[:, _K:]], axis=1)

                return (jnp.where(live[:, None, None], lam_prev, lam_in),
                        [g + dg + de + dq
                         for g, dg, de, dq in zip(gl, gdl, dgl_e, dgl_q)])

            lam, gl = jax.lax.cond(jnp.any(live), do,
                                   lambda _: (lam_in, gl), None)
            return (lam, gl), None

        (lamD0, gl), _ = jax.lax.scan(
            body, (jnp.zeros((m, _SLOTS, dim), dtype), gl0),
            jnp.arange(cap - 1, -1, -1))

        # startup pull: D0 = [y0, d1(y0, θ), 0, ...] with frozen h0
        h0r = mesh["h0"]

        def d1_fn(y0v, dl):
            f0 = fa(t0b, y0v, dl)
            if mass is None:
                return h0r[:, None] * f0
            if use_gmres:
                # mirror the forward startup's matrix-free solve (ndf.py
                # 'difference-array startup'); the vjp through the GMRES
                # iteration is the discrete adjoint of the computed d1
                pdata0 = precond_probe_fn(
                    fa, opts.precond, opts.precond_block,
                    dim)(t0b, y0v, dl)
                solve0, _ = gmres_shifted_solver(
                    fa, t0b, y0v, dl, pdata0, jnp.ones_like(h0r), h0r,
                    mass, g_iters, precond=opts.precond,
                    block=opts.precond_block)
                return solve0(h0r[:, None] * f0)
            j0 = jac_fn(t0b, y0v, dl)
            lu0, piv0 = lu_factor(mmat - h0r[:, None, None] * j0, pivot=True)
            return lu_solve(lu0, piv0, h0r[:, None] * f0)

        _, pull_d1 = jax.vjp(d1_fn, y0b, dleaves)
        dy0_d1, gdl_d1 = pull_d1(lamD0[:, 1])
        lam0 = lamD0[:, 0] + dy0_d1
        gl = [g + dg for g, dg in zip(gl, gdl_d1)]

        # overflow: a lane that accepted more steps than the ring holds has
        # an incomplete mesh — poison its gradient (and shared-leaf grads)
        over = nacc > cap                                     # [M]
        lam0 = jnp.where(over[:, None], jnp.nan, lam0)
        any_over = jnp.any(over)
        gl = [jnp.where(any_over, jnp.nan, g) for g in gl]

        # boundary-time cotangents: the TRUE velocity — M⁻¹f, or with
        # ``n_alg`` the index-1 DAE's constrained velocity (the continuous
        # adjoint's boundary formula, solve/adjoint.py constrained_ydot;
        # matrix-free A-block solves under stage_solver='gmres')
        def ydot(t, y):
            return constrained_ydot(fa, t, y, dleaves, mass, n_alg,
                                    use_gmres=use_gmres,
                                    gmres_iters=opts.gmres_iters)

        tf_bar = jnp.sum(ybar * ydot(t_end, yT), axis=-1)     # [M]
        if use_cost:
            # the quadrature endpoint moves with tf: dq/dT = l(T, y(T))
            tf_bar = tf_bar + jnp.sum(qb * lfun(t_end, yT, dleaves),
                                      axis=-1)
        if specs:
            # triggered lanes stop at t* < tf (frozen mesh: tf moves
            # nothing; the (ȳ*, t̄*, q̄) pull went through the event
            # endpoint); non-triggered lanes return t = tf exactly, so t̄
            # adds 1:1
            tf_bar = jnp.where(triggered, 0.0, tf_bar + tbar)
        t0_bar = -jnp.sum(lam0 * ydot(t0b, y0b), axis=-1)     # [M]
        if use_cost:
            t0_bar = t0_bar - jnp.sum(qb * lfun(t0b, y0b, dleaves), axis=-1)

        t0_ct = jnp.sum(t0_bar) if jnp.ndim(t0) == 0 else \
            jnp.reshape(t0_bar, jnp.shape(t0))
        tf_ct = jnp.sum(tf_bar) if jnp.ndim(tf) == 0 else \
            jnp.reshape(tf_bar, jnp.shape(tf))
        y0_ct = jnp.reshape(lam0, jnp.shape(y0))
        out = [np.zeros(jnp.shape(l), jax.dtypes.float0) for l in leaves]
        for i, g in zip(diff_idx, gl):
            out[i] = jnp.reshape(g, jnp.shape(leaves[i]))
        args_ct = jax.tree_util.tree_unflatten(treedef, out)
        h0_ct = None if h0 is None else jnp.zeros_like(h0)
        return (t0_ct, tf_ct, y0_ct, args_ct, h0_ct)

    run.defvjp(fwd, bwd)

    if t_eval is None:
        if specs:
            if use_cost:
                y, t_term, _, _, q = run(t0_in, tf_in, y0, args, None)
                return y, t_term, q
            y, t_term, _, _ = run(t0_in, tf_in, y0, args, None)
            return y, t_term
        if use_cost:
            y, _, q = run(t0_in, tf_in, y0, args, None)
            return y, q
        y, _ = run(t0_in, tf_in, y0, args, None)
        return y

    if jnp.ndim(t0_in) != 0 or jnp.ndim(tf_in) != 0:
        raise ValueError("ndf_adjoint(t_eval=...) chains segments over a "
                         "shared grid; t0/tf must be scalars")
    t_eval = jnp.asarray(t_eval)
    if t_eval.ndim != 1 or t_eval.shape[0] < 1:
        raise ValueError("t_eval must be a non-empty 1-D grid")
    t0b, _, y0b = cm.broadcast_batch(t0_in, tf_in, y0)
    dtype = y0b.dtype
    t_eval = t_eval.astype(dtype)
    t_lo = jnp.concatenate([jnp.full((1,), t0_in, dtype), t_eval[:-1]])
    t_hi = t_eval
    h_carry0 = jnp.zeros(t0b.shape, dtype)     # 0 ⇒ automatic initial step

    if specs:
        # events + t_eval: chain the sample segments per lane; a triggered
        # lane's later segments are ZERO-LENGTH solves t* → t* (identity;
        # boundary cotangents cancel — the event pull in the triggering
        # segment carries the whole gradient); samples strictly past t*
        # are NaN. Each live segment still RESTARTS the difference array
        # (the multistep chaining convention). The radau/dopri adjoint
        # convention (adjoint_dopri.py).
        m = y0b.shape[0]
        done0 = jnp.zeros((m,), bool)
        tstar0 = jnp.full((m,), t0_in, dtype)
        nan = jnp.asarray(jnp.nan, dtype)
        if use_cost:
            q0 = jnp.zeros(jax.eval_shape(
                lambda: cost(t0b, y0b, args)).shape, dtype)

        def seg_ev(carry, bounds):
            if use_cost:
                y, h, done, tstar, q = carry
            else:
                y, h, done, tstar = carry
            ta, tb = bounds
            ta_l = jnp.where(done, tstar, jnp.full((m,), ta, dtype))
            tb_l = jnp.where(done, tstar, jnp.full((m,), tb, dtype))
            outs = run(ta_l, tb_l, y, args, h)
            if use_cost:
                y2, t2, h2, idx2, q2 = outs
            else:
                y2, t2, h2, idx2 = outs
            trig = (idx2 >= 0) & ~done
            tstar2 = jnp.where(trig, t2, tstar)
            done2 = done | trig
            # a trigger strictly inside the segment invalidates the
            # segment's endpoint sample; a trigger exactly at tb keeps it
            dead = done | (trig & (t2 != tb_l))
            sample = jnp.where(dead[:, None], nan, y2)
            if use_cost:
                return (y2, h2, done2, tstar2, q + q2), sample
            return (y2, h2, done2, tstar2), sample

        if use_cost:
            (yF, _, doneF, tstarF, q), ys = jax.lax.scan(
                seg_ev, (y0b, h_carry0, done0, tstar0, q0), (t_lo, t_hi))
        else:
            (yF, _, doneF, tstarF), ys = jax.lax.scan(
                seg_ev, (y0b, h_carry0, done0, tstar0), (t_lo, t_hi))
        ys = jnp.swapaxes(ys, 0, 1)                    # [M, T, D]
        t_term = jnp.where(doneF, tstarF,
                           jnp.broadcast_to(t_eval[-1], (m,)))
        if use_cost:
            return ys, yF, t_term, q
        return ys, yF, t_term

    if use_cost:
        q0 = jnp.zeros(jax.eval_shape(
            lambda: cost(t0b, y0b, args)).shape, dtype)

        def seg_q(carry, bounds):
            y, h, q = carry
            y2, h2, q2 = run(bounds[0], bounds[1], y, args, h)
            return (y2, h2, q + q2), y2

        (_, _, q), ys = jax.lax.scan(seg_q, (y0b, h_carry0, q0),
                                     (t_lo, t_hi))
        return jnp.swapaxes(ys, 0, 1), q       # [M, T, D], [M(, Q)]

    def seg(carry, bounds):
        y, h = carry
        y2, h2 = run(bounds[0], bounds[1], y, args, h)
        return (y2, h2), y2

    (_, _), ys = jax.lax.scan(seg, (y0b, h_carry0), (t_lo, t_hi))
    return jnp.swapaxes(ys, 0, 1)              # [M, T, D]
