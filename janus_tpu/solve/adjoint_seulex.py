"""Discrete-adjoint reverse mode on the batched SEULEX solver.

``seulex_adjoint`` returns the final state of an adaptive ``solve_seulex``
run as a ``jax.custom_vjp`` whose backward pass differentiates the solver's
step map on the recorded accepted-step mesh. One accepted SEULEX step is

    y_{n+1} = Φ(t_n, h_n, k_n, y_n, θ)

— the Aitken–Neville extrapolation diagonal T[k_n, k_n] of the linearly
implicit Euler ladder (levels 0..k_n, level j = one LU of (M/h'_j − J) +
nseq[j] substeps), where k_n is the per-lane level the controller accepted
at. Frozen-mesh convention: (t_n, h_n, k_n) are data, recorded by the
forward pass (``solve_seulex(_mesh_size=...)``); the backward pass is a
``lax.scan`` of ``jax.vjp`` pulls of a step REPLAY at the recorded values,
with per-lane live masks and benign-value substitution on dead mesh slots
(the solve/adjoint_rodas.py mechanics).

Replay exactness: the recording forward runs with ``_force_jac=True`` —
the Jacobian refreshes at every NEW step point instead of the θ-gated reuse
(reference seulexted.py:328) — so the replay's fresh ``jac_fn(t_n, y_n)``
reproduces the forward iteration matrices bit-for-bit and Φ is the exact
step map of the solve whose output this function returns (slightly more
njev than the default θ-gated solve, same accepted trajectory contract as
rodas_adjoint, whose forward also refreshes per step). The ladder replay is
cond-gated per level on ``any(k <= k_n)``: lanes only pay for the levels
they actually ran, and the whole-batch cost tracks the forward ladder depth
(cap it with ``Options(seulex_kmax=...)`` — the backward scan compiles one
replay per level per step regardless of use).

Unlike rodas_adjoint, grad(seulex_adjoint) is NOT the transpose of the
forward IND tangents: ``solve_seulex(tangents=)`` drops ∂A/∂y (legitimate —
the semi-implicit Euler is a W-method, solve/seulex.py docstring), while
the vjp of the replay differentiates through the iteration matrix and the
Jacobian evaluation exactly. Both converge to the true sensitivity at the
ladder's order; this one is the exact gradient of the computed map
(discretize-then-optimize), verified against jax's own AD of the frozen
replay chain to roundoff and against FD of the full solver to O(rtol)
(tests/test_adjoint_seulex.py). Frozen-mesh gradients amplify on long
limit-cycle horizons exactly like the rodas/IND ones — tighten rtol there.

The reference's SEULEX family has forward duals only (seulexted.py — every
state a TensorDual); reverse mode on an extrapolation integrator has no
reference counterpart.

Scope: terminal mode, ``t_eval=`` trajectory sampling (chained
warm-started adaptive segments, the radau/rodas adjoint convention), and
terminal ``events=`` — ``(y*, t*)`` both reverse-differentiable via the vjp
of the triggering step's replayed extrapolation-quartic endpoint (the
midpoint Neville table is rebuilt level-for-level in the replay) with a
differentiable Newton re-polish of θ* (the rodas_adjoint event mechanics;
events COMPOSE with t_eval — zero-length post-trigger segments, NaN
samples past t*, the dopri/radau seg_ev convention) — and integral costs (``cost=``,
q̄ pulled through each step's replayed GL-3 increment on the rebuilt
quartic/Hermite interpolant, the rodas_adjoint convention). Mass matrices
supported including singular index-1 DAE masses for the y0/args gradients;
t0/tf cotangents use the continuous boundary formulas ±ȳ·ẏ with ẏ = M⁻¹f,
or — with ``n_alg`` trailing algebraic variables (mass = blockdiag(A, 0))
— the index-1 DAE's constrained velocity (solve/adjoint.py
``constrained_ydot``), so DAE lanes get boundary-time gradients too.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve import seulex as sx
from janus_tpu.solve.adjoint import _split_diff, constrained_ydot
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import _EINSUM_PRECISION, default_jacobian


def _one_step(f, jac_fn, mass, opts, t, h, y, k_rec, args, live=None,
              want_interp=False):
    """Replay ONE accepted SEULEX step at frozen (t, h, k) — the
    differentiable step map Φ. Mirrors the level arithmetic of
    solve/seulex.py:349-424 exactly (minus the k<=1 stability probes and
    the error control, which do not touch the accepted value): level j
    factors A_j = M/h'_j − J once (J fresh at (t, y) — the recording
    forward ran _force_jac=True so this IS the forward matrix), runs its
    nseq[j] substeps, and the Neville diagonal at the recorded level is the
    step output. Levels are cond-gated on any(k <= k_rec); skipped levels
    contribute zeros that the one-hot level select never reads.

    want_interp: additionally rebuild the dense-output midpoint — each
    even-nseq level's substep value at θ=1/2 feeds the parallel midpoint
    Neville table exactly as in the forward (solve/seulex.py:445-505), and
    the diagonal at the recorded level is the extrapolated y(t+h/2). Returns
    (y_sel, ymid_sel, mid_ok) where mid_ok marks lanes whose accepted level
    trusts the quartic (even nseq, k >= 2 — the forward's gate); the event
    endpoint assembles the quartic/cubic-Hermite (or mass-lane quadratic/
    linear) interpolant from these, matching solve/seulex.py:659-691.

    ``live`` (optional [M] bool): lanes replaying a DEAD mesh slot. For a
    (lane, level) pair that is not live — a dead slot, or a level above the
    lane's accepted k_rec — the RHS is masked to zero so the substeps replay
    the identity. The forward ladder never RAN those levels (it is gated on
    the per-lane target order), and actually integrating them here can blow
    up: the level's semi-implicit Euler damps only what the step-start
    Jacobian sees, and a (benign-slot or rejected-order) combination of h
    and stiff args can be unstable over the substeps — the resulting inf
    meets the zero cotangent in the vjp and 0·inf = NaN poisons the lane's
    per-leaf arg gradients (lane-masked cotangents do NOT protect leaf
    cotangents; the rodas_adjoint dead-slot lesson, debugged again here on
    the Robertson DAE where k2·y2² explodes at the benign replay point)."""
    m, dim = y.shape
    dtype = y.dtype
    kmax = opts.seulex_kmax
    nseq = sx._nseq(kmax)
    eye = jnp.eye(dim, dtype=dtype)
    jmat = jac_fn(t, y, args)
    mm = eye[None] if mass is None else (
        mass[None] if mass.ndim == 2 else mass)

    rows = []
    rows_mid = []
    even_nseq = []
    y_sel = jnp.zeros_like(y)
    ymid_sel = jnp.zeros_like(y)
    mid_ok = jnp.zeros((m,), bool)
    for k in range(kmax + 1):
        nj = nseq[k]
        lvl = k <= k_rec                                      # [M]
        if live is not None:
            lvl = lvl & live

        def run_level(_, nj=nj, lvl=lvl):
            def feval(tt, yy):
                return jnp.where(lvl[:, None], f(tt, yy, args), 0.0)

            hsub = h / nj
            amat = mm / hsub[:, None, None] - jmat
            lu, piv = lu_factor(amat, pivot=opts.pivoting)
            d = lu_solve(lu, piv, feval(t + hsub, y))
            ytemp = y + d
            d = lu_solve(lu, piv, feval(t + 2.0 * hsub, ytemp))

            def sub(nn, carry):
                yt, dd, ym = carry
                yt = yt + dd
                # capture the step-midpoint substep (forward :451)
                ym = jnp.where(nn == nj // 2, yt, ym)
                return (yt,
                        lu_solve(lu, piv, feval(t + (nn + 1.0) * hsub, yt)),
                        ym)

            # carry init = after 1 substep == the nj=2 midpoint (:445)
            ytemp, d, ymid = jax.lax.fori_loop(2, nj, sub, (ytemp, d, ytemp))
            return ytemp + d, ymid

        yk, ymid_k = jax.lax.cond(
            jnp.any(lvl), run_level,
            lambda _: (jnp.zeros_like(y), jnp.zeros_like(y)), None)
        # zero non-live lanes (their masked replay is the identity, = y)
        # so the Neville recurrences that feed OTHER levels' selected
        # diagonals see the same zeros the gated forward ladder implies
        yk = jnp.where(lvl[:, None], yk, 0.0)
        ymid_k = jnp.where(lvl[:, None], ymid_k, 0.0)
        row = [yk]
        for j in range(k):
            ratio = nseq[k] / nseq[k - j - 1]
            row.append(row[j] + (row[j] - rows[k - 1][j]) / (ratio - 1.0))
        rows.append(row)
        if want_interp and nj % 2 == 0:
            # parallel midpoint Neville table over even-nseq levels
            # (forward :498-505); the diagonal at the accepted level is
            # the extrapolated y(t+h/2) the quartic interpolates
            rowm = [ymid_k]
            for j in range(len(rows_mid)):
                ratio = nj / even_nseq[len(even_nseq) - 1 - j]
                rowm.append(rowm[j] + (rowm[j] - rows_mid[-1][j])
                            / (ratio - 1.0))
            rows_mid.append(rowm)
            even_nseq.append(nj)
            sel = k_rec == k
            ymid_sel = jnp.where(sel[:, None], rowm[-1], ymid_sel)
            mid_ok = mid_ok | (sel & (k >= 2))    # forward's k>=2 gate :552
        y_sel = jnp.where((k_rec == k)[:, None], row[k], y_sel)
    if want_interp:
        return y_sel, ymid_sel, mid_ok
    return y_sel


def _build_interp(fev, mass, t, h, y, y_new, ymid, mid_ok):
    """The accepted step's continuous extension as ``yi: θ[M] -> y[M, D]``
    — the SAME quartic / cubic-Hermite (mass: quadratic / linear)
    construction as the forward interpolant (solve/seulex.py:659-691), so
    GL-3 on it reproduces the forward ``quad=`` accumulation and the event
    endpoint interpolates identically. ``fev`` must already be live-masked
    (dead/masked lanes' f can overflow — the dead-slot lesson)."""
    hc = h[:, None]
    if mass is not None:
        a1 = 4.0 * ymid - y_new - 3.0 * y
        a2 = 2.0 * y_new + 2.0 * y - 4.0 * ymid

        def yi(th):
            e = th[:, None]
            lin = (1.0 - e) * y + e * y_new
            quad = y + a1 * e + a2 * e * e
            return jnp.where(mid_ok[:, None], quad, lin)

        return yi
    fy = fev(t, y)
    fn = fev(t + h, y_new)
    b1 = hc * fy
    r1 = y_new - y - b1
    r2 = hc * fn - b1
    r3 = ymid - y - 0.5 * b1
    qa2 = sx._QI[0, 0] * r1 + sx._QI[0, 1] * r2 + sx._QI[0, 2] * r3
    qa3 = sx._QI[1, 0] * r1 + sx._QI[1, 1] * r2 + sx._QI[1, 2] * r3
    qa4 = sx._QI[2, 0] * r1 + sx._QI[2, 1] * r2 + sx._QI[2, 2] * r3
    hf1 = hc * fn
    c2 = 3.0 * (y_new - y) - 2.0 * b1 - hf1
    c3 = -2.0 * (y_new - y) + b1 + hf1

    def yi(th):
        e = th[:, None]
        quart = (y + b1 * e + qa2 * e ** 2 + qa3 * e ** 3 + qa4 * e ** 4)
        cubic = y + b1 * e + c2 * e ** 2 + c3 * e ** 3
        return jnp.where(mid_ok[:, None], quart, cubic)

    return yi


def _gl3_inc(lq, t, h, yi, theta_q):
    """One step's running-cost increment: 3-point Gauss-Legendre of ``lq``
    on the replayed interpolant over [0, θ_q] — the same arithmetic as the
    forward ``cm.quad_gl3_step``, so the increment (θ_q = 1) reproduces the
    forward accumulation and its vjp is the exact discrete quadrature
    adjoint (the rodas_adjoint convention, solve/adjoint_rodas.py:129)."""
    dtype = t.dtype
    s35 = 0.6 ** 0.5
    gl_xi = jnp.asarray([0.5 * (1 - s35), 0.5, 0.5 * (1 + s35)], dtype)
    gl_w = jnp.asarray([5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0], dtype)
    nodes = theta_q[:, None] * gl_xi[None, :]                  # [M, 3]
    lv = jnp.stack([lq(t + nodes[:, i] * h, yi(nodes[:, i]))
                    for i in range(3)], axis=1)                # [M, 3, Q]
    return (h * theta_q)[:, None] * jnp.sum(gl_w[None, :, None] * lv,
                                            axis=1)


def seulex_adjoint(f: Callable, tspan, y0, args=None,
                   options: Optional[Options] = None,
                   jac: Optional[Callable] = None, mass=None, t_eval=None,
                   events=None, cost: Optional[Callable] = None,
                   n_alg: int = 0):
    """Reverse-differentiable batched adaptive SEULEX solve.

    Returns the final state y(T) [M, D], or — with ``t_eval`` — the sampled
    trajectory ys [M, T, D]. ``jax.grad``/``jax.vjp`` of any function of the
    result flows through the discrete adjoint w.r.t. y0, every inexact leaf
    of ``args``, t0, tf, and (in t_eval mode) the sample times. Memory: the
    reverse pass stores one (t, h, y, k)-slot per accepted step,
    ``options.adjoint_steps`` slots per lane PER SEGMENT (gradient poisoned
    with NaN on overflow).

    t_eval: optional strictly monotonic 1-D grid inside (t0, tf], ordered in
    the integration direction. The solve is CHAINED over the segments
    t0 → t_eval[0] → … → t_eval[-1], each an adaptive solve warm-started
    with the previous segment's step proposal, so samples are exact solve
    endpoints (the radau_adjoint convention, solve/adjoint.py:100-110).
    Integration stops at t_eval[-1] — include tf to get the endpoint.

    events: optional TERMINAL event spec(s) (every event must be terminal —
    the radau/rodas adjoint constraint). Returns ``(y, t)``: the state and
    time a lane stopped at (y*, t* on triggered lanes — triggered ⟺
    t[i] != tf). BOTH are reverse-differentiable: the event jump is the vjp
    of the triggering step's replayed extrapolation-quartic endpoint (the
    midpoint Neville table rebuilt level-for-level; cubic Hermite /
    mass-lane quadratic on the forward's own mid_ok gate) with θ* re-polished
    by two differentiable Newton iterations from the recorded root — starting
    converged, the polished iterate's derivative equals the implicit-function
    derivative to O(residual²) (the rodas_adjoint mechanics). Composes
    with t_eval (the dopri/radau seg_ev convention): returns
    ``(ys, y*, t*)`` with samples strictly past t* NaN.

    cost: optional running-cost integrand ``l(t[M], y[M,D], args) -> [M]``
    (or ``[M, Q]``). Appends ``q = ∫ l dt`` (``solve_seulex(quad=...)``, the
    CVODES quadrature role) to the outputs — ``(y, q)``, ``(ys, q)`` with
    t_eval (q summed over the grid span), ``(y, t_term, q)`` with events
    (q truncated at t*) — and q's cotangent flows through the SAME backward
    sweep: each recorded step's ladder replay also rebuilds the midpoint
    Neville table and recomputes its GL-3 quadrature increment on the
    replayed quartic/Hermite interpolant (the forward accumulation's own
    rule), so q̄ pulls are exact discrete-adjoint gradients of the computed
    q (the rodas_adjoint cost= mechanics).
    """
    opts = options if options is not None else Options()
    use_cost = cost is not None
    if n_alg and mass is None:
        raise ValueError("n_alg > 0 (semi-explicit index-1 DAE boundary "
                         "velocity) needs mass=blockdiag(A, 0); without a "
                         "mass matrix the system is an ODE")
    from janus_tpu.solve.events import normalize_events
    specs = normalize_events(events)
    if specs and not all(e.terminal for e in specs):
        raise ValueError("seulex_adjoint(events=...) requires every "
                         "event terminal (non-terminal recordings have "
                         "no gradient contract)")
    cap = opts.adjoint_steps
    jac_user = jac

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = sx.solve_seulex(f, t0, tf, y0, args, opts, jac=jac_user,
                              mass=mass, events=events or None, quad=cost,
                              _h0=h0, _force_jac=True)
        if specs:
            outs = (sol.y, sol.t, sol.h_next, sol.event_idx)
        else:
            outs = (sol.y, sol.h_next)
        return outs + ((sol.quad,) if use_cost else ())

    def fwd(t0, tf, y0, args, h0):
        sol = sx.solve_seulex(f, t0, tf, y0, args, opts, jac=jac_user,
                              mass=mass, events=events or None, quad=cost,
                              _mesh_size=cap, _h0=h0, _force_jac=True)
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

        dleaves, rebuild, leaves, treedef, diff_idx = _split_diff(args)

        def fa(t, y, dl):
            return f(t, y, rebuild(dl))

        jac_fn = (lambda t, y, dl: jac_user(t, y, rebuild(dl))) if jac_user \
            else default_jacobian(fa)

        if use_cost:
            def lfun(t, y, dl):                        # canon [M, Q]
                return cm.canon_cost(cost(t, y, rebuild(dl)))

            qb = jnp.asarray(qbar_in, dtype)
            qb = qb if qb.ndim == 2 else qb[:, None]   # [M, Q]

        def step(t, h, y, k, dl, live):
            if not use_cost:
                return _one_step(fa, jac_fn, mass, opts, t, h, y, k, dl,
                                 live=live)
            y_new, ymid, mid_ok = _one_step(fa, jac_fn, mass, opts, t, h, y,
                                            k, dl, live=live,
                                            want_interp=True)

            def fev(tt, yy):
                return jnp.where(live[:, None], fa(tt, yy, dl), 0.0)

            yi = _build_interp(fev, mass, t, h, y, y_new, ymid, mid_ok)
            q_inc = _gl3_inc(
                lambda tt, yy: jnp.where(live[:, None],
                                         lfun(tt, yy, dl), 0.0),
                t, h, yi, jnp.ones_like(t))
            return y_new, q_inc

        gl0 = [jnp.zeros(jnp.shape(l), dtype) for l in dleaves]

        if specs:
            triggered = ev_idx >= 0
            tbar = jnp.asarray(tbar_in, dtype)

            def g_sel(t, y, dl):
                # the lane's OWN terminating event function (one-hot over
                # the spec list by the recorded event_idx)
                a = rebuild(dl)
                vals = jnp.stack([jnp.asarray(e.fn(t, y, a), dtype)
                                  for e in specs], axis=0)      # [K, M]
                oh = (jnp.arange(len(specs))[:, None]
                      == jnp.maximum(ev_idx, 0)[None, :]).astype(dtype)
                return jnp.sum(oh * vals, axis=0)

            def evt_endpoint(t, h, y, k_rec, dl, th0, emask):
                # (y*, t*) of the triggering step as a differentiable map:
                # replay the ladder WITH the midpoint Neville table, rebuild
                # the forward's own interpolant (quartic on mid_ok lanes,
                # cubic Hermite otherwise; mass: quadratic/linear —
                # solve/seulex.py:659-691), and re-polish θ* by TWO Newton
                # iterations from the recorded root — starting converged,
                # the polished iterate's derivative equals the implicit-
                # function derivative to O(residual²)
                y_new, ymid, mid_ok = _one_step(
                    fa, jac_fn, mass, opts, t, h, y, k_rec, dl,
                    live=emask, want_interp=True)

                def fev(tt, yy):
                    # mask the interpolant's f evals to the event lanes —
                    # non-event lanes replay masked ladders whose endpoint
                    # can sit where f overflows (the dead-slot lesson)
                    return jnp.where(emask[:, None], fa(tt, yy, dl), 0.0)

                yi = _build_interp(fev, mass, t, h, y, y_new, ymid, mid_ok)

                def gfun(th):
                    return g_sel(t + th * h, yi(th), dl)

                th = th0
                for _ in range(2):
                    gv, dg = jax.jvp(gfun, (th,), (jnp.ones_like(th),))
                    th = th - gv / jnp.where(dg == 0.0, 1.0, dg)
                outs = (yi(th), t + th * h)
                if use_cost:
                    # the lane's LAST quadrature increment is the GL-3 rule
                    # truncated at θ* (the forward's event-lane convention),
                    # so dq/dt* also falls out of the vjp
                    outs = outs + (_gl3_inc(
                        lambda tt, yy: jnp.where(emask[:, None],
                                                 lfun(tt, yy, dl), 0.0),
                        t, h, yi, th),)
                return outs

        def body(carry, k):
            lam, gl = carry
            live = k < nacc                                   # [M]

            def do(_):
                # dead slots hold zeros (h=0 → inf in the replay, and
                # 0-cotangent × inf = NaN would pollute per-lane arg grads):
                # substitute a benign step, its pull sees a zero cotangent
                tk = jnp.where(live, mesh["t"][:, k], t0b)
                hk = jnp.where(live, mesh["h"][:, k], 1.0)
                yk = jnp.where(live[:, None], mesh["y"][:, k], y0b)
                kk = jnp.where(live, mesh["k"][:, k], 1)
                lam_in = jnp.where(live[:, None], lam, 0.0)
                if specs:
                    # the triggering lane's LAST live slot carries the
                    # whole (ȳ*, t̄*) cotangent through the event endpoint
                    # instead of the plain step map
                    is_evt = live & triggered & (k == nacc - 1)
                    lam_in = jnp.where(is_evt[:, None], 0.0, lam_in)
                _, pull = jax.vjp(
                    lambda yy, dl: step(tk, hk, yy, kk, dl, live),
                    yk, dleaves)
                if use_cost:
                    # each live step's replayed quadrature increment takes
                    # the whole q̄ (q = Σ increments); the triggering
                    # lane's last slot accumulated its (truncated)
                    # increment through evt_endpoint instead
                    qb_k = jnp.where(live[:, None], qb, 0.0)
                    if specs:
                        qb_k = jnp.where(is_evt[:, None], 0.0, qb_k)
                    dy, dgl = pull((lam_in, qb_k))
                else:
                    dy, dgl = pull(lam_in)
                if specs:
                    th0 = jnp.clip(
                        (t_end - tk) / jnp.where(hk == 0.0, 1.0, hk),
                        0.0, 1.0)
                    th0 = jnp.where(is_evt, th0, 0.5)

                    def do_evt(_):
                        _, pull_e = jax.vjp(
                            lambda yy, dl: evt_endpoint(tk, hk, yy, kk, dl,
                                                        th0, is_evt),
                            yk, dleaves)
                        ct = (jnp.where(is_evt[:, None], lam, 0.0),
                              jnp.where(is_evt, tbar, 0.0))
                        if use_cost:
                            ct = ct + (jnp.where(is_evt[:, None], qb, 0.0),)
                        return pull_e(ct)

                    dye, dgle = jax.lax.cond(
                        jnp.any(is_evt), do_evt,
                        lambda _: (jnp.zeros_like(lam),
                                   [jnp.zeros(jnp.shape(l), dtype)
                                    for l in dleaves]), None)
                    dy = dy + jnp.where(is_evt[:, None], dye, 0.0)
                    dgl = [g + ge for g, ge in zip(dgl, dgle)]
                return (jnp.where(live[:, None], dy, lam),
                        [g + dg for g, dg in zip(gl, dgl)])

            lam, gl = jax.lax.cond(jnp.any(live), do,
                                   lambda _: (lam, gl), None)
            return (lam, gl), None

        (lam0, gl), _ = jax.lax.scan(
            body, (ybar, gl0), jnp.arange(cap - 1, -1, -1))

        # overflow: a lane that accepted more steps than the ring holds has
        # an incomplete mesh — poison its gradient (and shared-leaf grads)
        over = nacc > cap                                     # [M]
        lam0 = jnp.where(over[:, None], jnp.nan, lam0)
        any_over = jnp.any(over)
        gl = [jnp.where(any_over, jnp.nan, g) for g in gl]

        # boundary-time cotangents: the TRUE velocity — M⁻¹f, or with
        # ``n_alg`` the index-1 DAE's constrained velocity (the continuous
        # adjoint's boundary formula, solve/adjoint.py constrained_ydot)
        def ydot(t, y):
            return constrained_ydot(fa, t, y, dleaves, mass, n_alg)

        tf_bar = jnp.sum(ybar * ydot(t_end, yT), axis=-1)     # [M]
        if use_cost:
            # the quadrature endpoint moves with tf: dq/dT = l(T, y(T))
            tf_bar = tf_bar + jnp.sum(qb * lfun(t_end, yT, dleaves),
                                      axis=-1)
        if specs:
            # triggered lanes stop at t* < tf: tf moves nothing (frozen
            # mesh); the (ȳ*, t̄*, q̄) pull went through the event endpoint.
            # Non-triggered lanes return t = tf exactly, so t̄ adds 1:1.
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
        raise ValueError("seulex_adjoint(t_eval=...) chains segments over a "
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
        # are NaN. The radau/dopri adjoint convention (adjoint_dopri.py).
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
