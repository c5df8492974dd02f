"""Discrete-adjoint reverse mode on the batched RODAS4 solver.

``rodas_adjoint`` returns the final state of an adaptive ``solve_rodas`` run
as a ``jax.custom_vjp`` whose backward pass is the EXACT TRANSPOSE of the
solver's step map on the recorded accepted-step mesh. Rosenbrock steps are
linearly implicit — one factorization, six solves, no Newton iteration — so
one accepted step is a closed-form differentiable function

    y_{n+1} = Φ(t_n, h_n, y_n, θ)

and its vjp (obtained by ``jax.vjp`` of a replay of the step at the recorded
(t_n, h_n, y_n)) is exact to machine precision. The backward pass is a
``lax.scan`` over the step index k = S−1..0 with a per-lane live mask and a
``lax.cond`` gate on dead mesh slots (the house lockstep style, cf.
solve/adjoint.py). Each backward step costs one step replay + its reverse
sweep — second-order AD through the Jacobian evaluation is handled natively
(the dJ[δ]ᵀ pull that the forward IND tangents build by an explicit
linearization of the jac map, solve/rodas.py:404-427, falls out of the vjp).

Frozen-mesh convention: (t_n, h_n) are data, exactly like the forward IND
tangents (``solve_rodas(tangents=)`` — "the exact derivative of the
frozen-h step"). Consequently

    grad(rodas_adjoint)ᵀ · δ  ==  ȳ · solve_rodas(tangents=[δ]).sens

to roundoff — the two are transposes of the SAME linear map, which is the
test oracle (tests/test_adjoint_rodas.py). Against FD of the full solver the
gradients differ by the controller's O(local error) = O(rtol) sensitivity,
the same accuracy contract as the continuous adjoint (solve/adjoint.py:65).
CAUTION (measured): on long limit-cycle horizons the frozen-mesh gradient
error amplifies with phase sensitivity like the IND tangents it transposes —
a μ=1e3 VdP over t∈[0,3000] (~2 periods) at rtol 1e-6 is 22% off the tight
oracle (rtol 1e-9 recovers 4e-4). Tighten rtol for long oscillatory spans.

Contrast with ``radau_adjoint`` (continuous, optimize-then-discretize): this
is discretize-then-optimize — the gradient of the NUMERICAL solution itself,
preferred inside optimization loops because descent directions are exact for
the computed loss. The reference has forward duals only (rosenbrock family:
src/fortran/radau.f ROSCOR + radauted_impl.hpp duals); reverse mode on a
Rosenbrock integrator has no reference counterpart.

Scope: terminal mode, ``t_eval=`` trajectory sampling (chained segments),
terminal ``events=`` — ``(y*, t*)`` both reverse-differentiable via
the vjp of the triggering step's replayed CONTRO-cubic endpoint with a
differentiable Newton re-polish of θ* — and integral costs (``cost=``,
q̄ pulled through each step's replayed GL-3 increment) — and events
COMPOSE with t_eval (zero-length post-trigger segments, NaN samples past
t* — the dopri/radau seg_ev convention); mass matrices supported including singular index-1 DAE
masses for the y0/args gradients (the step map is well-defined whenever the
forward solve is; algebraic-slot y0 cotangents are the true derivatives of
the discrete scheme). t0/tf cotangents use the continuous boundary formulas
±ȳ·ẏ with ẏ = M⁻¹f; for semi-explicit index-1 DAE lanes pass ``n_alg``
(trailing algebraic variables, mass = blockdiag(A, 0)) and ẏ becomes the
CONSTRAINED velocity ẋ = A⁻¹f_x, ż = −g_z⁻¹(g_t + g_x ẋ) (the continuous
adjoint's boundary formula, solve/adjoint.py ``constrained_ydot``) — so
DAE problems get boundary-time gradients too.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve import rodas as rd
from janus_tpu.solve.adjoint import _split_diff, constrained_ydot
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import _EINSUM_PRECISION, default_jacobian


def _one_step(f, jac_fn, mass, opts, t, h, y, args, want_interp=False):
    """Replay ONE accepted RODAS4 step at frozen (t, h) — the differentiable
    step map Φ. Mirrors the accepted-step arithmetic of solve/rodas.py:263-319
    exactly: J, f, f_t at the step start (every accepted step begins with
    need_jac=True there, so the replay's fresh evaluations reproduce the
    forward values bit-for-bit), E = M/(hγ) − J factored once, six solves.
    want_interp: also return the CONTRO cubic coefficients (cont2, cont3)
    so the event endpoint can re-interpolate the triggering step."""
    dim = y.shape[-1]
    eye = jnp.eye(dim, dtype=y.dtype)
    jmat = jac_fn(t, y, args)
    f1 = f(t, y, args)
    _, fx = jax.jvp(lambda tt: f(tt, y, args), (t,), (jnp.ones_like(t),))

    def mdot(v):
        if mass is None:
            return v
        if mass.ndim == 2:
            return jnp.einsum("ij,mj->mi", mass, v,
                              precision=_EINSUM_PRECISION)
        return jnp.einsum("mij,mj->mi", mass, v, precision=_EINSUM_PRECISION)

    mm = eye[None] if mass is None else (
        mass[None] if mass.ndim == 2 else mass)
    emat = mm / (h * rd.GAMMA)[:, None, None] - jmat
    lu_m, piv_m = lu_factor(emat, pivot=opts.pivoting)

    def slv(rhs):
        return lu_solve(lu_m, piv_m, rhs)

    hc = h[:, None]
    k1 = slv(f1 + (h * rd.D1)[:, None] * fx)
    f2 = f(t + rd.C2 * h, y + rd.A21 * k1, args)
    k2 = slv(f2 + (h * rd.D2)[:, None] * fx + mdot(rd.C21 * k1) / hc)
    f3 = f(t + rd.C3 * h, y + rd.A31 * k1 + rd.A32 * k2, args)
    k3 = slv(f3 + (h * rd.D3)[:, None] * fx
             + mdot(rd.C31 * k1 + rd.C32 * k2) / hc)
    f4 = f(t + rd.C4 * h, y + rd.A41 * k1 + rd.A42 * k2 + rd.A43 * k3, args)
    k4 = slv(f4 + (h * rd.D4)[:, None] * fx
             + mdot(rd.C41 * k1 + rd.C42 * k2 + rd.C43 * k3) / hc)
    y5 = y + rd.A51 * k1 + rd.A52 * k2 + rd.A53 * k3 + rd.A54 * k4
    t_new = t + h
    f5 = f(t_new, y5, args)
    k5 = slv(f5 + mdot(rd.C51 * k1 + rd.C52 * k2 + rd.C53 * k3
                       + rd.C54 * k4) / hc)
    y_emb = y5 + k5
    f6 = f(t_new, y_emb, args)
    k6 = slv(f6 + mdot(rd.C61 * k1 + rd.C62 * k2 + rd.C63 * k3
                       + rd.C64 * k4 + rd.C65 * k5) / hc)
    y_new = y_emb + k6
    if not want_interp:
        return y_new
    cont2 = (rd.D21 * k1 + rd.D22 * k2 + rd.D23 * k3 + rd.D24 * k4
             + rd.D25 * k5)
    cont3 = (rd.D31 * k1 + rd.D32 * k2 + rd.D33 * k3 + rd.D34 * k4
             + rd.D35 * k5)
    return y_new, cont2, cont3


def _gl3_inc(lq, t, h, y, y_new, c2, c3, theta_q):
    """One step's running-cost increment: 3-point Gauss-Legendre on the
    replayed CONTRO cubic over [0, θ_q] — the SAME arithmetic as the
    forward ``cm.quad_gl3_step`` on ``solve_rodas(quad=)``'s interpolant,
    so the increment (θ_q = 1) reproduces the forward accumulation
    bit-for-bit and its vjp is the exact discrete quadrature adjoint."""
    dtype = t.dtype
    s35 = 0.6 ** 0.5
    gl_xi = jnp.asarray([0.5 * (1 - s35), 0.5, 0.5 * (1 + s35)], dtype)
    gl_w = jnp.asarray([5.0 / 18.0, 8.0 / 18.0, 5.0 / 18.0], dtype)
    nodes = theta_q[:, None] * gl_xi[None, :]              # [M, 3]
    se = nodes[..., None]
    yq = (y[:, None, :] * (1.0 - se)
          + se * (y_new[:, None, :]
                  + (1.0 - se) * (c2[:, None, :] + se * c3[:, None, :])))
    tq = t[:, None] + nodes * h[:, None]
    lv = jnp.stack([lq(tq[:, i], yq[:, i]) for i in range(3)],
                   axis=1)                                 # [M, 3, Q]
    return (h * theta_q)[:, None] * jnp.sum(gl_w[None, :, None] * lv,
                                            axis=1)


def rodas_adjoint(f: Callable, tspan, y0, args=None,
                  options: Optional[Options] = None,
                  jac: Optional[Callable] = None, mass=None, t_eval=None,
                  events=None, cost: Optional[Callable] = None,
                  n_alg: int = 0):
    """Reverse-differentiable batched adaptive RODAS4 solve.

    Returns the final state y(T) [M, D], or — with ``t_eval`` — the sampled
    trajectory ys [M, T, D]. ``jax.grad``/``jax.vjp`` of any function of the
    result flows through the discrete adjoint w.r.t. y0, every inexact leaf
    of ``args``, t0, tf, and (in t_eval mode) the sample times. Memory: the
    reverse pass stores one (t, h, y)-slot per accepted step,
    ``options.adjoint_steps`` slots per lane PER SEGMENT (gradient poisoned
    with NaN on overflow).

    t_eval: optional strictly monotonic 1-D grid inside (t0, tf], ordered in
    the integration direction. The solve is CHAINED over the segments
    t0 → t_eval[0] → … → t_eval[-1], each an adaptive solve warm-started
    with the previous segment's step proposal, so samples are exact solve
    endpoints (the radau_adjoint convention, solve/adjoint.py:100-110).
    Integration stops at t_eval[-1] — include tf to get the endpoint.

    events: optional TERMINAL event spec(s) (every event must be terminal —
    the radau_adjoint constraint). Returns ``(y, t)``: the state and time a
    lane stopped at (y*, t* on triggered lanes — lane triggered ⟺
    t[i] != tf). BOTH are reverse-differentiable: the discrete adjoint's
    event jump is the vjp of the triggering step's replayed CONTRO-cubic
    endpoint with θ* re-polished by a differentiable Newton step from the
    recorded root (the implicit-function correction falls out of AD —
    starting at a converged root, one polished iteration's derivative
    equals the IFT derivative to O(residual)). Composes with t_eval (the
    dopri/radau seg_ev convention): returns ``(ys, y*, t*)`` with samples
    strictly past t* NaN — a triggered lane's later segments collapse to
    zero-length t* → t* solves whose boundary cotangents cancel.

    cost: optional running-cost integrand ``l(t[M], y[M,D], args) -> [M]``
    (or ``[M, Q]``). Appends ``q = ∫ l dt`` (``solve_rodas(quad=...)``, the
    CVODES quadrature role) to the outputs — ``(y, q)``, ``(ys, q)`` with
    t_eval (q summed over the grid span), ``(y, t_term, q)`` with events
    (q truncated at t*) — and q's cotangent flows through the SAME
    backward sweep: each recorded step's replay also recomputes its GL-3
    quadrature increment on the replayed CONTRO cubic (bit-identical to
    the forward accumulation), so q̄ pulls are exact discrete-adjoint
    gradients of the computed q. Integral-cost (Lagrange) objectives at
    one backward sweep, no state augmentation — the reverse twin of the
    CVODES forward quadrature sensitivities
    (reference examples/cpp/for_sens_vdp_example.cpp:1-38).
    """
    opts = options if options is not None else Options()
    use_cost = cost is not None
    if n_alg and mass is None:
        raise ValueError("n_alg > 0 (semi-explicit index-1 DAE boundary "
                         "velocity) needs mass=blockdiag(A, 0); without a "
                         "mass matrix the system is an ODE")
    if opts.pallas_lu:
        raise ValueError("rodas_adjoint replays steps under jax.vjp; the "
                         "Pallas LU has no AD rules — use pallas_lu=False")
    from janus_tpu.solve.events import normalize_events
    specs = normalize_events(events)
    if specs and not all(e.terminal for e in specs):
        raise ValueError("rodas_adjoint(events=...) requires every "
                         "event terminal (non-terminal recordings have "
                         "no gradient contract)")
    cap = opts.adjoint_steps
    jac_user = jac

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = rd.solve_rodas(f, t0, tf, y0, args, opts, jac=jac_user,
                             mass=mass, events=events or None, quad=cost,
                             _h0=h0)
        if specs:
            outs = (sol.y, sol.t, sol.h_next, sol.event_idx)
        else:
            outs = (sol.y, sol.h_next)
        return outs + ((sol.quad,) if use_cost else ())

    def fwd(t0, tf, y0, args, h0):
        sol = rd.solve_rodas(f, t0, tf, y0, args, opts, jac=jac_user,
                             mass=mass, events=events or None, quad=cost,
                             _mesh_size=cap, _h0=h0)
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
            ybar, _ = out_bar            # h_next is a non-differentiable knob
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

        def step(t, h, y, dl):
            if not use_cost:
                return _one_step(fa, jac_fn, mass, opts, t, h, y, dl)
            y_new, c2, c3 = _one_step(fa, jac_fn, mass, opts, t, h, y, dl,
                                      want_interp=True)
            q_inc = _gl3_inc(lambda tt, yy: lfun(tt, yy, dl), t, h, y,
                             y_new, c2, c3, jnp.ones_like(t))
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

            def evt_endpoint(t, h, y, dl, th0):
                # (y*, t*) of the triggering step as a differentiable map:
                # replay the step, rebuild the CONTRO cubic, and re-polish
                # θ* by TWO Newton iterations from the recorded root —
                # starting converged, the polished iterate's derivative
                # equals the implicit-function derivative to O(residual²).
                # With cost=: the lane's LAST quadrature increment is the
                # GL-3 rule truncated at θ* (the forward's event-lane
                # convention), so dq/dt* also falls out of the vjp.
                y_new, c2, c3 = _one_step(fa, jac_fn, mass, opts, t, h, y,
                                          dl, want_interp=True)

                def yi(th):
                    e = th[:, None]
                    return (y * (1.0 - e)
                            + e * (y_new + (1.0 - e) * (c2 + e * c3)))

                def gfun(th):
                    return g_sel(t + th * h, yi(th), dl)

                th = th0
                for _ in range(2):
                    gv, dg = jax.jvp(gfun, (th,), (jnp.ones_like(th),))
                    th = th - gv / jnp.where(dg == 0.0, 1.0, dg)
                outs = (yi(th), t + th * h)
                if use_cost:
                    outs = outs + (_gl3_inc(
                        lambda tt, yy: lfun(tt, yy, dl), t, h, y, y_new,
                        c2, c3, th),)
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
                lam_in = jnp.where(live[:, None], lam, 0.0)
                if specs:
                    # the triggering lane's LAST live slot carries the
                    # whole (ȳ*, t̄*) cotangent through the event endpoint
                    # instead of the plain step map
                    is_evt = live & triggered & (k == nacc - 1)
                    lam_in = jnp.where(is_evt[:, None], 0.0, lam_in)
                _, pull = jax.vjp(
                    lambda yy, dl: step(tk, hk, yy, dl), yk, dleaves)
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
                            lambda yy, dl: evt_endpoint(tk, hk, yy, dl,
                                                        th0), yk, dleaves)
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

        # boundary-time cotangents: t̄₀ = −λ₀·ẏ(t₀), t̄_f = ȳ·ẏ(T) with the
        # TRUE velocity — M⁻¹f (invertible mass) or, with ``n_alg``, the
        # index-1 DAE's constrained velocity ẋ = A⁻¹f_x,
        # ż = −g_z⁻¹(g_t + g_x ẋ) (the continuous adjoint's formula)
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
        raise ValueError("rodas_adjoint(t_eval=...) chains segments over a "
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
        # events + t_eval: chain the sample segments per lane; once a lane
        # triggers, its later segments are ZERO-LENGTH solves t* → t* (the
        # identity — their boundary cotangents cancel, so the event pull
        # applied in the triggering segment's backward pass carries the
        # whole gradient). Samples past t* are NaN (the forward solvers'
        # truncation convention); the sample exactly AT t* (a trigger on a
        # segment boundary) stays valid. The radau/dopri adjoint
        # convention (solve/adjoint.py seg_ev, adjoint_dopri.py).
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
