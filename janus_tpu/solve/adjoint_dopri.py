"""Discrete-adjoint reverse mode on the batched Dormand-Prince solvers.

``dopri_adjoint`` returns the final state of an adaptive ``solve_erk`` run
(dopri5 or dopri853) as a ``jax.custom_vjp`` whose backward pass is the
exact transpose of the solver's step map on the recorded accepted-step
mesh. One accepted explicit-RK step is a closed-form composition of stage
evaluations

    y_{n+1} = Φ(t_n, h_n, y_n, θ) = y_n + h_n Σ_j b_j k_j

so its vjp (``jax.vjp`` of a replay at the recorded (t_n, h_n)) is exact to
machine precision — this is reverse mode through the ADAPTIVE explicit
family, the neural-ODE training workhorse (torchdiffeq/diffrax's
"discretize-then-optimize" role), which previously only had forward-mode
(jvp/jet) here. The backward pass is a ``lax.scan`` over steps with
per-lane live masks and benign-value substitution on dead mesh slots (the
solve/adjoint_rodas.py mechanics; each backward step costs one ~s-stage
replay + its reverse sweep, about 3 forward steps of work).

Replay exactness needs NO forward-pass change: the FSAL derivative the
driver carries always equals a fresh ``f(t_n, y_n)`` (it was evaluated at
exactly that point when the previous step was accepted — solve/dopri.py
``f0_n``), so the replay's stage-0 evaluation reproduces the forward
stages bit-for-bit (asserted in tests/test_adjoint_dopri.py).

Frozen-mesh convention: (t_n, h_n) are data; against FD of the full solver
the gradients differ by the controller's O(local error) = O(rtol)
sensitivity — the rodas_adjoint/IND accuracy contract, including the
long-limit-cycle amplification caution (tighten rtol on oscillatory
horizons). Dead mesh slots replay the identity: the stage cascade is
masked to zero RHS for non-live lanes, because an explicit stage cascade
at a benign substitute point with stiff parameters can overflow to inf and
0-cotangent x inf = NaN pollutes per-lane arg-leaf gradients (lane-masked
cotangents do NOT protect leaf cotangents — the recorded rodas/seulex
dead-slot lesson).

Scope: terminal mode, ``t_eval=`` trajectory sampling (chained
warm-started adaptive segments, the radau/rodas/seulex adjoint
convention), and terminal ``events=`` — ``(y*, t*)`` both
reverse-differentiable via the vjp of the triggering step's replayed
dense interpolant with a differentiable Newton re-polish of θ* (the
rodas_adjoint event mechanics; events + t_eval stays on radau_adjoint).
The reference's explicit family has forward duals only
(src/cpp/dopri853ted.hpp — every state a TensorDual).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.solve import common as cm
from janus_tpu.solve.adjoint import _split_diff
from janus_tpu.solve.dopri import (TABLEAUS, solve_erk, _dense_eval_rk45,
                                   _dense_eval_dop853, _dop853_fall)
from janus_tpu.solve.options import Options


def _one_step(tab, f, t, h, y, args, live=None, want_interp=False):
    """Replay ONE accepted explicit-RK step at frozen (t, h) — the
    differentiable step map Φ. Mirrors solve/dopri.py _stages exactly
    (stage 0 = fresh f(t, y) = the FSAL value, see module docstring); the
    trailing FSAL evaluation f(t+h, y1) does not feed y1 and is omitted
    unless ``want_interp`` asks for the step's dense interpolant (the
    event endpoint needs it — rk45's quartic uses f_new's row of P;
    dop853 rebuilds the 3 extra interpolation stages too).
    ``live`` masks the RHS to zero for lanes replaying a dead mesh slot, so
    their cascade is the identity (explicit stages can overflow at benign
    substitute points with stiff parameters)."""

    def feval(tt, yy):
        fv = f(tt, yy, args)
        return fv if live is None else jnp.where(live[:, None], fv, 0.0)

    ks = [feval(t, y)]
    for i in range(1, tab.n_stages):
        acc = ks[0] * tab.a[i, 0]
        for j in range(1, i):
            if tab.a[i, j] != 0.0:
                acc = acc + ks[j] * tab.a[i, j]
        ks.append(feval(t + tab.c[i] * h, y + h[:, None] * acc))
    acc = None
    for j in range(tab.n_stages):
        if tab.b[j] != 0.0:
            term = ks[j] * tab.b[j]
            acc = term if acc is None else acc + term
    y1 = y + h[:, None] * acc
    if not want_interp:
        return y1
    f_new = feval(t + h, y1)
    if tab.dense == "rk45P":
        interp = _dense_eval_rk45(tab, ks + [f_new], y, h)
    else:
        fall = _dop853_fall(tab, lambda tt, yy, aa: feval(tt, yy),
                            t, y, y1, f_new, h, ks + [f_new], args)
        interp = _dense_eval_dop853(fall, y)
    return y1, interp


def dopri_adjoint(f: Callable, tspan, y0, args=None,
                  options: Optional[Options] = None, t_eval=None,
                  method: str = "dopri5", events=None):
    """Reverse-differentiable batched adaptive Dormand-Prince solve.

    Returns the final state y(T) [M, D], or — with ``t_eval`` — the sampled
    trajectory ys [M, T, D]. ``jax.grad``/``jax.vjp`` of any function of the
    result flows through the discrete adjoint w.r.t. y0, every inexact leaf
    of ``args``, t0, tf, and (in t_eval mode) the sample times. Memory: the
    reverse pass stores one (t, h, y)-slot per accepted step,
    ``options.adjoint_steps`` slots per lane PER SEGMENT (gradient poisoned
    with NaN on overflow).

    method: 'dopri5' (7 stages, order 5) or 'dopri853' (13 stages, order 8).

    t_eval: optional strictly monotonic 1-D grid inside (t0, tf], ordered in
    the integration direction. The solve is CHAINED over the segments
    t0 → t_eval[0] → … → t_eval[-1], each an adaptive solve warm-started
    with the previous segment's step proposal, so samples are exact solve
    endpoints (the radau_adjoint convention, solve/adjoint.py:100-110).
    Integration stops at t_eval[-1] — include tf to get the endpoint.

    events: optional TERMINAL event spec(s). Returns ``(y, t)``: the state
    and time each lane stopped at ((y*, t*) on triggered lanes), BOTH
    reverse-differentiable — the neural-ODE-with-stopping-condition
    training path. The triggering step's cotangents pull through the vjp
    of its replayed dense interpolant (the rk45 quartic / dop853 degree-7
    extension) with θ* re-polished by a differentiable Newton step from
    the recorded root (the rodas_adjoint event mechanics). Not combinable
    with t_eval here.
    """
    if method not in TABLEAUS:
        raise ValueError(f"dopri_adjoint: unknown method {method!r}; "
                         f"choose from {sorted(TABLEAUS)}")
    tab = TABLEAUS[method]
    opts = options if options is not None else Options()
    from janus_tpu.solve.events import normalize_events
    specs = normalize_events(events)
    if specs:
        if not all(e.terminal for e in specs):
            raise ValueError("dopri_adjoint(events=...) requires every "
                             "event terminal (non-terminal recordings "
                             "have no gradient contract)")
        if t_eval is not None:
            raise ValueError("dopri_adjoint: events + t_eval is not "
                             "supported on the discrete adjoint; use "
                             "radau_adjoint (continuous) for event-"
                             "truncated trajectory losses")
    cap = opts.adjoint_steps

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = solve_erk(tab, f, t0, tf, y0, args, opts,
                        events=events or None, _h0=h0)
        if specs:
            return sol.y, sol.t, sol.h_next, sol.event_idx
        return sol.y, sol.h_next

    def fwd(t0, tf, y0, args, h0):
        sol = solve_erk(tab, f, t0, tf, y0, args, opts,
                        events=events or None, _mesh_size=cap, _h0=h0)
        res = (sol.mesh, sol.stats["naccept"], t0, tf,
               y0, args, sol.y, sol.t, h0,
               sol.event_idx if specs else None)
        if specs:
            return (sol.y, sol.t, sol.h_next, sol.event_idx), res
        return (sol.y, sol.h_next), res

    def bwd(res, out_bar):
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

            def evt_endpoint(t, h, y, dl, th0, live):
                # (y*, t*) of the triggering step as a differentiable map:
                # replay the step + its dense interpolant and re-polish θ*
                # by TWO Newton iterations from the recorded root (starting
                # converged, the polished iterate's derivative equals the
                # implicit-function derivative to O(residual²))
                _, interp = _one_step(tab, fa, t, h, y, dl, live=live,
                                      want_interp=True)

                def yi(th):
                    return interp(th[:, None])[:, 0]

                def gfun(th):
                    return g_sel(t + th * h, yi(th), dl)

                th = th0
                for _ in range(2):
                    gv, dg = jax.jvp(gfun, (th,), (jnp.ones_like(th),))
                    th = th - gv / jnp.where(dg == 0.0, 1.0, dg)
                return yi(th), t + th * h

        def body(carry, k):
            lam, gl = carry
            live = k < nacc                                   # [M]
            # dead slots hold zeros; substitute a benign step whose
            # (masked) replay is the identity — its pull sees a zero
            # cotangent and contributes exact zeros. NOT cond-gated: the
            # explicit replay is a handful of fused VPU ops, far below the
            # per-cond kernel-dispatch overhead that dominated the chip
            # reading (~150 us/iter with cond vs ~us of math — the inverse
            # of the radau-adjoint regime where per-slot LU work is large);
            # unroll amortizes the remaining per-iteration scan overhead.
            tk = jnp.where(live, mesh["t"][:, k], t0b)
            hk = jnp.where(live, mesh["h"][:, k], 1.0)
            yk = jnp.where(live[:, None], mesh["y"][:, k], y0b)
            lam_in = jnp.where(live[:, None], lam, 0.0)
            if specs:
                # the triggering lane's LAST live slot carries the whole
                # (ȳ*, t̄*) cotangent through the event endpoint instead
                # of the plain step map
                is_evt = live & triggered & (k == nacc - 1)
                lam_in = jnp.where(is_evt[:, None], 0.0, lam_in)
            _, pull = jax.vjp(
                lambda yy, dl: _one_step(tab, fa, tk, hk, yy, dl,
                                         live=live), yk, dleaves)
            dy, dgl = pull(lam_in)
            if specs:
                th0 = jnp.clip(
                    (t_end - tk) / jnp.where(hk == 0.0, 1.0, hk), 0.0, 1.0)
                th0 = jnp.where(is_evt, th0, 0.5)

                def do_evt(_):
                    _, pull_e = jax.vjp(
                        lambda yy, dl: evt_endpoint(tk, hk, yy, dl, th0,
                                                    live), yk, dleaves)
                    return pull_e((jnp.where(is_evt[:, None], lam, 0.0),
                                   jnp.where(is_evt, tbar, 0.0)))

                dye, dgle = jax.lax.cond(
                    jnp.any(is_evt), do_evt,
                    lambda _: (jnp.zeros_like(lam),
                               [jnp.zeros(jnp.shape(l), dtype)
                                for l in dleaves]), None)
                dy = dy + jnp.where(is_evt[:, None], dye, 0.0)
                dgl = [g + ge for g, ge in zip(dgl, dgle)]
            return (jnp.where(live[:, None], dy, lam),
                    [g + dg for g, dg in zip(gl, dgl)]), None

        (lam0, gl), _ = jax.lax.scan(
            body, (ybar, gl0), jnp.arange(cap - 1, -1, -1), unroll=8)

        # overflow: a lane that accepted more steps than the ring holds has
        # an incomplete mesh — poison its gradient (and shared-leaf grads)
        over = nacc > cap                                     # [M]
        lam0 = jnp.where(over[:, None], jnp.nan, lam0)
        any_over = jnp.any(over)
        gl = [jnp.where(any_over, jnp.nan, g) for g in gl]

        tf_bar = jnp.sum(ybar * fa(t_end, yT, dleaves), axis=-1)    # [M]
        if specs:
            # triggered lanes stop at t* < tf (frozen mesh: tf moves
            # nothing; the (ȳ*, t̄*) pull went through the event
            # endpoint); non-triggered lanes return t = tf exactly
            tf_bar = jnp.where(triggered, 0.0, tf_bar + tbar)
        t0_bar = -jnp.sum(lam0 * fa(t0b, y0b, dleaves), axis=-1)    # [M]

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
            y, t_term, _, _ = run(t0_in, tf_in, y0, args, None)
            return y, t_term
        y, _ = run(t0_in, tf_in, y0, args, None)
        return y

    if jnp.ndim(t0_in) != 0 or jnp.ndim(tf_in) != 0:
        raise ValueError("dopri_adjoint(t_eval=...) chains segments over a "
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

    def seg(carry, bounds):
        y, h = carry
        y2, h2 = run(bounds[0], bounds[1], y, args, h)
        return (y2, h2), y2

    (_, _), ys = jax.lax.scan(seg, (y0b, h_carry0), (t_lo, t_hi))
    return jnp.swapaxes(ys, 0, 1)              # [M, T, D]
