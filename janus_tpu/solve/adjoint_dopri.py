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

Scope: terminal mode and ``t_eval=`` trajectory sampling (chained
warm-started adaptive segments, the radau/rodas/seulex adjoint
convention); events raise — use radau_adjoint for event-truncated losses.
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
from janus_tpu.solve.dopri import TABLEAUS, solve_erk
from janus_tpu.solve.options import Options


def _one_step(tab, f, t, h, y, args, live=None):
    """Replay ONE accepted explicit-RK step at frozen (t, h) — the
    differentiable step map Φ. Mirrors solve/dopri.py _stages exactly
    (stage 0 = fresh f(t, y) = the FSAL value, see module docstring); the
    trailing FSAL evaluation f(t+h, y1) does not feed y1 and is omitted.
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
    return y + h[:, None] * acc


def dopri_adjoint(f: Callable, tspan, y0, args=None,
                  options: Optional[Options] = None, t_eval=None,
                  method: str = "dopri5"):
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
    """
    if method not in TABLEAUS:
        raise ValueError(f"dopri_adjoint: unknown method {method!r}; "
                         f"choose from {sorted(TABLEAUS)}")
    tab = TABLEAUS[method]
    opts = options if options is not None else Options()
    cap = opts.adjoint_steps

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = solve_erk(tab, f, t0, tf, y0, args, opts, _h0=h0)
        return sol.y, sol.h_next

    def fwd(t0, tf, y0, args, h0):
        sol = solve_erk(tab, f, t0, tf, y0, args, opts, _mesh_size=cap,
                        _h0=h0)
        return (sol.y, sol.h_next), (sol.mesh, sol.stats["naccept"], t0, tf,
                                     y0, args, sol.y, sol.t, h0)

    def bwd(res, out_bar):
        ybar, _ = out_bar            # h_next is a non-differentiable knob
        mesh, nacc, t0, tf, y0, args, yT, t_end, h0 = res
        t0b, tfb, y0b = cm.broadcast_batch(t0, tf, y0)
        m, dim = y0b.shape
        dtype = y0b.dtype
        ybar = jnp.asarray(ybar, dtype)

        dleaves, rebuild, leaves, treedef, diff_idx = _split_diff(args)

        def fa(t, y, dl):
            return f(t, y, rebuild(dl))

        gl0 = [jnp.zeros(jnp.shape(l), dtype) for l in dleaves]

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
            _, pull = jax.vjp(
                lambda yy, dl: _one_step(tab, fa, tk, hk, yy, dl,
                                         live=live), yk, dleaves)
            dy, dgl = pull(jnp.where(live[:, None], lam, 0.0))
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
