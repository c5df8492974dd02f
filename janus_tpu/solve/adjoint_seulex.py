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

Scope: terminal mode and ``t_eval=`` trajectory sampling (chained
warm-started adaptive segments, the radau/rodas adjoint convention);
events/quad raise — use radau_adjoint for those workflows. Mass matrices
supported including singular index-1 DAE masses for the y0/args gradients;
t0/tf cotangents use the continuous boundary formulas ±ȳ·ẏ with ẏ = M⁻¹f
and therefore need mass=None or invertible mass.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve import seulex as sx
from janus_tpu.solve.adjoint import _split_diff
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import _EINSUM_PRECISION, default_jacobian


def _one_step(f, jac_fn, mass, opts, t, h, y, k_rec, args, live=None):
    """Replay ONE accepted SEULEX step at frozen (t, h, k) — the
    differentiable step map Φ. Mirrors the level arithmetic of
    solve/seulex.py:349-424 exactly (minus the k<=1 stability probes and
    the error control, which do not touch the accepted value): level j
    factors A_j = M/h'_j − J once (J fresh at (t, y) — the recording
    forward ran _force_jac=True so this IS the forward matrix), runs its
    nseq[j] substeps, and the Neville diagonal at the recorded level is the
    step output. Levels are cond-gated on any(k <= k_rec); skipped levels
    contribute zeros that the one-hot level select never reads.

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
    y_sel = jnp.zeros_like(y)
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
                yt, dd = carry
                yt = yt + dd
                return yt, lu_solve(lu, piv, feval(t + (nn + 1.0) * hsub, yt))

            ytemp, d = jax.lax.fori_loop(2, nj, sub, (ytemp, d))
            return ytemp + d

        yk = jax.lax.cond(jnp.any(lvl), run_level,
                          lambda _: jnp.zeros_like(y), None)
        # zero non-live lanes (their masked replay is the identity, = y)
        # so the Neville recurrences that feed OTHER levels' selected
        # diagonals see the same zeros the gated forward ladder implies
        yk = jnp.where(lvl[:, None], yk, 0.0)
        row = [yk]
        for j in range(k):
            ratio = nseq[k] / nseq[k - j - 1]
            row.append(row[j] + (row[j] - rows[k - 1][j]) / (ratio - 1.0))
        rows.append(row)
        y_sel = jnp.where((k_rec == k)[:, None], row[k], y_sel)
    return y_sel


def seulex_adjoint(f: Callable, tspan, y0, args=None,
                   options: Optional[Options] = None,
                   jac: Optional[Callable] = None, mass=None, t_eval=None):
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
    """
    opts = options if options is not None else Options()
    cap = opts.adjoint_steps
    jac_user = jac

    t0_in, tf_in = tspan

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = sx.solve_seulex(f, t0, tf, y0, args, opts, jac=jac_user,
                              mass=mass, _h0=h0, _force_jac=True)
        return sol.y, sol.h_next

    def fwd(t0, tf, y0, args, h0):
        sol = sx.solve_seulex(f, t0, tf, y0, args, opts, jac=jac_user,
                              mass=mass, _mesh_size=cap, _h0=h0,
                              _force_jac=True)
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

        jac_fn = (lambda t, y, dl: jac_user(t, y, rebuild(dl))) if jac_user \
            else default_jacobian(fa)

        def step(t, h, y, k, dl, live):
            return _one_step(fa, jac_fn, mass, opts, t, h, y, k, dl,
                             live=live)

        gl0 = [jnp.zeros(jnp.shape(l), dtype) for l in dleaves]

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
                _, pull = jax.vjp(
                    lambda yy, dl: step(tk, hk, yy, kk, dl, live),
                    yk, dleaves)
                dy, dgl = pull(jnp.where(live[:, None], lam, 0.0))
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

        # boundary-time cotangents (continuous formulas; need M invertible)
        def ydot(t, y):
            fv = fa(t, y, dleaves)
            if mass is None:
                return fv
            mm = mass[None] if mass.ndim == 2 else mass
            mm = jnp.broadcast_to(mm, (m, dim, dim))
            lu_m, piv_m = lu_factor(mm, pivot=opts.pivoting)
            return lu_solve(lu_m, piv_m, fv)

        tf_bar = jnp.sum(ybar * ydot(t_end, yT), axis=-1)     # [M]
        t0_bar = -jnp.sum(lam0 * ydot(t0b, y0b), axis=-1)     # [M]

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

    def seg(carry, bounds):
        y, h = carry
        y2, h2 = run(bounds[0], bounds[1], y, args, h)
        return (y2, h2), y2

    (_, _), ys = jax.lax.scan(seg, (y0b, h_carry0), (t_lo, t_hi))
    return jnp.swapaxes(ys, 0, 1)              # [M, T, D]
