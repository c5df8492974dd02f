"""Batched SEULEX: semi-implicit Euler + polynomial extrapolation.

The reference's primary Python solver (src/python/seulexted.py, 1396 lines of
masked order/step control with a work-model ladder, KMAXX=13). TPU re-design:
a STATIC subdivision ladder (levels gated per step by ``lax.cond`` — a level
runs only when some lane's target order requires it, the lockstep analogue of
the reference's compute-to-k_targ control flow) with per-lane order targeting
from the same work model (cost ladder per level / attainable step size;
reference seulexted.py:53-79, 245-251).

Each level k: one LU of (I − h′J), nseq[k] semi-implicit Euler substeps
reusing it (the reference's one-LU-per-k structure, seulexted.py:373,1020),
then Aitken–Neville extrapolation (:1376). No argmax/gathers anywhere —
level selection is a static select scan (TPU compile-time constraint, see
CLAUDE.md)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

from janus_tpu.linalg.smalllu import lu_factor, lu_solve, lu_ok
from janus_tpu.solve import common as cm
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import default_jacobian

NSEQ = (2, 3, 4, 6, 8, 12)       # subdivision ladder (Hairer seulex sequence)
# work model (units of one f evaluation): LU ≈ dim, solve ≈ 0.5
COST_JAC = 2.0
COST_LU = 2.0
COST_SOLVE = 0.5


@struct.dataclass
class _SxState:
    t: jnp.ndarray
    y: jnp.ndarray
    h: jnp.ndarray
    k_targ: jnp.ndarray       # [M] target level (1..K-2)
    active: jnp.ndarray
    status: jnp.ndarray
    stats: dict
    out_ys: Any


def solve_seulex(f: Callable, t0, tf, y0, args=None,
                 options: Optional[Options] = None, t_eval=None,
                 jac: Optional[Callable] = None) -> cm.Solution:
    opts = options if options is not None else Options()
    t0, tf, y0 = cm.broadcast_batch(t0, tf, y0)
    m, dim = y0.shape
    dtype = y0.dtype
    jac_fn = jac if jac is not None else default_jacobian(f)
    kmax = len(NSEQ)

    # cumulative work (in f-eval units) to compute levels 0..k
    cum_cost = []
    acc = COST_JAC
    for nj in NSEQ:
        acc += COST_LU + nj * (1.0 + COST_SOLVE)
        cum_cost.append(acc)

    f0 = f(t0, y0, args)
    if opts.h0 == 0.0:
        h = cm.initial_step(f, t0, y0, f0, tf, 4, opts.rtol, opts.atol,
                            args, opts.max_step)
    else:
        direction = jnp.where(tf >= t0, 1.0, -1.0).astype(dtype)
        h = jnp.broadcast_to(jnp.asarray(opts.h0, dtype), (m,)) * direction

    use_dense = t_eval is not None
    if use_dense:
        t_eval = jnp.asarray(t_eval, dtype)
        at_t0 = (t_eval[None, :] == t0[:, None])
        out_ys = jnp.where(at_t0[..., None], y0[:, None, :], jnp.nan)
    else:
        out_ys = jnp.zeros((), dtype)

    stats = cm.zero_stats(m, ("nfev", "njev", "nlu", "nsteps", "naccept",
                              "nreject"))
    stats["nfev"] = stats["nfev"] + 2
    already_done = t0 == tf
    state = _SxState(
        t=t0, y=y0, h=h,
        k_targ=jnp.full((m,), 3, jnp.int32),
        active=~already_done,
        status=jnp.where(already_done, cm.SUCCESS, cm.RUNNING).astype(jnp.int8),
        stats=stats, out_ys=out_ys,
    )
    eps = jnp.finfo(dtype).eps

    def cond(st):
        return jnp.any(st.active)

    def body(st):
        remaining = tf - st.t
        last = jnp.abs(st.h) >= jnp.abs(remaining)
        h = jnp.where(last, remaining, st.h)
        h = jnp.where(h == 0.0, eps, h)
        hcol = h[:, None]

        jmat = jac_fn(st.t, st.y, args)
        scale = opts.atol + opts.rtol * jnp.abs(st.y)

        # ---- gated extrapolation ladder -----------------------------------
        tline = []                         # Aitken–Neville rows (computed)
        ok_all = jnp.ones((m,), bool)
        passed = jnp.zeros((m,), bool)
        k_sel = jnp.zeros((m,), jnp.int32)
        y_sel = st.y
        err_sel = jnp.full((m,), 1e10, dtype)
        err_at = [None] * kmax             # per-level [M] errors (or None)
        computed = [jnp.zeros((m,), bool)] * kmax
        nfev_add = jnp.zeros((m,), jnp.int32)
        nlu_add = jnp.zeros((m,), jnp.int32)

        zero_row = jnp.zeros((m, dim), dtype)
        for k, nj in enumerate(NSEQ):
            need = st.active & (k <= st.k_targ + 1) & ~passed

            def do_level(_, k=k, nj=nj, need=need):
                hsub = hcol / nj
                amat = (jnp.eye(dim, dtype=dtype)[None]
                        - hsub[..., None] * jmat)
                lu, piv = lu_factor(amat, pivot=opts.pivoting)
                ok = lu_ok(lu)
                ysub = st.y
                for i in range(nj):
                    ts = st.t + (i / nj) * h
                    dy = lu_solve(lu, piv, hsub * f(ts, ysub, args))
                    ysub = ysub + dy
                return ysub, ok

            def skip_level(_):
                return zero_row, jnp.ones((m,), bool)

            ysub, ok = jax.lax.cond(jnp.any(need), do_level, skip_level, None)
            ok_all = jnp.where(need, ok_all & ok, ok_all)
            nfev_add = nfev_add + need * nj
            nlu_add = nlu_add + need * 1
            computed[k] = need

            row = [ysub]
            for j in range(k):
                ratio = NSEQ[k] / NSEQ[k - j - 1]
                row.append(row[j] + (row[j] - tline[k - 1][j])
                           / (ratio - 1.0))
            tline.append(row)

            if k >= 1:
                d = row[k] - row[k - 1]
                err_k = jnp.sqrt(jnp.mean(jnp.square(d / scale), axis=-1))
                err_k = jnp.where(jnp.isfinite(err_k), err_k, 1e10)
                err_k = jnp.maximum(err_k, 1e-16)
                err_at[k] = err_k
                pass_k = need & ok & (err_k <= 1.0)
                newly = pass_k & ~passed
                k_sel = jnp.where(newly, k, k_sel)
                y_sel = jnp.where(newly[:, None], row[k], y_sel)
                err_sel = jnp.where(newly, err_k, err_sel)
                passed = passed | pass_k

        accept = passed & st.active
        reject = st.active & ~passed

        # ---- work-model order targeting (reference cost ladder) -----------
        # candidate levels 1..kmax-1: hfac_k from err_k, work = cum_cost/hfac
        best_work = jnp.full((m,), jnp.inf, dtype)
        k_next = st.k_targ
        fac_sel = jnp.full((m,), opts.min_factor, dtype)
        for k in range(1, kmax):
            if err_at[k] is None:
                continue
            expo = 1.0 / (k + 2.0)
            fac_k = jnp.clip(opts.safety * err_at[k] ** (-expo),
                             opts.min_factor, opts.max_factor)
            work_k = cum_cost[k] / fac_k
            valid = computed[k]
            better = valid & (work_k < best_work)
            best_work = jnp.where(better, work_k, best_work)
            k_next = jnp.where(better, k, k_next)
            # step factor actually used comes from the ACCEPTED level
            fac_sel = jnp.where(accept & (k_sel == k), fac_k, fac_sel)
        # keep the target inside [1, kmax-2] and move at most one level
        k_next = jnp.clip(k_next, st.k_targ - 1, st.k_targ + 1)
        k_next = jnp.clip(k_next, 1, kmax - 2)
        k_targ_new = jnp.where(accept, k_next, st.k_targ)

        # reject: shrink from the deepest computed error
        err_deep = jnp.full((m,), 1e10, dtype)
        for k in range(1, kmax):
            if err_at[k] is not None:
                err_deep = jnp.where(computed[k], err_at[k], err_deep)
        fac_rej = jnp.clip(opts.safety * err_deep ** (-1.0 / (kmax + 1.0)),
                           opts.min_factor, 0.7)

        y_new = y_sel
        out_ys = st.out_ys
        if use_dense:
            fn = f(st.t + h, y_new, args)
            fy = f(st.t, st.y, args)

            def interp(theta):
                th = theta[..., None]
                h00 = (1 + 2 * th) * (1 - th) ** 2
                h10 = th * (1 - th) ** 2
                h01 = th * th * (3 - 2 * th)
                h11 = th * th * (th - 1)
                return (h00 * st.y[:, None] + h10 * hcol[:, None] * fy[:, None]
                        + h01 * y_new[:, None]
                        + h11 * hcol[:, None] * fn[:, None])
            out_ys = cm.collect_dense(out_ys, t_eval, st.t, h, accept, interp)

        t_new = st.t + h
        done = accept & last

        stats = dict(st.stats)
        stats["nfev"] = stats["nfev"] + nfev_add
        stats["njev"] = stats["njev"] + st.active
        stats["nlu"] = stats["nlu"] + nlu_add
        stats["nsteps"] = stats["nsteps"] + st.active
        stats["naccept"] = stats["naccept"] + accept
        stats["nreject"] = stats["nreject"] + reject

        h_next_abs = jnp.where(accept, jnp.abs(h) * fac_sel,
                               jnp.abs(h) * fac_rej)
        h_next_abs = jnp.minimum(h_next_abs, opts.max_step)
        h_next = jnp.where(st.active, h_next_abs * jnp.sign(h), st.h)
        exceeded = st.active & (stats["nsteps"] >= opts.max_steps) & ~done
        hmin = 16.0 * eps * jnp.maximum(jnp.abs(t_new), 1.0)
        underflow = st.active & (h_next_abs < hmin) & ~done

        status = st.status
        status = jnp.where(done, cm.SUCCESS, status).astype(jnp.int8)
        status = jnp.where(exceeded, cm.MAX_STEPS, status).astype(jnp.int8)
        status = jnp.where(underflow, cm.STEP_UNDERFLOW, status).astype(jnp.int8)
        active = st.active & ~done & ~exceeded & ~underflow

        return _SxState(
            t=jnp.where(accept, t_new, st.t),
            y=jnp.where(accept[:, None], y_new, st.y),
            h=h_next, k_targ=k_targ_new,
            active=active, status=status, stats=stats,
            out_ys=out_ys)

    final = jax.lax.while_loop(cond, body, state)
    return cm.Solution(
        t=final.t, y=final.y, status=final.status, stats=final.stats,
        ts=t_eval if use_dense else None,
        ys=final.out_ys if use_dense else None,
    )
