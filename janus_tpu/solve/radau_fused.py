"""Fused SoA Radau5: the ENTIRE step attempt as one Pallas TPU kernel.

The measured bottleneck of the lockstep driver is not FLOPs or bandwidth but
the ~7 µs-per-XLA-op overhead × ~100 ops per step. Here the whole attempt —
Jacobian (forward-mode, inlined user f), factorization, the simplified-Newton
loop, error estimate, and the step controller — runs inside a single Pallas
kernel over VMEM-resident state, with the trajectory batch on the lane
dimension (SoA: every state component is a [M] row).

TPU-first design twist: Jacobian and LU are RECOMPUTED every attempt. The
reference's elaborate reuse machinery (NeedNewJac/NeedNewQR,
radaute_impl.hpp:600-704) pays off when factorization is expensive relative
to f; in VMEM at D ≲ 8 a pivot-free factorization is a few dozen VPU ops per
lane, so recomputation is cheaper than the bookkeeping — and fresh Jacobians
make Newton converge in fewer iterations.

Scope: fixed s=3, identity mass, final state only (no t_eval/events — use
solve_radau for those), args leaves of shape [M] or scalar. Matches
solve_radau numerically (1e-10 on heterogeneous stiff VdP) up to the
jac-refresh policy.

MEASURED OUTCOME (v5e-1, 65k VdP µ=1e3, f32 rtol 1e-4): compiles in ~114 s
and runs CORRECTLY on chip, but at 173k traj/s vs the lockstep driver's
2.4M — the fixed-trip Newton loop always pays 6 iterations (no early exit
inside the kernel), the fresh-Jacobian policy adds f-evals, and the Pallas
grid iterates blocks sequentially on the single TensorCore. The masked
lockstep XLA driver remains the production path; this module stands as the
measured design study (and a working template for partial fusions).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from janus_tpu.solve import common as cm
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau_tables import radau_tableau

DEFAULT_TILE = 512
NEWTON_MAXITER = 6


def _row_layout(dim: int):
    """Named row offsets into the packed f32 state matrix."""
    rows = {}
    off = 0

    def add(name, n):
        nonlocal off
        rows[name] = off
        off += n

    add("t", 1)
    add("y", dim)
    add("f0", dim)
    add("h", 1)
    add("h_old", 1)
    add("err_old", 1)
    add("q", 3 * dim)          # collocation poly coeffs (warm start)
    add("h_prev", 1)
    # flags / counters kept as f32 rows (0/1 or small counts)
    add("active", 1)
    add("rejected", 1)
    add("have_sol", 1)
    add("nsing", 1)
    add("status", 1)
    add("nsteps", 1)
    add("naccept", 1)
    add("nreject", 1)
    add("nfev", 1)
    add("nnewton", 1)
    return rows, off


def _solve_lu_rows(lu, rhs, d):
    """Forward/back substitution on row-vector representation.
    lu: d×d list-of-lists of [T] vectors (packed L\\U); rhs: list of d [T]."""
    y = list(rhs)
    for i in range(1, d):
        for j in range(i):
            y[i] = y[i] - lu[i][j] * y[j]
    x = [None] * d
    for i in reversed(range(d)):
        acc = y[i]
        for j in range(i + 1, d):
            acc = acc - lu[i][j] * x[j]
        x[i] = acc / lu[i][i]
    return x


def _factor_rows(a, d):
    """In-place pivot-free elimination on row-vector matrix a (d×d of [T])."""
    for k in range(d):
        inv = 1.0 / a[k][k]
        for i in range(k + 1, d):
            m = a[i][k] * inv
            a[i][k] = m
            for j in range(k + 1, d):
                a[i][j] = a[i][j] - m * a[k][j]
    return a


def solve_radau_fused(f: Callable, t0, tf, y0, args=None,
                      options: Optional[Options] = None,
                      tile: int = DEFAULT_TILE,
                      interpret: bool = False) -> cm.Solution:
    """Batched Radau5 with the fused one-kernel step (see module docstring)."""
    opts = options if options is not None else Options()
    tab = radau_tableau(3)
    t0, tf, y0 = cm.broadcast_batch(t0, tf, y0)
    m, dim = y0.shape
    dtype = y0.dtype
    rows, n_rows = _row_layout(dim)

    # pad the batch to a tile multiple (inactive padding lanes)
    m_pad = ((m + tile - 1) // tile) * tile
    pad = m_pad - m

    # SoA args: flatten pytree; leaves broadcast to [M] rows
    leaves, treedef = jax.tree_util.tree_flatten(args)
    arg_rows = []
    for leaf in leaves:
        leaf = jnp.asarray(leaf, dtype)
        if leaf.ndim == 0:
            leaf = jnp.broadcast_to(leaf, (m,))
        elif leaf.shape[0] != m or leaf.ndim != 1:
            raise ValueError(
                "solve_radau_fused supports scalar or [M] args leaves only")
        arg_rows.append(jnp.pad(leaf, (0, pad)))
    args_mat = (jnp.stack(arg_rows) if arg_rows
                else jnp.zeros((1, m_pad), dtype))

    def f_soa(t_vec, y_rows, arg_ref):
        """Standard batched f applied to SoA rows inside the kernel."""
        y_std = jnp.stack(y_rows, axis=-1)             # [T, D]
        if leaves:
            leaves_t = [arg_ref[i, :] for i in range(len(leaves))]
            a = jax.tree_util.tree_unflatten(treedef, leaves_t)
        else:
            a = args
        out = f(t_vec, y_std, a)
        return [out[:, i] for i in range(dim)]

    # tableau constants
    mu_r = float(tab.mu_real)
    mu_cr = float(tab.mu_complex[0].real)
    mu_ci = float(tab.mu_complex[0].imag)
    c_nodes = [float(c) for c in tab.c]
    t_mat = np.asarray(tab.t_mat)
    ti_mat = np.asarray(tab.ti_mat)
    e_vec = [float(e) for e in tab.e]
    p_mat = np.asarray(tab.p)
    newton_tol = (opts.newton_tol if opts.newton_tol > 0
                  else cm.derived_newton_tol(dtype, opts.rtol))
    eps = float(jnp.finfo(dtype).eps)
    rtol, atol = float(opts.rtol), float(opts.atol)
    safety0 = float(opts.safety)
    facl, facr = float(opts.min_factor), float(opts.max_factor)
    quot1, quot2 = float(opts.quot1), float(opts.quot2)
    max_steps = float(opts.max_steps)

    def kernel(tf_ref, arg_ref, st_ref, out_ref):
        R = lambda name, i=0: st_ref[rows[name] + i, :]
        tfv = tf_ref[0, :]
        t = R("t")
        y = [R("y", i) for i in range(dim)]
        f0 = [R("f0", i) for i in range(dim)]
        h = R("h")
        active = R("active") > 0.5

        remaining = tfv - t
        last = jnp.abs(h) >= jnp.abs(remaining)
        h = jnp.where(last, remaining, h)
        h = jnp.where(h == 0.0, eps, h)

        # ---- Jacobian by forward-mode of the inlined f -------------------
        y_std = jnp.stack(y, axis=-1)

        def f_std(yy):
            out = f_soa(t, [yy[:, i] for i in range(dim)], arg_ref)
            return jnp.stack(out, axis=-1)

        jac = [[None] * dim for _ in range(dim)]
        for jcol in range(dim):
            # one-hot tangent built from kernel values (a captured jnp
            # constant array is rejected by pallas_call; scatter won't lower)
            tang = jnp.stack([jnp.full_like(t, 1.0 if i == jcol else 0.0)
                              for i in range(dim)], axis=-1)
            _, col = jax.jvp(f_std, (y_std,), (tang,))
            for irow in range(dim):
                jac[irow][jcol] = col[:, irow]

        # ---- factorizations (pivot-free, in VMEM) ------------------------
        ar = [[(mu_r / h if i == j else 0.0) - jac[i][j]
               for j in range(dim)] for i in range(dim)]
        lu_r = _factor_rows(ar, dim)
        # split-real complex block [[Ar, -Ai],[Ai, Ar]], Ar = re/h I - J,
        # Ai = im/h I
        d2 = 2 * dim
        ac = [[None] * d2 for _ in range(d2)]
        for i in range(dim):
            for j in range(dim):
                arij = (mu_cr / h if i == j else 0.0) - jac[i][j]
                aiij = (mu_ci / h) if i == j else 0.0
                ac[i][j] = arij
                ac[i][j + dim] = -aiij if i == j else jnp.zeros_like(h)
                ac[i + dim][j] = aiij if i == j else jnp.zeros_like(h)
                ac[i + dim][j + dim] = arij
        lu_c = _factor_rows(ac, d2)

        # ---- Newton warm start -------------------------------------------
        have_sol = R("have_sol") > 0.5
        h_prev = R("h_prev")
        q = [[R("q", s * dim + i) for i in range(dim)] for s in range(3)]
        # q rows hold poly coeffs Q_q[i]; poly(theta) = sum_q Q_q theta^{q+1}
        z = [[None] * dim for _ in range(3)]
        for s in range(3):
            th = 1.0 + c_nodes[s] * (h / h_prev)
            for i in range(dim):
                poly = (q[0][i] * th + q[1][i] * th * th
                        + q[2][i] * th * th * th)
                poly1 = q[0][i] + q[1][i] + q[2][i]
                z[s][i] = jnp.where(have_sol, poly - poly1,
                                    jnp.zeros_like(h))
        w = [[None] * dim for _ in range(3)]
        for s in range(3):
            for i in range(dim):
                w[s][i] = (ti_mat[s][0] * z[0][i] + ti_mat[s][1] * z[1][i]
                           + ti_mat[s][2] * z[2][i])

        scale = [atol + rtol * jnp.abs(y[i]) for i in range(dim)]

        # ---- simplified Newton (masked fixed-trip loop) ------------------
        # carry is a FLAT tuple of f32 [T] vectors: Mosaic's scf.for
        # legalization rejects nested/bool carries
        def pack(w, z, dwn_old, rate, running, converged, niter, nfev):
            flat = [w[s][i] for s in range(3) for i in range(dim)]
            flat += [z[s][i] for s in range(3) for i in range(dim)]
            flat += [dwn_old, rate, running.astype(t.dtype),
                     converged.astype(t.dtype), niter, nfev]
            return tuple(flat)

        def unpack(flat):
            w = [[flat[s * dim + i] for i in range(dim)] for s in range(3)]
            off = 3 * dim
            z = [[flat[off + s * dim + i] for i in range(dim)]
                 for s in range(3)]
            off += 3 * dim
            return (w, z, flat[off], flat[off + 1], flat[off + 2] > 0.5,
                    flat[off + 3] > 0.5, flat[off + 4], flat[off + 5])

        def newton_body(k, carry):
            w, z, dwn_old, rate, running, converged, niter, nfev = \
                unpack(carry)
            # all three stages in ONE f call (3T lanes)
            t_st = jnp.concatenate([t + c_nodes[s] * h for s in range(3)])
            y_st = jnp.concatenate(
                [jnp.stack([y[i] + z[s][i] for i in range(dim)], axis=-1)
                 for s in range(3)], axis=0)
            targ = jnp.concatenate([arg_ref[:, :], arg_ref[:, :],
                                    arg_ref[:, :]], axis=-1) \
                if leaves else arg_ref
            if leaves:
                lt = [targ[i, :] for i in range(len(leaves))]
                a3 = jax.tree_util.tree_unflatten(treedef, lt)
            else:
                a3 = args
            fs_std = f(t_st, y_st, a3)                 # [3T, D]
            tsz = t.shape[0]
            fst = [[fs_std[s * tsz:(s + 1) * tsz, i] for i in range(dim)]
                   for s in range(3)]
            finite = jnp.ones_like(t, dtype=bool)
            for s in range(3):
                for i in range(dim):
                    finite = finite & jnp.isfinite(fst[s][i])

            # transformed residuals
            tif = [[ti_mat[s][0] * fst[0][i] + ti_mat[s][1] * fst[1][i]
                    + ti_mat[s][2] * fst[2][i]
                    for i in range(dim)] for s in range(3)]
            rhs_r = [tif[0][i] - (mu_r / h) * w[0][i] for i in range(dim)]
            dw0 = _solve_lu_rows(lu_r, rhs_r, dim)
            rhs_c = ([tif[1][i] - (mu_cr * w[1][i] - mu_ci * w[2][i]) / h
                      for i in range(dim)]
                     + [tif[2][i] - (mu_cr * w[2][i] + mu_ci * w[1][i]) / h
                        for i in range(dim)])
            dwc = _solve_lu_rows(lu_c, rhs_c, d2)
            dw = [dw0, dwc[:dim], dwc[dim:]]

            ssum = jnp.zeros_like(t)
            for s in range(3):
                for i in range(dim):
                    r = dw[s][i] / scale[i]
                    ssum = ssum + r * r
            dwn = jnp.sqrt(ssum / (3 * dim))
            have = k > 0
            rt = jnp.where(have & (dwn_old > 0),
                           dwn / jnp.where(dwn_old == 0, 1.0, dwn_old), 0.0)
            srt = jnp.clip(rt, 1e-16, 1.0 - 1e-16)
            left = jnp.asarray(NEWTON_MAXITER - k, dtype)
            div = have & ((rt >= 1.0)
                          | (srt ** left / (1 - srt) * dwn > newton_tol))
            failn = running & (~finite | div)
            app = running & ~failn
            w = [[jnp.where(app, w[s][i] + dw[s][i], w[s][i])
                  for i in range(dim)] for s in range(3)]
            z = [[jnp.where(app,
                            t_mat[s][0] * w[0][i] + t_mat[s][1] * w[1][i]
                            + t_mat[s][2] * w[2][i],
                            z[s][i])
                  for i in range(dim)] for s in range(3)]
            cnow = app & ((dwn == 0.0)
                          | (have & (rt < 1.0)
                             & (srt / (1 - srt) * dwn < newton_tol)))
            niter = jnp.where(running, (k + 1).astype(dtype)
                              if hasattr(k, "astype")
                              else jnp.asarray(k + 1, dtype), niter)
            nfev = nfev + jnp.where(running, 3.0, 0.0)
            running = running & ~failn & ~cnow
            return pack(w, z, jnp.where(app, dwn, dwn_old),
                        jnp.where(have, rt, rate), running,
                        converged | cnow, niter, nfev)

        run0 = active
        carry = pack(w, z, jnp.zeros_like(t), jnp.zeros_like(t), run0,
                     jnp.zeros_like(run0, dtype=bool), jnp.zeros_like(t),
                     jnp.zeros_like(t))
        carry = jax.lax.fori_loop(0, NEWTON_MAXITER, newton_body, carry)
        w, z, _, rate, _, converged, niter, nfev_n = unpack(carry)
        conv = active & converged
        newton_fail = active & ~converged

        # ---- error estimate ----------------------------------------------
        y_new = [y[i] + z[2][i] for i in range(dim)]
        ze = [(e_vec[0] * z[0][i] + e_vec[1] * z[1][i]
               + e_vec[2] * z[2][i]) / h for i in range(dim)]
        err = _solve_lu_rows(lu_r, [f0[i] + ze[i] for i in range(dim)], dim)
        esum = jnp.zeros_like(t)
        for i in range(dim):
            sc = atol + rtol * jnp.maximum(jnp.abs(y[i]), jnp.abs(y_new[i]))
            r = err[i] / sc
            esum = esum + r * r
        enorm1 = jnp.sqrt(esum / dim)
        enorm1 = jnp.where(jnp.isfinite(enorm1), enorm1, 1e10)
        rejected = R("rejected") > 0.5
        # refined estimate (always computed — one extra f eval is cheap here)
        ye = [y[i] + err[i] for i in range(dim)]
        fe = f_soa(t, ye, arg_ref)
        err2 = _solve_lu_rows(lu_r, [fe[i] + ze[i] for i in range(dim)], dim)
        esum2 = jnp.zeros_like(t)
        for i in range(dim):
            sc = atol + rtol * jnp.maximum(jnp.abs(y[i]), jnp.abs(y_new[i]))
            r = err2[i] / sc
            esum2 = esum2 + r * r
        enorm2 = jnp.sqrt(esum2 / dim)
        enorm2 = jnp.where(jnp.isfinite(enorm2), enorm2, 1e10)
        enorm = jnp.where(rejected & (enorm1 > 1.0), enorm2, enorm1)
        enorm = jnp.maximum(enorm, 1e-16)

        accept = conv & (enorm <= 1.0)
        reject_err = conv & (enorm > 1.0)

        # ---- controller ---------------------------------------------------
        h_abs = jnp.abs(h)
        h_old = R("h_old")
        err_old = R("err_old")
        niter_s = jnp.maximum(niter, 1.0)
        safety = safety0 * (2 * NEWTON_MAXITER + 1) / (2 * NEWTON_MAXITER
                                                       + niter_s)
        have_old = (h_old > 0) & (err_old > 0)
        mult = jnp.where(have_old,
                         h_abs / jnp.where(h_old == 0, 1.0, h_old)
                         * (err_old / enorm) ** 0.25, 1.0)
        base = jnp.minimum(1.0, mult) * enorm ** -0.25
        fac_rej = jnp.maximum(facl, safety * base)
        fac_acc = jnp.clip(safety * base, facl, facr)
        deadzone = accept & (fac_acc >= quot1) & (fac_acc < quot2)
        fac_acc = jnp.where(deadzone, 1.0, fac_acc)

        # ---- f at the accepted point --------------------------------------
        t_new = t + h
        f_new = f_soa(t_new, y_new, arg_ref)

        # ---- bookkeeping --------------------------------------------------
        nsing = R("nsing")
        nsing = jnp.where(newton_fail, nsing + 1.0,
                          jnp.where(accept, 0.0, nsing))
        stall = active & (nsing >= 7.0)
        nsteps = R("nsteps") + jnp.where(active, 1.0, 0.0)
        done = accept & last
        exceeded = active & (nsteps >= max_steps) & ~done
        h_next = jnp.where(accept, h_abs * fac_acc,
                           jnp.where(reject_err, h_abs * fac_rej,
                                     jnp.where(newton_fail, h_abs * 0.5,
                                               h_abs)))
        # Hairer's t-relative underflow test (cf. solve/radau.py)
        underflow = active & (0.1 * h_next <= eps * jnp.abs(t_new)) & ~done

        status = R("status")
        status = jnp.where(done, float(cm.SUCCESS), status)
        status = jnp.where(exceeded, float(cm.MAX_STEPS), status)
        status = jnp.where(underflow, float(cm.STEP_UNDERFLOW), status)
        status = jnp.where(stall, float(cm.NEWTON_STALL), status)
        active_n = active & ~done & ~exceeded & ~underflow & ~stall

        # ---- write back ---------------------------------------------------
        W = lambda name, val, i=0: out_ref.__setitem__(
            (rows[name] + i, slice(None)), val)
        W("t", jnp.where(accept, t_new, t))
        for i in range(dim):
            W("y", jnp.where(accept, y_new[i], y[i]), i)
            W("f0", jnp.where(accept, f_new[i], f0[i]), i)
        W("h", jnp.where(active, h_next * jnp.sign(h), R("h")))
        W("h_old", jnp.where(accept, h_abs, h_old))
        W("err_old", jnp.where(accept, enorm, err_old))
        # dense/warm-start poly coeffs: Q_q[i] = sum_s z[s][i] * P[s][q]
        for qq in range(3):
            for i in range(dim):
                val = (z[0][i] * p_mat[0][qq] + z[1][i] * p_mat[1][qq]
                       + z[2][i] * p_mat[2][qq])
                W("q", jnp.where(accept, val, q[qq][i]), qq * dim + i)
        W("h_prev", jnp.where(accept, h, h_prev))
        W("active", jnp.where(active_n, 1.0, 0.0))
        W("rejected", jnp.where(accept, 0.0,
                                jnp.where(reject_err | newton_fail, 1.0,
                                          R("rejected"))))
        W("have_sol", jnp.where(accept, 1.0, R("have_sol")))
        W("nsing", nsing)
        W("status", status)
        W("nsteps", nsteps)
        W("naccept", R("naccept") + jnp.where(accept, 1.0, 0.0))
        W("nreject", R("nreject")
          + jnp.where(reject_err | newton_fail, 1.0, 0.0))
        W("nfev", R("nfev") + jnp.where(active, nfev_n + 2.0 + dim, 0.0))
        W("nnewton", R("nnewton") + niter)

    # ---- build initial packed state --------------------------------------
    f0 = f(t0, y0, args)
    if opts.h0 == 0.0:
        h0 = cm.initial_step(f, t0, y0, f0, tf, 3, opts.rtol, opts.atol,
                             args, opts.max_step)
    else:
        direction = jnp.where(tf >= t0, 1.0, -1.0).astype(dtype)
        h0 = jnp.broadcast_to(jnp.asarray(opts.h0, dtype), (m,)) * direction

    st = jnp.zeros((n_rows, m_pad), dtype)

    def put(name, val, i=0):
        nonlocal st
        st = st.at[rows[name] + i, :m].set(val)

    put("t", t0)
    for i in range(dim):
        put("y", y0[:, i], i)
        put("f0", f0[:, i], i)
    put("h", h0)
    put("h_prev", jnp.ones((m,), dtype))
    put("active", (t0 != tf).astype(dtype))
    put("status", jnp.where(t0 == tf, float(cm.SUCCESS),
                            float(cm.RUNNING)).astype(dtype))
    tf_row = jnp.zeros((1, m_pad), dtype).at[0, :m].set(tf)

    n_args_rows = args_mat.shape[0]
    grid = (m_pad // tile,)
    bs = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

    step = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, m_pad), dtype),
        grid=grid,
        in_specs=[bs(1), bs(n_args_rows), bs(n_rows)],
        out_specs=bs(n_rows),
        input_output_aliases={2: 0},
        interpret=interpret,
    )

    def cond(stx):
        return jnp.any(stx[rows["active"], :] > 0.5)

    def body(stx):
        return step(tf_row, args_mat, stx)

    final = jax.lax.while_loop(cond, body, st)

    y_fin = jnp.stack([final[rows["y"] + i, :m] for i in range(dim)], axis=-1)
    stats = {k: final[rows[k], :m].astype(jnp.int32)
             for k in ("nsteps", "naccept", "nreject", "nfev", "nnewton")}
    return cm.Solution(
        t=final[rows["t"], :m],
        y=y_fin,
        status=final[rows["status"], :m].astype(jnp.int8),
        stats=stats,
    )
