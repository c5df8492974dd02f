"""Explicit Dormand–Prince solvers (Dopri5, Dopri853) — batched lockstep.

Re-designs the reference's Dopri853TeD (src/cpp/dopri853ted.hpp:26-734,
src/python/dopri853ted.py) the TPU way: a single ``lax.while_loop`` advances the
whole batch; per-trajectory accept/reject, PI step control
(reference control(): dopri853ted.hpp:523), and termination are ``jnp.where``
selects on [M] masks instead of index_put_ scatter (dopri853ted.py:416-433).

Butcher tableaus and dense-output coefficient matrices are taken from scipy's
published arrays (scipy.integrate._ivp.rk / dop853_coefficients) — mathematical
constants, not reference code.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct as struct
import jax
import jax.numpy as jnp

# f32 einsums must not be demoted to bf16 MXU passes on TPU
_EINSUM_PRECISION = jax.lax.Precision.HIGHEST
import numpy as np

from janus_tpu.solve import common as cm
from janus_tpu.solve.events import (eval_events, handle_events,
                                    init_event_state, normalize_events)
from janus_tpu.solve.options import Options
from janus_tpu.diag.record import init_dyn, record_step


class ERKTableau:
    """Static explicit-RK tableau (trace-time constants)."""

    def __init__(self, name, a, b, c, order, expo1, *, e=None, e3=None, e5=None,
                 dense="hermite", p=None, a_extra=None, c_extra=None, d=None,
                 default_beta=0.0):
        self.name = name
        self.a = np.asarray(a)
        self.b = np.asarray(b)
        self.c = np.asarray(c)
        self.e = None if e is None else np.asarray(e)
        self.e3 = None if e3 is None else np.asarray(e3)
        self.e5 = None if e5 is None else np.asarray(e5)
        self.order = order
        self.expo1 = expo1          # error exponent (1/(q+1))
        self.n_stages = len(self.b)
        self.dense = dense          # 'rk45P' | 'dop853D' | 'hermite'
        self.p = None if p is None else np.asarray(p)
        self.a_extra = None if a_extra is None else np.asarray(a_extra)
        self.c_extra = None if c_extra is None else np.asarray(c_extra)
        self.d = None if d is None else np.asarray(d)
        self.default_beta = default_beta


def _tableaus():
    from scipy.integrate._ivp import rk as srk
    from scipy.integrate._ivp import dop853_coefficients as dc

    dopri5 = ERKTableau(
        "dopri5", srk.RK45.A, srk.RK45.B, srk.RK45.C, order=5, expo1=0.2,
        e=srk.RK45.E, dense="rk45P", p=srk.RK45.P, default_beta=0.04,
    )
    ns = dc.N_STAGES  # 12
    dopri853 = ERKTableau(
        "dopri853", dc.A[:ns, :ns], dc.B, dc.C[:ns], order=8, expo1=1.0 / 8.0,
        e3=srk.DOP853.E3, e5=srk.DOP853.E5, dense="dop853D",
        a_extra=dc.A[ns + 1:], c_extra=dc.C[ns + 1:], d=dc.D,
        default_beta=0.0,
    )
    return {"dopri5": dopri5, "dopri853": dopri853}


TABLEAUS = _tableaus()


@struct.dataclass
class _ERKState:
    t: jnp.ndarray
    y: jnp.ndarray
    f0: jnp.ndarray          # FSAL first-stage derivative
    h: jnp.ndarray           # signed step size
    facold: jnp.ndarray      # PI controller memory
    active: jnp.ndarray
    status: jnp.ndarray
    stats: dict
    out_ys: Any              # [M,T,D] or 0 (disabled)
    ev: Any                  # event-detection state dict
    dyn: Any                 # per-step playback (DynTe role)
    mesh: Any                # accepted-step rings for the discrete adjoint


def _stages(tab: ERKTableau, f, t, y, h, f0, args):
    """Evaluate the RK stages; returns K list of n_stages+1 arrays (incl. f_new)
    and the step solution y1."""
    ks = [f0]
    for i in range(1, tab.n_stages):
        acc = ks[0] * tab.a[i, 0]
        for j in range(1, i):
            if tab.a[i, j] != 0.0:
                acc = acc + ks[j] * tab.a[i, j]
        yi = y + h[:, None] * acc
        ks.append(f(t + tab.c[i] * h, yi, args))
    acc = None
    for j in range(tab.n_stages):
        if tab.b[j] != 0.0:
            term = ks[j] * tab.b[j]
            acc = term if acc is None else acc + term
    y1 = y + h[:, None] * acc
    f_new = f(t + h, y1, args)
    ks.append(f_new)
    return ks, y1, f_new


def _err_norm(tab: ERKTableau, ks, h, y, y1, rtol, atol):
    sc = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
    if tab.e is not None:
        err = None
        for j, ej in enumerate(tab.e):
            if ej != 0.0:
                term = ks[j] * ej
                err = term if err is None else err + term
        return cm.rms_norm(h[:, None] * err, sc)
    # DOP853 combined 5th/3rd estimate (Hairer; cf. reference
    # dopri853ted.hpp:273-298 'error()')
    def comb(evec):
        acc = None
        for j, ej in enumerate(evec):
            if ej != 0.0:
                term = ks[j] * ej
                acc = term if acc is None else acc + term
        return acc / sc
    e5 = comb(tab.e5)
    e3 = comb(tab.e3)
    e5sq = jnp.sum(jnp.square(e5), axis=-1)
    e3sq = jnp.sum(jnp.square(e3), axis=-1)
    denom = e5sq + 0.01 * e3sq
    denom = jnp.where(denom <= 0.0, 1.0, denom)
    n = y.shape[-1]
    return jnp.abs(h) * e5sq / jnp.sqrt(denom * n)


def _dense_eval_rk45(tab, ks, y, h):
    k = jnp.stack(ks, axis=1)                       # [M, 7, D]
    q = jnp.einsum("msd,sq->mqd", k, jnp.asarray(tab.p, k.dtype), precision=_EINSUM_PRECISION)

    def interp(theta):                               # [M, T] -> [M, T, D]
        npow = tab.p.shape[1]
        tp = jnp.stack([theta ** (i + 1) for i in range(npow)], axis=-1)
        return y[:, None, :] + h[:, None, None] * jnp.einsum(
            "mtq,mqd->mtd", tp, q, precision=_EINSUM_PRECISION)

    return interp


def _dop853_fall(tab, f, t, y, y1, f_new, h, ks, args):
    """Order-7 interpolant coefficient tensor [M,7,D] (3 extra f evals)."""
    k_ext = list(ks[:-1]) + [f_new]
    for arow, c in zip(tab.a_extra, tab.c_extra):
        acc = None
        for j in range(len(k_ext)):
            if arow[j] != 0.0:
                term = k_ext[j] * arow[j]
                acc = term if acc is None else acc + term
        yi = y + h[:, None] * acc
        k_ext.append(f(t + c * h, yi, args))
    kmat = jnp.stack(k_ext, axis=1)                  # [M, 16, D]
    delta = y1 - y
    f_old = ks[0]
    fpoly = [delta,
             h[:, None] * f_old - delta,
             2.0 * delta - h[:, None] * (f_new + f_old)]
    rest = jnp.einsum("qs,msd->mqd", jnp.asarray(tab.d, kmat.dtype), kmat, precision=_EINSUM_PRECISION)
    fstack = jnp.stack(fpoly, axis=1)
    return jnp.concatenate([fstack, h[:, None, None] * rest], axis=1)


def _dense_eval_dop853(fall, y):
    def interp(theta):                               # [M, T] -> [M, T, D]
        x = theta[..., None]
        acc = jnp.zeros(x.shape[:-1] + (y.shape[-1],), y.dtype)
        npoly = fall.shape[1]
        for i in range(npoly):
            fcomp = fall[:, npoly - 1 - i, :][:, None, :]
            acc = acc + fcomp
            acc = acc * (x if i % 2 == 0 else 1.0 - x)
        return acc + y[:, None, :]

    return interp


def solve_erk(tab: ERKTableau, f: Callable, t0, tf, y0, args=None,
              options: Optional[Options] = None, t_eval=None,
              events=None, _mesh_size: int = 0, _h0=None) -> cm.Solution:
    """Integrate a batch with an explicit RK method under one lax.while_loop.

    _mesh_size / _h0 are internal (solve/adjoint_dopri.py): record
    (t, h, y) rings of the accepted steps for the discrete adjoint's
    frozen-mesh step replay, and warm-start the per-lane initial step for
    segment chaining. The replay is bit-exact without any forward-pass
    change: the FSAL derivative s.f0 always equals a fresh f(t, y) at the
    step start (f_new was evaluated at exactly that point when the previous
    step was accepted), so the replay's fresh stage-0 evaluation reproduces
    the forward stages exactly.
    """
    opts = options if options is not None else Options()
    specs = normalize_events(events)
    t0, tf, y0 = cm.broadcast_batch(t0, tf, y0)
    m, dim = y0.shape
    dtype = y0.dtype
    # beta < 0 (the Options default) means "use the method's own default"
    # (0.04 for dopri5, 0.0 for dop853, Hairer's choices)
    beta = opts.beta if opts.beta >= 0 else tab.default_beta
    # Hairer: dopri5 expo1 = 0.2 - beta*0.75; dop853 expo1 = 1/8 - beta*0.2
    if tab.name == "dopri5":
        expo1 = 0.2 - beta * 0.75
    else:
        expo1 = 1.0 / 8.0 - beta * 0.2

    f0 = f(t0, y0, args)
    if _h0 is not None:
        # per-lane warm-start step (segment chaining, solve/adjoint_dopri):
        # lanes with _h0 == 0 fall back to the automatic initial step
        direction = jnp.where(tf >= t0, 1.0, -1.0).astype(dtype)
        h_mag = jnp.abs(jnp.broadcast_to(jnp.asarray(_h0, dtype), (m,)))
        h_auto = jnp.abs(cm.initial_step(f, t0, y0, f0, tf, tab.order,
                                         opts.rtol, opts.atol, args,
                                         opts.max_step))
        h_mag = jnp.where(h_mag > 0, h_mag, h_auto)
        h = jnp.minimum(h_mag, jnp.abs(tf - t0)) * direction
    elif opts.h0 == 0.0:
        h = cm.initial_step(f, t0, y0, f0, tf, tab.order, opts.rtol, opts.atol,
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

    stats = cm.zero_stats(m, ("nfev", "nsteps", "naccept", "nreject"))
    stats["nfev"] = stats["nfev"] + 2  # f0 + hinit probe
    already_done = t0 == tf
    state = _ERKState(
        t=t0, y=y0, f0=f0, h=h,
        facold=jnp.full((m,), 1e-4, dtype),
        active=~already_done,
        status=jnp.where(already_done, cm.SUCCESS, cm.RUNNING).astype(jnp.int8),
        stats=stats, out_ys=out_ys,
        ev=init_event_state(specs, m, dim, t0, y0, args, dtype),
        dyn=init_dyn(m, opts.record_steps, dtype),
        mesh={"t": jnp.zeros((m, _mesh_size), dtype),
              "h": jnp.zeros((m, _mesh_size), dtype),
              "y": jnp.zeros((m, _mesh_size, dim), dtype)}
        if _mesh_size else {},
    )

    eps = jnp.finfo(dtype).eps
    facc1 = 1.0 / opts.min_factor
    facc2 = 1.0 / opts.max_factor

    def cond(s):
        return jnp.any(s.active)

    def body(s):
        remaining = tf - s.t
        last = jnp.abs(s.h) >= jnp.abs(remaining)
        h = jnp.where(last, remaining, s.h)
        h = jnp.where(h == 0.0, eps, h)  # finished lanes: dummy nonzero

        ks, y1, f_new = _stages(tab, f, s.t, s.y, h, s.f0, args)
        enorm = _err_norm(tab, ks, h, s.y, y1, opts.rtol, opts.atol)
        enorm = jnp.where(jnp.isfinite(enorm), enorm, 1e10)
        enorm = jnp.maximum(enorm, 1e-16)
        accept = enorm <= 1.0

        # Hairer PI controller
        fac11 = enorm ** expo1
        fac = fac11 / (s.facold ** beta)
        fac = jnp.maximum(facc2, jnp.minimum(facc1, fac / opts.safety))
        hnew_acc = h / fac
        hnew_acc = jnp.clip(jnp.abs(hnew_acc), 0.0, opts.max_step) * jnp.sign(hnew_acc)
        hnew_rej = h / jnp.minimum(facc1, fac11 / opts.safety)
        hnew = jnp.where(accept, hnew_acc, hnew_rej)

        upd = accept & s.active
        done = upd & last

        out_ys = s.out_ys
        interp = None
        if use_dense or specs:
            if tab.dense == "rk45P":
                interp = _dense_eval_rk45(tab, ks, s.y, h)
            else:
                # the 3 extra interpolation stages are expensive optional
                # work: gate on any lane actually accepting this step
                fall = jax.lax.cond(
                    jnp.any(upd),
                    lambda _: _dop853_fall(tab, f, s.t, s.y, y1, f_new, h,
                                           ks, args),
                    lambda _: jnp.zeros((m, 7, dim), dtype),
                    operand=None)
                interp = _dense_eval_dop853(fall, s.y)
        if use_dense:
            out_ys = cm.collect_dense(out_ys, t_eval, s.t, h, upd, interp)

        ev, terminate, t_ev, y_ev, _ev_idx = handle_events(
            specs, s.ev, s.t, h, s.y, s.t + h, y1, interp, upd, args)
        if use_dense and specs:
            out_ys = cm.mask_dense_after_event(out_ys, t_eval, terminate,
                                               t_ev, h)

        dyn = record_step(s.dyn, s.active, s.t, h, enorm,
                          jnp.zeros_like(s.stats["nsteps"]), accept)

        if _mesh_size:
            rows = jnp.arange(m)
            idx = s.stats["naccept"]
            af = upd.astype(dtype)
            mesh = {
                "t": s.mesh["t"].at[rows, idx].add(af * s.t, mode="drop"),
                "h": s.mesh["h"].at[rows, idx].add(af * h, mode="drop"),
                "y": s.mesh["y"].at[rows, idx].add(
                    af[:, None] * s.y, mode="drop"),
            }
        else:
            mesh = s.mesh

        t_n = jnp.where(upd, jnp.where(terminate, t_ev, s.t + h), s.t)
        y_n = jnp.where(upd[:, None],
                        jnp.where(terminate[:, None], y_ev, y1), s.y)
        f0_n = jnp.where(upd[:, None], f_new, s.f0)
        facold_n = jnp.where(upd, jnp.maximum(enorm, 1e-4), s.facold)
        h_n = jnp.where(s.active, hnew, s.h)

        stats = dict(s.stats)
        # dop853 interpolant costs 3 extra f evals per accepted step whenever
        # it is built (dense output OR event detection)
        nf_extra = 3 if ((use_dense or specs) and tab.dense == "dop853D") \
            else 0
        stats["nfev"] = stats["nfev"] + s.active * (tab.n_stages + 1) \
            + upd * nf_extra
        stats["nsteps"] = stats["nsteps"] + s.active
        stats["naccept"] = stats["naccept"] + upd
        stats["nreject"] = stats["nreject"] + (s.active & ~accept)

        exceeded = s.active & (stats["nsteps"] >= opts.max_steps) & ~done
        # Hairer's t-relative underflow test (cf. solve/radau.py)
        underflow = s.active & (0.1 * jnp.abs(h_n) <= eps * jnp.abs(t_n)) \
            & ~done & ~exceeded

        status = s.status
        status = jnp.where(done, cm.SUCCESS, status).astype(jnp.int8)
        status = jnp.where(exceeded, cm.MAX_STEPS, status).astype(jnp.int8)
        status = jnp.where(underflow, cm.STEP_UNDERFLOW, status).astype(jnp.int8)
        status = jnp.where(terminate, cm.EVENT_TERMINATED, status).astype(jnp.int8)
        active = s.active & ~done & ~exceeded & ~underflow & ~terminate

        return _ERKState(t=t_n, y=y_n, f0=f0_n, h=h_n, facold=facold_n,
                         active=active, status=status, stats=stats,
                         out_ys=out_ys, ev=ev, dyn=dyn, mesh=mesh)

    final = jax.lax.while_loop(cond, body, state)
    return cm.Solution(
        t=final.t, y=final.y, status=final.status, stats=final.stats,
        ts=t_eval if use_dense else None,
        ys=final.out_ys if use_dense else None,
        event_t=final.ev["event_t"] if specs else None,
        event_y=final.ev["event_y"] if specs else None,
        event_idx=final.ev["event_idx"] if specs else None,
        dyn=final.dyn,
        mesh=final.mesh if _mesh_size else None,
        h_next=final.h,
    )
