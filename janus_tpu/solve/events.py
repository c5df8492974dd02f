"""Vectorized event detection on the continuous extension.

The reference finds event roots with Regula-Falsi/secant on the dense output
(EventZeroFcn, src/cpp/radaute_impl.hpp:2031-2185; Pegasus variant
src/python/odesolvers/event_zero.py:17-115). Here: after each accepted step,
sign changes of g(t, y) over the step window are bracketed per (trajectory,
event) lane and polished with a fixed-iteration bisection on the step's
interpolant — fully batched, gated by ``lax.cond`` so event-free steps pay one
g evaluation only.

Event spec: ``Event(fn, terminal=True, direction=0)`` with batched
``fn(t[M], y[M,D], args) -> [M]``. direction: 0 = any crossing, +1 = g rising
through zero, −1 = falling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

N_BISECT = 60


@dataclass(frozen=True)
class Event:
    fn: Callable
    terminal: bool = True
    direction: float = 0.0


def normalize_events(events) -> Sequence[Event]:
    if events is None:
        return ()
    if isinstance(events, Event):
        return (events,)
    if callable(events):
        return (Event(events),)
    out = []
    for e in events:
        out.append(e if isinstance(e, Event) else Event(e))
    return tuple(out)


def eval_events(specs, t, y, args):
    """[M, E] stack of event values (E = len(specs); E may be 0)."""
    if not specs:
        return jnp.zeros(y.shape[:-1] + (0,), y.dtype)
    return jnp.stack([e.fn(t, y, args) for e in specs], axis=-1)


def init_event_state(specs, m, dim, t0, y0, args, dtype):
    return {
        "g": eval_events(specs, t0, y0, args),
        "event_t": jnp.full((m,), jnp.nan, dtype),
        "event_y": jnp.full((m, dim), jnp.nan, dtype),
        "event_idx": jnp.full((m,), -1, jnp.int32),
    }


def handle_events(specs, ev_state, t_old, h, y_old, t_new, y_new, interp,
                  accept, args):
    """Detect/locate events on accepted steps.

    interp: theta [M,K] -> y [M,K,D] (the step's continuous extension).
    Returns (new_ev_state, terminate [M], t_event [M], y_event [M,D],
    idx [M] — which event fired THIS step, 0 when none).
    """
    m = t_old.shape[0]
    dtype = t_old.dtype
    if not specs:
        false = jnp.zeros((m,), bool)
        return ev_state, false, t_new, y_new, jnp.zeros((m,), jnp.int32)

    n_ev = len(specs)
    g_old = ev_state["g"]
    g_new = eval_events(specs, t_new, y_new, args)

    dirs = jnp.asarray([e.direction for e in specs], dtype)
    terminal = jnp.asarray([e.terminal for e in specs], bool)

    sign_change = (g_old * g_new <= 0.0) & (g_old != g_new)
    dir_ok = jnp.where(dirs[None, :] == 0.0, True,
                       jnp.where(dirs[None, :] > 0.0, g_old < g_new,
                                 g_old > g_new))
    crossed = sign_change & dir_ok & accept[:, None] & (g_old != 0.0)

    def locate(_):
        # bisection per (lane, event) on theta ∈ [0, 1]
        lo = jnp.zeros((m, n_ev), dtype)
        hi = jnp.ones((m, n_ev), dtype)
        glo = g_old

        def g_at(theta):
            y_pts = interp(theta)                         # [M, E, D]
            t_pts = t_old[:, None] + theta * h[:, None]
            cols = [specs[e].fn(t_pts[:, e], y_pts[:, e, :], args)
                    for e in range(n_ev)]
            return jnp.stack(cols, axis=-1)

        def body(_, carry):
            lo, hi, glo = carry
            mid = 0.5 * (lo + hi)
            gmid = g_at(mid)
            left = glo * gmid <= 0.0
            hi2 = jnp.where(left, mid, hi)
            lo2 = jnp.where(left, lo, mid)
            glo2 = jnp.where(left, glo, gmid)
            return lo2, hi2, glo2

        lo, hi, _ = jax.lax.fori_loop(0, N_BISECT, body, (lo, hi, glo))
        theta_root = 0.5 * (lo + hi)
        theta_root = jnp.where(crossed, theta_root, jnp.inf)
        # earliest crossing per lane (any event)
        first = jnp.argmin(theta_root, axis=-1)           # [M]
        theta_first = jnp.take_along_axis(theta_root, first[:, None],
                                          axis=-1)[:, 0]
        # earliest TERMINAL crossing per lane — the solve must stop there
        # even when a non-terminal event crossed earlier in the same step
        # (scipy semantics: termination is decided by terminal events only).
        theta_term = jnp.where(terminal[None, :], theta_root, jnp.inf)
        first_term = jnp.argmin(theta_term, axis=-1)      # [M]
        theta_first_term = jnp.take_along_axis(theta_term, first_term[:, None],
                                               axis=-1)[:, 0]
        hit = jnp.any(crossed, axis=-1)
        hit_term = jnp.any(crossed & terminal[None, :], axis=-1)
        # terminating lanes report the terminal crossing (truncation point +
        # adjoint/IND jump data); others report the earliest crossing.
        idx_sel = jnp.where(hit_term, first_term, first)
        theta_sel = jnp.where(hit_term, theta_first_term, theta_first)
        theta_eval = jnp.where(jnp.isfinite(theta_sel), theta_sel, 1.0)
        y_ev = interp(theta_eval[:, None])[:, 0, :]
        t_ev = t_old + theta_eval * h
        return hit, hit_term, idx_sel.astype(jnp.int32), t_ev, y_ev

    def no_events(_):
        return (jnp.zeros((m,), bool), jnp.zeros((m,), bool),
                jnp.zeros((m,), jnp.int32), t_new, y_new)

    hit, terminate, idx, t_ev, y_ev = jax.lax.cond(
        jnp.any(crossed), locate, no_events, operand=None)

    # record the FIRST event per lane; a terminal crossing is authoritative
    # (it is the truncation point the adjoint jump reads via event_idx/t)
    # and overwrites a non-terminal recording from an earlier step.
    fresh = (hit & (ev_state["event_idx"] < 0)) | terminate
    new_state = {
        "g": jnp.where(accept[:, None], g_new, g_old),
        "event_t": jnp.where(fresh, t_ev, ev_state["event_t"]),
        "event_y": jnp.where(fresh[:, None], y_ev, ev_state["event_y"]),
        "event_idx": jnp.where(fresh, idx, ev_state["event_idx"]),
    }
    return new_state, terminate, t_ev, y_ev, idx
