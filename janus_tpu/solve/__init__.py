"""Lockstep masked adaptive steppers (pure functions under lax.while_loop)."""

from __future__ import annotations

from typing import Any, Callable, Optional

from janus_tpu.solve.common import (
    Solution,
    RUNNING,
    SUCCESS,
    MAX_STEPS,
    STEP_UNDERFLOW,
    NEWTON_STALL,
    EVENT_TERMINATED,
)
from janus_tpu.solve.options import Options


def solve_ivp(f: Callable, tspan, y0, method: str = "dopri5", args: Any = None,
              options: Optional[Options] = None, t_eval=None,
              events=None, **opt_kw) -> Solution:
    """Batched initial-value-problem solve.

    f       : batched RHS ``f(t[M], y[M,D], args) -> [M,D]``
    tspan   : (t0, tf); either may be scalar or [M] (reverse time = tf < t0)
    y0      : [M, D] (or [D] for a single trajectory)
    method  : 'dopri5' | 'dopri853'                  (explicit, PI control)
              'radau' | 'radau5'/'radau9'/'radau13'  (Radau IIA, fixed order)
              'radaup'                               (per-lane variable order)
              'radau_fused'                          (one-Pallas-kernel step)
              'bdf2' | 'seulex' | 'rodas'            (BDF2 / extrapolation /
                                                      Rosenbrock GRK4T)
    options : Options(...); or pass rtol=…, atol=… etc. as keywords
    t_eval  : optional shared output grid [T] (dense-output sampling)
    events  : optional event functions (see solve.events)
    """
    if options is None:
        options = Options(**opt_kw)
    elif opt_kw:
        options = options.replace(**opt_kw)
    t0, tf = tspan

    method = method.lower()
    if method in ("dopri5", "rk45", "dopri853", "dop853"):
        from janus_tpu.solve.dopri import TABLEAUS, solve_erk
        name = "dopri5" if method in ("dopri5", "rk45") else "dopri853"
        return solve_erk(TABLEAUS[name], f, t0, tf, y0, args, options, t_eval,
                         events=events)
    if method in ("radau", "radau5", "radau13", "radau9", "radaup"):
        stages = {"radau": None, "radau5": 3, "radau9": 5, "radau13": 7,
                  "radaup": None}[method]
        if stages is not None:
            options = options.replace(min_stages=stages, max_stages=stages)
        if method == "radaup" and options.min_stages == options.max_stages:
            # variable order by default: stages 1..7
            options = options.replace(min_stages=1, max_stages=7)
        if options.min_stages != options.max_stages:
            from janus_tpu.solve.radaup import solve_radau_vo
            return solve_radau_vo(f, t0, tf, y0, args, options, t_eval,
                                  events=events)
        from janus_tpu.solve.radau import solve_radau
        return solve_radau(f, t0, tf, y0, args, options, t_eval, events=events)
    if method == "radau_fused":
        if t_eval is not None or events is not None:
            raise ValueError("radau_fused is the final-state throughput path;"
                             " use method='radau' for t_eval/events")
        from janus_tpu.solve.radau_fused import solve_radau_fused
        return solve_radau_fused(f, t0, tf, y0, args, options)
    if method == "bdf2":
        from janus_tpu.solve.bdf import solve_bdf2
        return solve_bdf2(f, t0, tf, y0, args, options, t_eval)
    if method == "seulex":
        from janus_tpu.solve.seulex import solve_seulex
        return solve_seulex(f, t0, tf, y0, args, options, t_eval)
    if method in ("rodas", "ros4", "rosenbrock"):
        from janus_tpu.solve.rosenbrock import solve_ros4
        return solve_ros4(f, t0, tf, y0, args, options, t_eval)
    raise ValueError(f"unknown method {method!r}")


__all__ = [
    "solve_ivp", "Solution", "Options",
    "RUNNING", "SUCCESS", "MAX_STEPS", "STEP_UNDERFLOW", "NEWTON_STALL",
    "EVENT_TERMINATED",
]
