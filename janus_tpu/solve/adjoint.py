"""Continuous-adjoint reverse-mode sensitivities on the adaptive Radau solver.

``radau_adjoint`` returns the final state of a batched adaptive Radau solve as
a ``jax.custom_vjp`` whose backward pass solves the adjoint ODE

    λ' = −J(t, y(t))ᵀ λ,        λ(T) = ∂L/∂y(T)

backward along the SAME accepted-step mesh the forward solve chose, with the
primal state reconstructed from each step's stored collocation (dense-output)
polynomial — the interpolated-primal continuous adjoint. Parameter gradients
accumulate by the step's own Radau quadrature

    ∂L/∂θ += h·Σ_i b_i · λ(τ_i)ᵀ ∂f/∂θ(τ_i, ŷ(τ_i)),

so many-parameter gradients (NN Hamiltonians, L4 training) cost ONE backward
sweep instead of K forward tangent directions — reverse mode at
adaptive-solver cost. The reference has forward duals only
(src/cpp/radauted_impl.hpp — no adjoint anywhere); this goes beyond it.

Design notes (TPU-first):
- the backward pass is a ``lax.scan`` over the step index k = S−1..0 with a
  per-lane live mask (lanes own different mesh lengths — same lockstep
  philosophy as the forward loop);
- each backward step factors (γ/h_b·Mᵀ + Jᵀ) once (unrolled batched LU) and
  runs the SAME transformed simplified iteration as the forward Newton — the
  adjoint stage system is linear in λ, so it converges at the primal's
  contraction rate;
- ∂f/∂θᵀλ and Jᵀλ come from per-stage ``jax.vjp`` pulls of the batched rhs —
  Jacobians are never materialized for the quadrature (VecOpDual's concern);
- invertible mass matrices use the substitution ν = M⁻ᵀλ: Mᵀν' = −Jᵀν with
  ν(T) = M⁻ᵀ∂L/∂y(T) and ∂L/∂y0 = Mᵀν(t0). Singular-mass (DAE) adjoints are
  not defined by this route and raise;
- ``Options(stage_solver="gmres")`` carries through to the backward pass:
  the adjoint stage systems (γ/h_b·Mᵀ + Jᵀ) are solved by the same batched
  GMRES machinery with Jᵀ·v as a vjp PULL (reverse mode is the natural
  direction here — no transpose probes needed) and the TRANSPOSED 3-probe
  tridiagonal Thomas preconditioner, so large-D (method-of-lines) models
  train with reverse-mode gradients without materializing any Jacobian.
  A (non-singular) mass matrix stays matrix-free too: the terminal
  ν(T) = M⁻ᵀλ(T) and ẏ(T) = M⁻¹f solves run GMRES preconditioned by the
  mass's own tridiagonal Thomas sweep (exact for 1-D FEM mass). Combined
  with ``n_alg`` (a large-D index-1 DAE) the terminal conditions stay
  matrix-free as well: only the small [n_alg × n_alg] g_z block is
  materialized (n_alg z-slot jvp probes of the matrix-free Jacobian) and
  dense-factored; g_xᵀu / f_zᵀν_x / g_x·ẋ are jvp/vjp pulls and the A-block
  solves (A⁻¹f, A⁻ᵀȳ) run the same GMRES+Thomas machinery;
- semi-explicit index-1 DAEs (``n_alg`` trailing algebraic variables,
  mass = blockdiag(A, 0) with A invertible) get the Cao-Li-Petzold adjoint:
  the backward stage systems (γ/h_b·Mᵀ + Jᵀ) already handle singular M —
  only the TERMINAL data is DAE-specific. With J = [[f_x, f_z], [g_x, g_z]]:
  ν_x(T) = A⁻ᵀ(ȳ_x − g_xᵀg_z⁻ᵀȳ_z) (an algebraic cotangent rides the
  constraint manifold, dz = −g_z⁻¹g_x dx), ν_z(T) = −g_z⁻ᵀf_zᵀν_x(T) (the
  adjoint DAE's own consistency condition), and the terminal velocity in
  dL/dT is (ẋ, −g_z⁻¹g_x ẋ). ∂L/∂y0 = Mᵀν(t0) is zero on algebraic slots
  (consistent-IC convention: z0 is not a free input). The reference forwards
  duals through index-1 mass matrices but has no reverse mode at all;
- terminal events differentiate by the implicit-function jump at t*: with
  ẏ* = M⁻¹f(t*, y*) and w = (ȳ·ẏ* + t̄)/(g_t + g_y·ẏ*), the adjoint starts
  from λ(t*) = ȳ − w·g_yᵀ, parameters get the direct −w·g_θ term, and the
  backward sweep's FIRST step is the per-lane partial step t* → t_n on the
  containing step's collocation polynomial (θ_end = (t*−t_n)/h_n). The
  reference locates events on dual trajectories (EventZeroFcn,
  radauted_impl.hpp:2306) — forward mode only; this is its reverse twin.

Accuracy contract: gradients match jvp/FD through the solve to O(rtol)
(discretize-then-optimize vs optimize-then-discretize differ by the local
error of the mesh, which the controller bounds by rtol).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.linalg.smalllu import lu_factor, lu_solve
from janus_tpu.solve import common as cm
from janus_tpu.solve.options import Options
from janus_tpu.solve.radau import (_EINSUM_PRECISION, _factorize,
                                   default_jacobian, solve_radau)
from janus_tpu.solve.radau_tables import radau_tableau


def radau_adjoint(f: Callable, tspan, y0, args=None,
                  options: Optional[Options] = None,
                  jac: Optional[Callable] = None, mass=None, t_eval=None,
                  events=None, n_alg: int = 0, cost: Optional[Callable] = None,
                  checkpoints: int = 0):
    """Reverse-differentiable batched adaptive Radau solve.

    Returns the final state y(T) [M, D], or — with ``t_eval`` — the sampled
    trajectory ys [M, T, D]. ``jax.grad``/``jax.vjp`` of any function of the
    result flows through the continuous adjoint w.r.t. y0, every inexact
    leaf of ``args``, t0, tf, and (in t_eval mode) the sample times.
    Forward-mode (jvp) requests fall through to the solver's ordinary jvp
    path.

    t_eval: optional strictly monotonic 1-D grid of sample times inside
    (t0, tf], ordered in the direction of integration. The solve is CHAINED
    over the segments t0 → t_eval[0] → … → t_eval[-1] (each segment an
    adaptive solve warm-started with the previous segment's step proposal),
    so samples are exact solve endpoints and the reverse sweep injects each
    sample's cotangent at exactly its time — the trajectory-fitting
    (loss = Σ_j L_j(y(t_j))) training path. tspan's tf only fixes the
    direction; integration stops at t_eval[-1] (include tf in t_eval to get
    the endpoint). Memory: the reverse pass stores one accepted-step mesh of
    ``options.adjoint_steps`` slots PER SEGMENT — size adjoint_steps for the
    per-segment step budget, not the whole span.

    mass: optional mass matrix [D,D] or [M,D,D]. Must be invertible unless
    ``n_alg > 0`` (invertibility is not detectable at trace time and is the
    caller's responsibility). Works with ``stage_solver='gmres'`` (the
    terminal mass solves run matrix-free; see the module docstring).

    n_alg: number of TRAILING algebraic variables for a semi-explicit
    index-1 DAE — mass must be blockdiag(A, 0) with A [D−n_alg square]
    invertible, and the last n_alg rows of f the algebraic constraints
    g(t, x, z) = 0 (y0 consistent). Gradients w.r.t. y0 live on the
    differential slots only (algebraic slots of the returned cotangent are
    zero: z0 is determined by consistency, not a free input). Composes with
    ``stage_solver='gmres'`` for large-D constrained MOL systems (the
    terminal conditions stay matrix-free; module docstring). See the module
    docstring for the adjoint-DAE terminal conditions.

    events: optional TERMINAL event spec(s) (``Event`` / callable / sequence;
    every spec must have terminal=True). Returns ``(y_term, t_term)`` —
    per-lane state and time at the first event crossing (or at tf for lanes
    that never cross) — and BOTH are reverse-differentiable: d t*/dθ and the
    event-time motion's effect on y* flow through the implicit-function jump
    (see module docstring). Lanes that never trigger get the ordinary
    terminal adjoint. Combines with ``n_alg`` (the event jump uses the
    DAE's constrained velocity ẏ* = (ẋ, −g_z⁻¹(g_t+g_xẋ)) and the jumped
    cotangent then passes through the adjoint-DAE terminal projections) and
    with ``cost``. Combines with ``t_eval``: returns
    ``(ys [M,T,D], y_term [M,D], t_term [M])`` (+ q with ``cost``) where
    samples past a lane's t* are NaN — the forward solvers' truncation
    convention — and a triggered lane's later segments collapse to
    zero-length solves so the event jump carries the whole gradient; mask
    the NaN samples out of the loss (e.g. ``jnp.where(jnp.isfinite(ys),
    (ys − data)**2, 0)``) exactly as with the forward path.

    cost: optional running-cost integrand ``l(t[M], y[M,D], args) -> [M]``
    (or ``[M, Q]``). Appends ``q = ∫ l dt`` (``solve_radau(quad=...)``, the
    CVODES quadrature role) to the outputs — ``(y, q)``, ``(ys, q)`` with
    t_eval (q summed over the whole grid span), or ``(y, t_term, q)`` with
    events (q truncated at t*) — and q's cotangent flows through the SAME
    backward sweep: the adjoint equation picks up the source term
    λ' = −Jᵀλ − l_yᵀq̄, parameters the quadrature q̄·∫ l_θ dt, and the
    boundaries ±q̄·l — integral-cost (Lagrange-term) objectives at one
    backward sweep, no state augmentation. With ``n_alg`` the adjoint's
    algebraic consistency condition picks up the cost's algebraic gradient
    (g_zᵀν_z = −f_zᵀν_x − l_zᵀq̄, the Cao-Li-Petzold quadrature
    sensitivities).

    checkpoints: optional segment count C > 0 for MEMORY-BOUNDED long-horizon
    reverse mode (terminal mode only — not with t_eval or events). The span
    is chained over C uniform segments (each an adaptive solve warm-started
    with the previous segment's step proposal) and each segment is
    rematerialized (``jax.checkpoint``): the forward pass stores only the C
    segment-boundary states; each segment's accepted-step mesh
    ([M, adjoint_steps, s+1, D] floats) is RECOMPUTED during the backward
    sweep — peak gradient memory drops ~C× for one extra forward solve of
    compute. Size ``options.adjoint_steps`` for the per-SEGMENT step budget.
    """
    opts = options if options is not None else Options()
    vo_orders = None
    if opts.min_stages != opts.max_stages:
        # variable-order (radaup) forward: the recorded mesh stores each
        # lane's collocation polynomial PADDED to the ladder's largest stage
        # count (absent orders carry zero coefficients, so evaluating the
        # padded power basis IS the lane's own interpolant), and the
        # backward sweep integrates the linear adjoint ODE at the ladder's
        # top order on that mesh — order-adaptivity lives entirely in the
        # forward mesh choice. Reference: the flagship dual solver is
        # variable-order with event duals (radauted.hpp:241-296,
        # radauted_impl.hpp:2306); this is its reverse twin.
        from janus_tpu.solve.radaup import ladder_orders
        orders = ladder_orders(opts, jnp.asarray(y0).dtype)
        if len(orders) < 2:
            opts = opts.replace(min_stages=orders[0], max_stages=orders[0])
        else:
            # round 5: stage_solver='gmres'/'tridiag' compose — the forward
            # ladder runs per-order matrix-free stage solvers (radaup.py)
            # and the backward sweep is order-parameterized already (it
            # integrates at the ladder's top order, so the fixed-stage
            # matrix-free backward machinery applies verbatim)
            vo_orders = orders
    use_cost = cost is not None
    if n_alg:
        if mass is None:
            raise ValueError("n_alg > 0 (index-1 DAE adjoint) needs the "
                             "singular mass = blockdiag(A, 0)")
    t0, tf = tspan
    if events is not None:
        if checkpoints:
            raise ValueError("checkpoints= is terminal-mode only (an event "
                             "crossing a segment boundary would be missed "
                             "by the warm-started chain)")
        run = _build_adjoint(f, opts, jac_user=jac, mass=mass, events=events,
                             n_alg=n_alg, cost=cost, vo_orders=vo_orders)
        if t_eval is None:
            if use_cost:
                y, t_term, _, q, _idx = run(t0, tf, y0, args, None)
                return y, t_term, q
            y, t_term, _, _idx = run(t0, tf, y0, args, None)
            return y, t_term
        # events + t_eval: chain the sample segments per lane; once a lane
        # triggers, its later segments are ZERO-LENGTH solves t* → t* (the
        # identity — their boundary cotangents cancel, so the event jump
        # applied in the triggering segment's backward pass carries the
        # whole gradient). Samples past t* are NaN (the forward solvers'
        # truncation convention, commit ba70eaf); the sample exactly AT t*
        # (a trigger on a segment boundary) stays valid.
        if jnp.ndim(t0) != 0 or jnp.ndim(tf) != 0:
            raise ValueError("radau_adjoint(t_eval=...) chains segments "
                             "over a shared grid; t0/tf must be scalars")
        t_eval = jnp.asarray(t_eval)
        if t_eval.ndim != 1 or t_eval.shape[0] < 1:
            raise ValueError("t_eval must be a non-empty 1-D grid")
        t0b, _, y0b = cm.broadcast_batch(t0, tf, y0)
        m = y0b.shape[0]
        dtype = y0b.dtype
        t_eval = t_eval.astype(dtype)
        t_lo = jnp.concatenate([jnp.full((1,), t0, dtype), t_eval[:-1]])
        t_hi = t_eval
        h0c = jnp.zeros((m,), dtype)
        done0 = jnp.zeros((m,), bool)
        tstar0 = jnp.full((m,), t0, dtype)
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
                y2, t2, h2, q2, idx2 = outs
            else:
                y2, t2, h2, idx2 = outs
            trig = (idx2 >= 0) & ~done
            tstar2 = jnp.where(trig, t2, tstar)
            done2 = done | trig
            # a trigger strictly inside the segment invalidates the segment's
            # endpoint sample; a trigger exactly at tb keeps it
            dead = done | (trig & (t2 != tb_l))
            sample = jnp.where(dead[:, None], nan, y2)
            if use_cost:
                return (y2, h2, done2, tstar2, q + q2), sample
            return (y2, h2, done2, tstar2), sample

        if use_cost:
            (yF, _, doneF, tstarF, q), ys = jax.lax.scan(
                seg_ev, (y0b, h0c, done0, tstar0, q0), (t_lo, t_hi))
        else:
            (yF, _, doneF, tstarF), ys = jax.lax.scan(
                seg_ev, (y0b, h0c, done0, tstar0), (t_lo, t_hi))
        ys = jnp.swapaxes(ys, 0, 1)                    # [M, T, D]
        t_term = jnp.where(doneF, tstarF,
                           jnp.broadcast_to(t_eval[-1], (m,)))
        if use_cost:
            return ys, yF, t_term, q
        return ys, yF, t_term
    if checkpoints and t_eval is not None:
        raise ValueError("checkpoints= is terminal-mode only; t_eval already "
                         "chains segments (size adjoint_steps per segment)")
    run = _build_adjoint(f, opts, jac_user=jac, mass=mass, n_alg=n_alg,
                         cost=cost, vo_orders=vo_orders)
    if t_eval is None:
        if checkpoints:
            if jnp.ndim(t0) != 0 or jnp.ndim(tf) != 0:
                raise ValueError("radau_adjoint(checkpoints=...) chains "
                                 "segments over a shared grid; t0/tf must "
                                 "be scalars")
            t0b, _, y0b = cm.broadcast_batch(t0, tf, y0)
            dtype = y0b.dtype
            edges = (jnp.asarray(t0, dtype)
                     + (jnp.asarray(tf, dtype) - jnp.asarray(t0, dtype))
                     * jnp.linspace(0.0, 1.0, int(checkpoints) + 1,
                                    dtype=dtype))
            h0c = jnp.zeros(t0b.shape, dtype)   # 0 ⇒ automatic initial step
            # rematerialize each segment: the scan stores only the (y, h[, q])
            # carry; the segment's mesh is recomputed in the backward pass
            run_seg = jax.checkpoint(
                lambda ta, tb, y, h: run(ta, tb, y, args, h))

            if use_cost:
                q0 = jnp.zeros(jax.eval_shape(
                    lambda: cost(t0b, y0b, args)).shape, dtype)

                def seg_cq(carry, bounds):
                    y, h, q = carry
                    y2, _, h2, q2 = run_seg(bounds[0], bounds[1], y, h)
                    return (y2, h2, q + q2), None

                (y, _, q), _ = jax.lax.scan(seg_cq, (y0b, h0c, q0),
                                            (edges[:-1], edges[1:]))
                return y, q

            def seg_c(carry, bounds):
                y, h = carry
                y2, _, h2 = run_seg(bounds[0], bounds[1], y, h)
                return (y2, h2), None

            (y, _), _ = jax.lax.scan(seg_c, (y0b, h0c),
                                     (edges[:-1], edges[1:]))
            return y
        if use_cost:
            y, _, _, q = run(t0, tf, y0, args, None)
            return y, q
        y, _, _ = run(t0, tf, y0, args, None)
        return y

    if jnp.ndim(t0) != 0 or jnp.ndim(tf) != 0:
        raise ValueError("radau_adjoint(t_eval=...) chains segments over a "
                         "shared grid; t0/tf must be scalars")
    t_eval = jnp.asarray(t_eval)
    if t_eval.ndim != 1 or t_eval.shape[0] < 1:
        raise ValueError("t_eval must be a non-empty 1-D grid")
    t0b, _, y0b = cm.broadcast_batch(t0, tf, y0)
    dtype = y0b.dtype
    t_eval = t_eval.astype(dtype)
    t_lo = jnp.concatenate([jnp.full((1,), t0, dtype), t_eval[:-1]])
    t_hi = t_eval
    h_carry0 = jnp.zeros(t0b.shape, dtype)     # 0 ⇒ automatic initial step

    if use_cost:
        q0 = jnp.zeros(jax.eval_shape(lambda: cost(t0b, y0b, args)).shape,
                       dtype)

        def seg_q(carry, bounds):
            y, h, q = carry
            ta, tb = bounds
            y2, _, h2, q2 = run(ta, tb, y, args, h)
            return (y2, h2, q + q2), y2

        (_, _, q), ys = jax.lax.scan(seg_q, (y0b, h_carry0, q0),
                                     (t_lo, t_hi))
        return jnp.swapaxes(ys, 0, 1), q       # [M, T, D], [M(, Q)]

    def seg(carry, bounds):
        y, h = carry
        ta, tb = bounds
        y2, _, h2 = run(ta, tb, y, args, h)
        return (y2, h2), y2

    (_, _), ys = jax.lax.scan(seg, (y0b, h_carry0), (t_lo, t_hi))
    return jnp.swapaxes(ys, 0, 1)              # [M, T, D]


def _gmres_dense_solve(mat, rhs, iters):
    """GMRES solve of an EXPLICIT batched matrix (mass / DAE blocks) —
    see ``linalg.gmres.gmres_dense_solve``."""
    from janus_tpu.linalg.gmres import gmres_dense_solve
    return gmres_dense_solve(mat, rhs, iters)


def _split_diff(args):
    """Partition args leaves into differentiable (inexact) and passthrough."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    diff_idx = [i for i, l in enumerate(leaves)
                if jnp.issubdtype(jnp.result_type(l), jnp.inexact)]

    def rebuild(diff_leaves):
        out = list(leaves)
        for i, v in zip(diff_idx, diff_leaves):
            out[i] = v
        return jax.tree_util.tree_unflatten(treedef, out)

    dleaves = [jnp.asarray(leaves[i]) for i in diff_idx]
    return dleaves, rebuild, leaves, treedef, diff_idx


def constrained_ydot(fa, t, y, dl, mass, n_alg, *, use_gmres=False,
                     gmres_iters=20):
    """The true state velocity ẏ at (t, y) for the boundary-time cotangent
    formulas t̄₀ = −λ₀·ẏ(t₀), t̄_f = ȳ·ẏ(T).

    ODE: ẏ = f. Invertible mass: ẏ = M⁻¹f. Semi-explicit index-1 DAE
    (``n_alg`` trailing algebraic rows, mass = blockdiag(A, 0)): the
    CONSTRAINED velocity ẋ = A⁻¹f_x, ż = −g_z⁻¹(g_t + g_x·ẋ) — the
    Cao–Li–Petzold boundary velocity the continuous adjoint uses for its
    terminal conditions (this module's n_alg block). Matrix-free
    throughout: g_z from n_alg z-slot jvp probes (only the small
    [n_alg × n_alg] block is dense-factored), g_x·ẋ and g_t as jvp pulls,
    the A block by dense LU (or batched GMRES under ``use_gmres`` for
    large differential blocks). Shared by the discrete adjoints
    (adjoint_{rodas,seulex,ndf}.py ``n_alg=``) so DAE lanes get t0/tf
    gradients instead of the invertible-mass restriction."""
    m, dim = y.shape
    dtype = y.dtype
    f_T = fa(t, y, dl)
    if not n_alg:
        if mass is None:
            return f_T
        mb = jnp.broadcast_to(jnp.asarray(mass, dtype), (m, dim, dim))
        if use_gmres:
            return _gmres_dense_solve(mb, f_T, gmres_iters)
        lu_m, piv_m = lu_factor(mb, pivot=True)
        return lu_solve(lu_m, piv_m, f_T)
    n1 = dim - n_alg
    a_blk = jnp.broadcast_to(jnp.asarray(mass, dtype),
                             (m, dim, dim))[:, :n1, :n1]
    f_at = lambda yy: fa(t, yy, dl)                            # noqa: E731
    gz = jnp.stack(
        [jax.jvp(f_at, (y,),
                 (jnp.zeros((m, dim), dtype).at[:, n1 + a].set(1.0),)
                 )[1][:, n1:] for a in range(n_alg)], axis=-1)
    if use_gmres:
        xdot = _gmres_dense_solve(a_blk, f_T[:, :n1], gmres_iters)
    else:
        lu_a, piv_a = lu_factor(a_blk, pivot=True)
        xdot = lu_solve(lu_a, piv_a, f_T[:, :n1])
    g_t = jax.jvp(lambda tt: fa(tt, y, dl), (t,),
                  (jnp.ones_like(t),))[1][:, n1:]
    gx_xdot = jax.jvp(
        f_at, (y,),
        (jnp.concatenate([xdot, jnp.zeros((m, n_alg), dtype)], axis=-1),)
    )[1][:, n1:]
    lu_gz, piv_gz = lu_factor(gz, pivot=True)
    zdot = -lu_solve(lu_gz, piv_gz, g_t + gx_xdot)
    return jnp.concatenate([xdot, zdot], axis=-1)


def _build_adjoint(f, opts, jac_user, mass, events=None, n_alg=0, cost=None,
                   vo_orders=None):
    from janus_tpu.solve.events import normalize_events
    cap = opts.adjoint_steps
    specs = normalize_events(events)
    use_cost = cost is not None
    if any(not e.terminal for e in specs):
        raise ValueError("radau_adjoint(events=...) requires every event "
                         "terminal (non-terminal crossings don't enter the "
                         "returned (y_term, t_term))")
    if vo_orders:
        from janus_tpu.solve.radaup import solve_radau_vo as _solver
    else:
        _solver = solve_radau

    @jax.custom_vjp
    def run(t0, tf, y0, args, h0):
        sol = _solver(f, t0, tf, y0, args=args, options=opts,
                      jac=jac_user, mass=mass, events=events, quad=cost,
                      _h0=h0)
        outs = (sol.y, sol.t, sol.h_next)
        if use_cost:
            outs = outs + (sol.quad,)
        if specs:
            # which event fired (−1 none): lets the t_eval chain detect
            # per-lane termination; int output, zero cotangent
            outs = outs + (sol.event_idx,)
        return outs

    def fwd(t0, tf, y0, args, h0):
        sol = _solver(f, t0, tf, y0, args=args, options=opts,
                      jac=jac_user, mass=mass, events=events, quad=cost,
                      _mesh_size=cap, _h0=h0)
        ev_idx = sol.event_idx if specs else None
        res = (sol.mesh, sol.stats["naccept"], t0, tf, y0, args, sol.y,
               sol.t, ev_idx, h0)
        outs = (sol.y, sol.t, sol.h_next)
        if use_cost:
            outs = outs + (sol.quad,)
        if specs:
            outs = outs + (ev_idx,)
        return outs, res

    def bwd(res, out_bar):
        if specs:                    # event-index output: no cotangent
            out_bar = out_bar[:-1]
        if use_cost:                 # h_next is a non-differentiable knob
            ybar, tbar, _, qbar = out_bar
        else:
            ybar, tbar, _ = out_bar
            qbar = None
        mesh, nacc, t0, tf, y0, args, yT, t_term, ev_idx, h0 = res
        t0b, tfb, y0b = cm.broadcast_batch(t0, tf, y0)
        lam0, gleaves, t0bar, tfbar = _adjoint_sweep(
            f, opts, jac_user, mass, specs, mesh, nacc, t0b, tfb, t_term,
            ev_idx, y0b, args, yT, ybar, tbar, n_alg, cost=cost, qbar=qbar,
            vo_orders=vo_orders)
        # reduce cotangents back to the primal input shapes
        t0_ct = jnp.sum(t0bar) if jnp.ndim(t0) == 0 else t0bar
        tf_ct = jnp.sum(tfbar) if jnp.ndim(tf) == 0 else tfbar
        y0_ct = jnp.reshape(lam0, jnp.shape(y0))
        # scatter leaf grads back into the args tree; non-inexact leaves get
        # float0 zeros (JAX's cotangent type for integer primals)
        _, _, leaves, treedef, diff_idx = _split_diff(args)
        out = [np.zeros(jnp.shape(l), jax.dtypes.float0) for l in leaves]
        for i, g in zip(diff_idx, gleaves):
            out[i] = g
        args_ct = jax.tree_util.tree_unflatten(treedef, out)
        h0_ct = None if h0 is None else jnp.zeros_like(h0)
        return (t0_ct, tf_ct, y0_ct, args_ct, h0_ct)

    run.defvjp(fwd, bwd)
    return run


def _adjoint_sweep(f, opts, jac_user, mass, specs, mesh, nacc, t0b, tfb,
                   t_term, ev_idx, y0b, args, yT, ybar, tbar, n_alg=0,
                   cost=None, qbar=None, vo_orders=None):
    """Backward lax.scan over the stored accepted-step mesh."""
    use_cost = cost is not None
    m, dim = yT.shape
    dtype = yT.dtype
    # variable-order forward: the mesh polynomials are padded to the
    # ladder's top stage count (zero high coefficients for lower-order
    # lanes), and the backward collocation runs at that top order — one
    # static stage count, per-lane forward order-adaptivity preserved
    s = vo_orders[-1] if vo_orders else opts.min_stages
    tab = radau_tableau(s)
    cap = mesh["t"].shape[1]
    npair = (s - 1) // 2
    c_nodes = jnp.asarray(tab.c, dtype)
    b_w = jnp.asarray(tab.b, dtype)
    t_mat = jnp.asarray(tab.t_mat, dtype)
    ti_mat = jnp.asarray(tab.ti_mat, dtype)
    tol = (opts.newton_tol if opts.newton_tol > 0
           else cm.derived_newton_tol(dtype, opts.rtol))
    use_gmres = opts.stage_solver != "lu"
    if use_gmres and jac_user is not None:
        raise ValueError("stage_solver='gmres' is matrix-free; drop jac=")

    dleaves, rebuild, _, _, _ = _split_diff(args)

    def f2(t, y, dl):
        return f(t, y, rebuild(dl))

    if use_cost:
        def lfun(t, y, dl):                        # canon [M, Q]
            return cm.canon_cost(cost(t, y, rebuild(dl)))

        qbar = jnp.zeros(jax.eval_shape(
            lambda: cost(t_term, yT, rebuild(dleaves))).shape, dtype) \
            if qbar is None else jnp.asarray(qbar, dtype)
        qb = qbar if qbar.ndim == 2 else qbar[:, None]     # [M, Q]

    jac_fn = (lambda t, y, dl: jac_user(t, y, rebuild(dl))) if jac_user \
        else (lambda t, y, dl: default_jacobian(
            lambda tt, yy, dd: f2(tt, yy, dd))(t, y, dl))

    if mass is not None:
        massT = jnp.swapaxes(jnp.asarray(mass, dtype), -1, -2)

        def mdotT(w):                                # [M, ..., D]
            if massT.ndim == 2:
                return jnp.einsum("ij,m...j->m...i", massT, w,
                                  precision=_EINSUM_PRECISION)
            eq = "mij,msj->msi" if w.ndim == 3 else "mij,mj->mi"
            return jnp.einsum(eq, massT, w, precision=_EINSUM_PRECISION)

        if use_gmres:
            # matrix-free mass solves (large D forbids the unrolled LU):
            # GMRES + Thomas preconditioner on the mass's own tridiagonal —
            # exact in one application for 1-D FEM-style mass matrices
            def _mass_solve(mm, rhs):
                return _gmres_dense_solve(mm, rhs, opts.gmres_iters)
        elif not n_alg:              # singular mass is never factored whole
            mTb = jnp.broadcast_to(massT, (m, dim, dim))
            luM, pivM = lu_factor(mTb, pivot=True)
    else:
        massT = None
        mdotT = lambda w: w                          # noqa: E731

    # terminal velocity ẏ(t_term) = M⁻¹ f(t_term, y_term)
    f_T = f2(t_term, yT, dleaves)
    if n_alg:
        # semi-explicit index-1: J = [[f_x, f_z], [g_x, g_z]] at (T, y(T));
        # ẋ = A⁻¹f_x-rows, ż = −g_z⁻¹(g_t + g_x ẋ). Only the small
        # [n_alg × n_alg] g_z block is ever dense-factored; every large
        # operator is a closure (explicit blocks on the LU path, jvp/vjp
        # pulls + GMRES block solves on the matrix-free path).
        n1 = dim - n_alg
        a_blk = jnp.broadcast_to(jnp.asarray(mass, dtype),
                                 (m, dim, dim))[:, :n1, :n1]
        if use_gmres:
            # g_z columns by n_alg z-slot jvp probes of the matrix-free J
            f_at = lambda yy: f2(t_term, yy, dleaves)          # noqa: E731
            gz = jnp.stack(
                [jax.jvp(f_at, (yT,),
                         (jnp.zeros((m, dim), dtype).at[:, n1 + a].set(1.0),)
                         )[1][:, n1:] for a in range(n_alg)], axis=-1)
            pull_j = jax.vjp(f_at, yT)[1]
            zx = jnp.zeros((m, n1), dtype)
            zz = jnp.zeros((m, n_alg), dtype)
            gxT_dot = lambda u: pull_j(                        # noqa: E731
                jnp.concatenate([zx, u], axis=-1))[0][:, :n1]
            fzT_dot = lambda v: pull_j(                        # noqa: E731
                jnp.concatenate([v, zz], axis=-1))[0][:, n1:]
            gx_dot = lambda w: jax.jvp(                        # noqa: E731
                f_at, (yT,),
                (jnp.concatenate([w, zz], axis=-1),))[1][:, n1:]
            solve_a = lambda r: _gmres_dense_solve(            # noqa: E731
                a_blk, r, opts.gmres_iters)
            solve_aT = lambda r: _gmres_dense_solve(           # noqa: E731
                jnp.swapaxes(a_blk, -1, -2), r, opts.gmres_iters)
        else:
            jmat_T = jac_fn(t_term, yT, dleaves)
            fz = jmat_T[:, :n1, n1:]
            gx = jmat_T[:, n1:, :n1]
            gz = jmat_T[:, n1:, n1:]
            gxT_dot = lambda u: jnp.einsum(                    # noqa: E731
                "mai,ma->mi", gx, u, precision=_EINSUM_PRECISION)
            fzT_dot = lambda v: jnp.einsum(                    # noqa: E731
                "mia,mi->ma", fz, v, precision=_EINSUM_PRECISION)
            gx_dot = lambda w: jnp.einsum(                     # noqa: E731
                "mai,mi->ma", gx, w, precision=_EINSUM_PRECISION)
            lu_a, piv_a = lu_factor(a_blk, pivot=True)
            lu_aT, piv_aT = lu_factor(jnp.swapaxes(a_blk, -1, -2),
                                      pivot=True)
            solve_a = lambda r: lu_solve(lu_a, piv_a, r)       # noqa: E731
            solve_aT = lambda r: lu_solve(lu_aT, piv_aT, r)    # noqa: E731
        lu_gz, piv_gz = lu_factor(gz, pivot=True)
        lu_gzT, piv_gzT = lu_factor(jnp.swapaxes(gz, -1, -2), pivot=True)
        xdot = solve_a(f_T[:, :n1])
        g_t = jax.jvp(lambda tt: f2(tt, yT, dleaves), (t_term,),
                      (jnp.ones_like(t_term),))[1][:, n1:]
        zdot = -lu_solve(lu_gz, piv_gz, g_t + gx_dot(xdot))
        ydot_T = jnp.concatenate([xdot, zdot], axis=-1)
    elif mass is not None:
        if use_gmres:
            ydot_T = _mass_solve(jnp.asarray(mass, dtype), f_T)
        else:
            mb = jnp.broadcast_to(jnp.asarray(mass, dtype), (m, dim, dim))
            luMf, pivMf = lu_factor(mb, pivot=True)
            ydot_T = lu_solve(luMf, pivMf, f_T)
    else:
        ydot_T = f_T

    tbar_in = jnp.zeros((m,), dtype) if tbar is None else \
        jnp.broadcast_to(jnp.asarray(tbar, dtype), (m,))
    # the quadrature endpoint moves with t_term: dq/dT = l(T, y(T))
    qdot_T = jnp.sum(qb * lfun(t_term, yT, dleaves), axis=-1) if use_cost \
        else jnp.zeros((m,), dtype)
    grads0 = [jnp.zeros(l.shape, l.dtype) for l in dleaves]
    lam_T = ybar
    if specs:
        # implicit-function jump at the terminating event (module docstring):
        # λ(t*) = ȳ − w·g_yᵀ, grads += −w·g_θ, w = (ȳ·ẏ* + t̄)/(g_t + g_y·ẏ*)
        is_ev = ev_idx >= 0
        lam_corr = ybar
        for j, spec in enumerate(specs):
            gfun = (lambda tt, yy, dl, _sp=spec: _sp.fn(tt, yy, rebuild(dl)))
            zeros_dl = [jnp.zeros_like(l) for l in dleaves]
            _, den = jax.jvp(gfun, (t_term, yT, dleaves),
                             (jnp.ones_like(t_term), ydot_T, zeros_dl))
            w = (jnp.sum(ybar * ydot_T, axis=-1) + tbar_in + qdot_T) \
                / jnp.where(den == 0.0, 1.0, den)
            wj = jnp.where((ev_idx == j) & is_ev, w, 0.0)
            _, pull = jax.vjp(gfun, t_term, yT, dleaves)
            _, yg, dg = pull(-wj)
            lam_corr = lam_corr + jnp.where((ev_idx == j)[:, None], yg, 0.0)
            grads0 = [a + b for a, b in zip(grads0, dg)]
        lam_T = jnp.where(is_ev[:, None], lam_corr, ybar)
        # lanes stopped by an event don't see tf at all
        tfbar = jnp.where(is_ev, 0.0,
                          jnp.sum(ybar * ydot_T, axis=-1) + tbar_in + qdot_T)
    else:
        # tf cotangent: dL/dT = λ(T)ᵀ ẏ(T) (+ the t_term output's cotangent
        # + the quadrature endpoint's q̄·l(T))
        tfbar = jnp.sum(ybar * ydot_T, axis=-1) + tbar_in + qdot_T

    # ν(t_term) = M⁻ᵀ λ(t_term)
    if n_alg:
        # consistent adjoint-DAE terminal data (module docstring):
        # ν_x = A⁻ᵀ(ȳ_x − g_xᵀg_z⁻ᵀȳ_z), g_zᵀν_z = −f_zᵀν_x
        u = lu_solve(lu_gzT, piv_gzT, lam_T[:, n1:])
        ybar_x_eff = lam_T[:, :n1] - gxT_dot(u)
        nu_x = solve_aT(ybar_x_eff)
        rhs_z = fzT_dot(nu_x)
        if use_cost:
            # integral cost on a DAE: the adjoint's algebraic consistency
            # 0 = f_zᵀν_x + g_zᵀν_z + l_zᵀq̄ carries the cost's algebraic
            # gradient into ν_z(T) (Cao-Li-Petzold quadrature sensitivities)
            lbar_T = jax.vjp(lambda yy: lfun(t_term, yy, dleaves),
                             yT)[1](qb)[0]
            rhs_z = rhs_z + lbar_T[:, n1:]
        nu_z = -lu_solve(lu_gzT, piv_gzT, rhs_z)
        lam_init = jnp.concatenate([nu_x, nu_z], axis=-1)
    elif mass is not None:
        lam_init = _mass_solve(massT, lam_T) if use_gmres \
            else lu_solve(luM, pivM, lam_T)
    else:
        lam_init = lam_T

    bad0 = nacc > cap                                 # mesh overflow

    def step(carry, k):
        live = k < nacc                               # [M]
        # the scan covers every mesh slot (cap is static) but lanes only
        # own nacc of them — slots past every lane's mesh are runtime-dead;
        # cond-skip them (measured: the bench-shape sweep spends most slots
        # dead when adjoint_steps is sized with headroom)
        return jax.lax.cond(jnp.any(live), lambda c: _live_step(c, k, live),
                            lambda c: c, carry), None

    def _live_step(carry, k, live):
        lam, grads, bad = carry

        tn = jnp.take(mesh["t"], k, axis=1)           # [M] step start
        hn = jnp.take(mesh["h"], k, axis=1)           # [M] signed primal h
        yn = jnp.take(mesh["y"], k, axis=1)           # [M, D]
        qq = jnp.take(mesh["q"], k, axis=1)           # [M, s, D]
        if specs:
            # event lanes: the LAST recorded step contains t* — the backward
            # sweep's first step is the PARTIAL step t* → t_n on that step's
            # polynomial, θ_end = (t*−t_n)/h_n (floored: a root exactly at a
            # step start would otherwise produce h_eff = 0 in γ/h_b)
            raw = (t_term - tn) / jnp.where(hn == 0.0, 1.0, hn)
            th_end = jnp.where((k == nacc - 1) & (ev_idx >= 0),
                               jnp.clip(raw, 1e-6, 1.0), 1.0)
            h_eff = hn * th_end
            t_end = tn + h_eff
            hb = jnp.where(live, -h_eff, -1.0)        # signed backward step
            th_i = th_end[:, None] * (1.0 - c_nodes)[None, :]     # [M, s]
            powers = jnp.stack([th_i ** (q + 1) for q in range(s)], axis=-1)
            ys = yn[:, None, :] + jnp.einsum("msq,mqd->msd", powers, qq,
                                             precision=_EINSUM_PRECISION)
            pe = jnp.stack([th_end ** (q + 1) for q in range(s)], axis=-1)
            y_end = yn + jnp.einsum("mq,mqd->md", pe, qq,
                                    precision=_EINSUM_PRECISION)
        else:
            # primal interpolant at the backward stage nodes
            # τ_i = t_end + c_i·h_b ⇒ θ_i = 1 − c_i on the step polynomial
            h_eff = hn
            t_end = tn + hn
            hb = jnp.where(live, -hn, -1.0)           # signed backward step
            theta = 1.0 - c_nodes                     # [s]
            powers = jnp.stack([theta ** (q + 1) for q in range(s)], axis=-1)
            ys = yn[:, None, :] + jnp.einsum("sq,mqd->msd", powers, qq,
                                             precision=_EINSUM_PRECISION)
            y_end = yn + jnp.sum(qq, axis=1)          # poly(1)
        taus = t_end[:, None] + c_nodes[None, :] * hb[:, None]

        # dead lanes: substitute safe (finite) evaluation points
        ys = jnp.where(live[:, None, None], ys, yT[:, None, :])
        taus = jnp.where(live[:, None], taus, t_term[:, None])
        y_end = jnp.where(live[:, None], y_end, yT)
        t_end_s = jnp.where(live, t_end, t_term)

        # per-stage vjp pulls: y-only (iteration) and (y, θ) (quadrature)
        pulls_y, pulls_full = [], []
        srcs, pulls_l = [], []
        for i in range(s):
            ti, yi = taus[:, i], ys[:, i]
            _, py = jax.vjp(lambda yy, _t=ti: f2(_t, yy, dleaves), yi)
            _, pf = jax.vjp(lambda yy, dl, _t=ti: f2(_t, yy, dl), yi,
                            dleaves)
            pulls_y.append(py)
            pulls_full.append(pf)
            if use_cost:
                # running-cost source: λ' picks up −l_yᵀq̄ (constant across
                # the linear iteration), parameters q̄·∫ l_θ dt
                _, pl = jax.vjp(lambda yy, dl, _t=ti: lfun(_t, yy, dl), yi,
                                dleaves)
                srcs.append(pl(qb)[0])               # [M, D]
                pulls_l.append(pl)

        # frozen iteration matrix: (γ/h_b·Mᵀ + Jᵀ) from J at the step's
        # later end (where the backward step starts)
        if use_gmres:
            # matrix-free: Jᵀ·v by a vjp pull at the frozen point; the
            # preconditioner of −Jᵀ by transposing the probed structure —
            # bands: (Jᵀ)_dl[i] = J_du[i−1], (Jᵀ)_du[i] = J_dl[i+1] (line-
            # boundary zeros map to line-boundary zeros, so 'lines' rides
            # the same shift); blocks: per-block transpose.
            from janus_tpu.control.precond import (blocks_of_jacobian,
                                                   line_tridiag_bands,
                                                   tridiag_bands)
            from janus_tpu.solve.radau import (_gmres_block_core,
                                               _gmres_core,
                                               _gmres_mass_blocks,
                                               _gmres_mass_ops)
            pull_lin = jax.vjp(
                lambda yy: f2(t_end_s, yy, dleaves), y_end)[1]
            jv_adj = lambda v: -pull_lin(v)[0]        # noqa: E731
            g_iters = 0 if opts.stage_solver == "tridiag" \
                else opts.gmres_iters
            if opts.precond == "block":
                blocks = blocks_of_jacobian(
                    lambda yy: f2(t_end_s, yy, dleaves), y_end,
                    opts.precond_block)
                blocks_adj = -jnp.swapaxes(blocks, -1, -2)
                mdotv_t, mblk_t = _gmres_mass_blocks(
                    massT, m, dim // opts.precond_block,
                    opts.precond_block, dtype)
                solve_real, solve_cplx = _gmres_block_core(
                    tab, jv_adj, blocks_adj, hb, mdotv_t, mblk_t, g_iters)
            else:
                if opts.precond == "lines":
                    dl, d, du = line_tridiag_bands(
                        lambda yy: f2(t_end_s, yy, dleaves), y_end,
                        opts.precond_block)
                else:
                    dl, d, du = tridiag_bands(
                        lambda yy: f2(t_end_s, yy, dleaves), y_end)
                z1 = jnp.zeros((m, 1), dtype)
                bands_adj = -jnp.stack(
                    [jnp.concatenate([z1, du[:, :-1]], axis=1), d,
                     jnp.concatenate([dl[:, 1:], z1], axis=1)], axis=1)
                solve_real, solve_cplx = _gmres_core(
                    tab, jv_adj, bands_adj, hb,
                    _gmres_mass_ops(massT, m, dim, bands_adj[:, 1]),
                    g_iters)
            ok = jnp.ones((m,), bool)
        else:
            jmat = jac_fn(t_end_s, y_end, dleaves)    # [M, D, D]
            jac_adj = -jnp.swapaxes(jmat, -1, -2)
            lu_r, piv_r, lu_c, piv_c, ok = _factorize(
                tab, hb, jac_adj, massT, opts.pivoting)

        # transformed simplified iteration on the LINEAR adjoint stage system
        lam_e = lam

        def g_stage(i, z_i):
            base = -pulls_y[i](lam_e + z_i)[0]
            return base - srcs[i] if use_cost else base

        init = (jnp.zeros((m, s, dim), dtype), jnp.zeros((m, s, dim), dtype),
                jnp.zeros((), jnp.int32), jnp.ones((), bool))

        def cond_it(stt):
            return stt[3] & (stt[2] < 10)

        def body_it(stt):
            w, z, it, _ = stt
            gs = jnp.stack([g_stage(i, z[:, i]) for i in range(s)], axis=1)
            tif = jnp.einsum("ij,mjd->mid", ti_mat, gs,
                             precision=_EINSUM_PRECISION)
            mw = mdotT(w)
            rhs_r = tif[:, 0] - (float(tab.mu_real) / hb)[:, None] * mw[:, 0]
            dws = [solve_real(rhs_r) if use_gmres
                   else lu_solve(lu_r, piv_r, rhs_r)]
            for p in range(npair):
                mu = tab.mu_complex[p]
                mur, mui = float(mu.real), float(mu.imag)
                w1, w2 = mw[:, 1 + 2 * p], mw[:, 2 + 2 * p]
                fr = tif[:, 1 + 2 * p] - (mur * w1 - mui * w2) / hb[:, None]
                fi = tif[:, 2 + 2 * p] - (mur * w2 + mui * w1) / hb[:, None]
                rhs2 = jnp.concatenate([fr, fi], axis=-1)
                sol = (solve_cplx(p, rhs2) if use_gmres
                       else lu_solve(lu_c[:, p], piv_c[:, p], rhs2))
                dws.append(sol[:, :dim])
                dws.append(sol[:, dim:])
            dw = jnp.stack(dws, axis=1)
            w2n = w + dw
            z2n = jnp.einsum("ij,mjd->mid", t_mat, w2n,
                             precision=_EINSUM_PRECISION)
            scale = 1.0 + jnp.abs(lam_e)[:, None, :]
            dn = cm.safe_sqrt(jnp.mean(jnp.square(dw / scale), axis=(1, 2)))
            keep = jnp.any(live & ok & (dn > tol) & jnp.isfinite(dn))
            return (w2n, z2n, it + 1, keep)

        _, z, _, _ = jax.lax.while_loop(cond_it, body_it, init)

        lam_n = lam_e + z[:, -1, :]                   # c_s = 1 ⇒ τ_s = t_n
        lam = jnp.where(live[:, None], lam_n, lam)
        bad = bad | (live & ~ok)

        # quadrature: ∂L/∂θ += h_eff Σ_i b_i · (∂f/∂θ)ᵀ ν(τ_i) (+ q̄·l_θ)
        for i in range(s):
            wgt = jnp.where(live, h_eff * b_w[i], 0.0)  # [M]
            lam_i = lam_e + z[:, i, :]
            contrib = pulls_full[i]((wgt[:, None] * lam_i))[1]
            grads = [ga + gc for ga, gc in zip(grads, contrib)]
            if use_cost:
                contrib_l = pulls_l[i](wgt[:, None] * qb)[1]
                grads = [ga + gc for ga, gc in zip(grads, contrib_l)]

        return (lam, grads, bad)

    ks = jnp.arange(cap - 1, -1, -1)
    (lam, grads, bad), _ = jax.lax.scan(step, (lam_init, grads0, bad0), ks)

    # y0 cotangent: λ(t0) = Mᵀ ν(t0)
    lam0 = mdotT(lam) if mass is not None else lam
    # t0 cotangent: dL/dt0 = −ν(t0)ᵀ f(t0, y0) − q̄·l(t0, y0)
    f_0 = f2(t0b, y0b, dleaves)
    t0bar = -jnp.sum(lam * f_0, axis=-1)
    if use_cost:
        t0bar = t0bar - jnp.sum(qb * lfun(t0b, y0b, dleaves), axis=-1)

    # poison everything if any lane overflowed the mesh or hit a singular
    # backward factorization — a silent wrong gradient is worse than NaN
    any_bad = jnp.any(bad)
    nan = jnp.asarray(jnp.nan, dtype)
    lam0 = jnp.where(any_bad, nan, lam0)
    grads = [jnp.where(any_bad, jnp.asarray(jnp.nan, g.dtype), g)
             for g in grads]
    t0bar = jnp.where(any_bad, nan, t0bar)
    tfbar = jnp.where(any_bad, nan, tfbar)
    return lam0, grads, t0bar, tfbar
