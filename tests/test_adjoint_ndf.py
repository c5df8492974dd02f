"""Discrete-adjoint reverse-mode gradients through the adaptive NDF/BDF solve.

ndf_adjoint (solve/adjoint_ndf.py) carries a difference-ARRAY cotangent
backward over the recorded accepted-step mesh; the multistep structure is
verified by two exact invariants before any gradient is trusted:

1. chain — D'_{k+1} == T_{k+1} ⋆ HistUpdate(D'_k, d_k) to roundoff: the
   recorded composed inter-step transforms reproduce the forward evolution
   (every clamp/reject/adapt rescale folded in);
2. terminal — y(T) == HistUpdate(D'_last, d_last)[0] bitwise.

Gradient oracles: central FD of the full solver (O(rtol) agreement — the
frozen-control convention) on VdP incl. pytree args, heterogeneous lanes,
boundary times, the Robertson index-1 DAE, and t_eval trajectory fitting
(whose FD oracle chains warm-started segments exactly as the adjoint does —
a multistep solver RESTARTS its history at each sample).

The reference's BDF family (bdf_torch.py; CVODES BDF role) has forward
duals at most; no reverse mode anywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint_ndf import _hist_update, ndf_adjoint
from janus_tpu.solve.ndf import _apply_ru, solve_bdf

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


OPTS = Options(rtol=1e-7, atol=1e-10, adjoint_steps=512)


def _rob_dae(t, y, k):
    """Robertson, semi-explicit index-1 form: 0 = 1 − y1 − y2 − y3."""
    k1, k2, k3 = k[..., 0], k[..., 1], k[..., 2]
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    f1 = -k1 * y1 + k3 * y2 * y3
    f2 = k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3
    return jnp.stack([f1, f2, 1.0 - y1 - y2 - y3], axis=-1)


def test_mesh_chain_and_terminal_invariants():
    """The recorded mesh IS the forward evolution: composed transforms chain
    the accept-updates exactly, and y(T) is the last update's slot 0."""
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    sol = solve_bdf(vdp_rhs, jnp.zeros(m), jnp.full(m, 3.0), y0, mu, OPTS,
                    _mesh_size=512)
    assert np.all(np.asarray(sol.status) == 1)
    nacc = np.asarray(sol.stats["naccept"])
    mesh = sol.mesh
    # orders actually vary (the variable-order machinery is exercised)
    assert np.asarray(mesh["k"])[0, :nacc[0]].max() >= 3
    for i in range(int(nacc.min()) - 1):
        Dh = _hist_update(mesh["D"][:, i], mesh["d"][:, i], mesh["k"][:, i])
        Dp_next = _apply_ru(mesh["T"][:, i + 1], Dh)
        np.testing.assert_allclose(np.asarray(Dp_next),
                                   np.asarray(mesh["D"][:, i + 1]),
                                   rtol=0, atol=1e-12)
    for lane in range(m):
        i = int(nacc[lane]) - 1
        Dh = _hist_update(mesh["D"][:, i], mesh["d"][:, i], mesh["k"][:, i])
        np.testing.assert_allclose(np.asarray(Dh[lane, 0]),
                                   np.asarray(sol.y[lane]),
                                   rtol=0, atol=1e-13)


def test_matches_fd_and_boundary_times():
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        yT = ndf_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=OPTS)
        return jnp.sum(yT ** 2)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 3.0)

    def lfd(y0v, muv, t0v, tfv):
        s = solve_bdf(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                      y0v, muv, OPTS)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-6
    for i in range(m):
        ei = eps * max(1.0, float(mu[i]))
        fd = (lfd(y0, mu.at[i].add(ei), 0.0, 3.0)
              - lfd(y0, mu.at[i].add(-ei), 0.0, 3.0)) / (2 * ei)
        assert abs(g_mu[i] - fd) <= 5e-5 * abs(fd) + 1e-6
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 3.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 3.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 5e-5 * abs(fd) + 1e-6
    fd_t0 = (lfd(y0, mu, eps, 3.0) - lfd(y0, mu, -eps, 3.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 3.0 + eps)
             - lfd(y0, mu, 0.0, 3.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf)


def test_classical_bdf_constants_route():
    """ndf=False (classical BDF) must replay with the matching constants —
    a mismatch would break the O(rtol) FD agreement."""
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([10.0])

    def loss(y0):
        yT = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu, options=OPTS,
                         ndf=False)
        return jnp.sum(yT ** 2)

    g = jax.grad(loss)(y0)

    def lfd(y0v):
        s = solve_bdf(vdp_rhs, jnp.zeros(1), jnp.full(1, 2.0), y0v, mu,
                      OPTS, ndf=False)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-6
    fd = (lfd(y0.at[0, 0].add(eps)) - lfd(y0.at[0, 0].add(-eps))) / (2 * eps)
    assert abs(g[0, 0] - fd) <= 5e-5 * abs(fd) + 1e-6


def test_dae_index1_robertson():
    """Singular-mass (index-1) y0/args gradients through the NDF corrector
    and the linearized-BE startup (the ode15s DAE role)."""
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    m = 2
    y0 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (m, 1))
    k = jnp.tile(jnp.array([0.04, 3e7, 1e4]), (m, 1)) \
        * jnp.array([[1.0], [1.3]])
    opts = Options(rtol=1e-7, atol=1e-12, adjoint_steps=512)

    def loss(y0, k):
        yT = ndf_adjoint(_rob_dae, (0.0, 100.0), y0, args=k,
                         options=opts, mass=mass)
        return jnp.sum(yT[:, 1] ** 2 * 1e8)

    g_y0, g_k = jax.grad(loss, argnums=(0, 1))(y0, k)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_k))

    def lfd(kv):
        s = solve_bdf(_rob_dae, jnp.zeros(m), jnp.full(m, 100.0), y0, kv,
                      opts, mass=mass)
        return float(jnp.sum(s.y[:, 1] ** 2 * 1e8))

    eps = 1e-3 * 3e7
    fd = (lfd(k.at[0, 1].add(eps)) - lfd(k.at[0, 1].add(-eps))) / (2 * eps)
    assert abs(g_k[0, 1] - fd) <= 5e-4 * abs(fd)


def test_overflow_poisons_gradient():
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=8)
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([50.0])

    g = jax.grad(lambda y0_: jnp.sum(
        ndf_adjoint(vdp_rhs, (0.0, 3.0), y0_, args=mu,
                    options=opts) ** 2))(y0)
    assert bool(jnp.all(jnp.isnan(g)))


def test_pytree_args_and_heterogeneous_lanes():
    """args as a pytree with shared + per-lane leaves; lanes finish at very
    different step counts (live-mask + injection-slot paths).

    rtol 1e-9: the mu=400 lane amplifies the frozen-mesh-vs-FD gap (both
    differentiate slightly different discrete maps) to 4e-4 rel at rtol
    1e-7; measured O(rtol) convergence 4e-4 -> 8e-7 -> 8e-8 over rtol
    1e-7/-9/-11 — discretization noise, not an adjoint defect (the
    CLAUDE.md frozen-mesh rule: tighten rtol)."""
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096)

    def rhs(t, y, p):
        mu, drive = p["mu"], p["drive"]
        x, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [v, mu * (1.0 - x ** 2) * v - x + drive * jnp.sin(t)], axis=-1)

    m = 3
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0], [0.5, -0.5]])
    p = {"mu": jnp.array([1.0, 100.0, 400.0]), "drive": jnp.float64(0.3)}

    def loss(y0, p):
        yT = ndf_adjoint(rhs, (0.0, 2.0), y0, args=p, options=opts)
        return jnp.sum(yT[:, 0] ** 2)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p)
    assert jnp.all(jnp.isfinite(g_y0))
    assert jnp.all(jnp.isfinite(g_p["mu"])) and jnp.isfinite(g_p["drive"])

    def lfd(pv):
        s = solve_bdf(rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, pv, opts)
        return float(jnp.sum(s.y[:, 0] ** 2))

    eps = 1e-6
    fd = (lfd({**p, "drive": p["drive"] + eps})
          - lfd({**p, "drive": p["drive"] - eps})) / (2 * eps)
    assert abs(g_p["drive"] - fd) <= 5e-5 * abs(fd) + 1e-6
    for i in range(m):
        ei = eps * max(1.0, float(p["mu"][i]))
        fd = (lfd({**p, "mu": p["mu"].at[i].add(ei)})
              - lfd({**p, "mu": p["mu"].at[i].add(-ei)})) / (2 * ei)
        assert abs(g_p["mu"][i] - fd) <= 5e-5 * abs(fd) + 1e-6


def test_t_eval_trajectory_fitting():
    """t_eval mode: chained warm-started RESTARTED segments (the multistep
    convention); FD oracle chains segments the same way via _h0/h_next."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    ts = jnp.array([0.7, 1.4, 2.1, 3.0])
    m = 2

    def loss(y0, mu, ts):
        ys = ndf_adjoint(vdp_rhs, (0.0, 3.0), y0, args=mu, options=OPTS,
                         t_eval=ts)
        return jnp.sum(ys ** 2)

    g_y0, g_mu, g_ts = jax.grad(loss, argnums=(0, 1, 2))(y0, mu, ts)

    def lfd(y0v, muv, tsv):
        tot, y, h = 0.0, y0v, jnp.zeros(m)
        lo = 0.0
        for j in range(tsv.shape[0]):
            s = solve_bdf(vdp_rhs, jnp.full(m, lo), jnp.full(m, tsv[j]),
                          y, muv, OPTS, _h0=h)
            y, h, lo = s.y, s.h_next, float(tsv[j])
            tot += float(jnp.sum(y ** 2))
        return tot

    eps = 1e-6
    for i in range(m):
        ei = eps * max(1.0, float(mu[i]))
        fd = (lfd(y0, mu.at[i].add(ei), ts)
              - lfd(y0, mu.at[i].add(-ei), ts)) / (2 * ei)
        assert abs(g_mu[i] - fd) <= 5e-5 * abs(fd) + 1e-6
        fd = (lfd(y0.at[i, 0].add(eps), mu, ts)
              - lfd(y0.at[i, 0].add(-eps), mu, ts)) / (2 * eps)
        assert abs(g_y0[i, 0] - fd) <= 5e-5 * abs(fd) + 1e-6
    for j in range(3):        # interior sample times (last ±eps exits tspan)
        fd = (lfd(y0, mu, ts.at[j].add(eps))
              - lfd(y0, mu, ts.at[j].add(-eps))) / (2 * eps)
        assert abs(g_ts[j] - fd) <= 5e-5 * abs(fd) + 1e-6


def test_ndf_adjoint_terminal_events_mixed_batch_vs_fd():
    """events= on the multistep discrete adjoint: the triggering lane's
    (y*, t*) cotangents pull through the vjp of the backward-difference
    interpolant (linear in the replayed history array) with θ* re-polished
    from the recorded root; the no-trigger lane keeps the plain e₀ ⊗ ȳ
    injection (+ the t̄ → tf boundary identity). Oracle: central FD of the
    full solver."""
    from janus_tpu.solve import solve_ivp
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([1.2, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096,
                   max_steps=8192)

    def loss(y0_, mu_):
        y, t = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                           options=opts, events=ev)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t), (y, t)

    (val, (y, t)), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 2.0 and float(t[1]) == 2.0

    # forward parity: the adjoint's primal IS the events forward solve
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), y0, method="bdf", args=mu,
                    options=opts, events=ev)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(sol.y))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(sol.t))

    def lv(y0_, mu_):
        s = solve_ivp(vdp_rhs, (0.0, 2.0), y0_, method="bdf", args=mu_,
                      options=opts, events=ev)
        return float(jnp.sum(s.y ** 2) + 2.0 * jnp.sum(s.t))

    eps = 1e-6
    for i in range(2):
        for j in range(2):
            e = jnp.zeros((2, 2)).at[i, j].set(eps)
            fd = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
            assert abs(grads[0][i, j] - fd) <= 2e-5 * max(abs(fd), 1.0) \
                + 2e-6
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(grads[1][i] - fd) <= 2e-5 * max(abs(fd), 1.0) + 2e-6


def test_ndf_adjoint_events_guards():
    from janus_tpu.solve.events import Event
    ev_nt = Event(lambda t, y, a: y[..., 0], terminal=False)
    with pytest.raises(ValueError, match="terminal"):
        ndf_adjoint(vdp_rhs, (0.0, 1.0), jnp.zeros((1, 2)), args=1.0,
                    events=ev_nt)


@pytest.mark.parametrize("ss", ["gmres", "tridiag"])
def test_matrix_free_reverse_large_d_mol(ss):
    """stage_solver='gmres'/'tridiag' reverse mode on a D=96 Fisher-KPP MOL
    line — the backward IFT solves run (M − cJ)ᵀw = λ_d matrix-free (Jᵀ·v
    by vjp pull, TRANSPOSED probed Thomas preconditioner,
    gmres_shifted_solver_T) with J never materialized; 'tridiag' direct-
    solves the transposed tridiagonal structure (exact here: 3-point
    stencil). Gradients must match FD re-solves. Reference role: BDF with
    Krylov solves (examples/cpp/vdp_bdf_gmres.cpp,
    odesolvers/linsolve.py:60-111) — forward-only there."""
    from tests.test_radau_gmres import _mol_rhs

    d = 96
    dx = 1.0 / (d + 1)
    xg = np.linspace(dx, 1.0 - dx, d)
    rhs = _mol_rhs(dx)
    m = 2
    y0 = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2))[None], (m, 1))
    rates0 = jnp.array([1.0, 8.0])[:, None]
    opts = Options(rtol=1e-7, atol=1e-10, stage_solver=ss,
                   gmres_iters=25, adjoint_steps=512)

    def loss(z, rates):
        yT = ndf_adjoint(rhs, (0.0, 0.4), z, args=(0.01, rates),
                         options=opts)
        return jnp.sum(jnp.asarray(xg)[None, :] * yT ** 2)

    g_y0, g_r = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, rates0)
    assert bool(jnp.all(jnp.isfinite(g_y0))) and bool(
        jnp.all(jnp.isfinite(g_r)))
    lv = jax.jit(loss)
    eps = 1e-5
    for i in range(m):
        e = jnp.zeros((m, 1)).at[i, 0].set(eps)
        fd = (lv(y0, rates0 + e) - lv(y0, rates0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_r[i, 0]), float(fd), rtol=2e-4)
    for j in (17, 48):                       # spot-check y0 components
        e = jnp.zeros((m, d)).at[0, j].set(eps)
        fd = (lv(y0 + e, rates0) - lv(y0 - e, rates0)) / (2 * eps)
        np.testing.assert_allclose(float(g_y0[0, j]), float(fd), rtol=5e-4,
                                   atol=1e-8)


def _lq(t, y, args):
    return y[..., 0] ** 2 + 0.1 * y[..., 1] ** 2


def test_cost_terminal_fd_and_parity():
    """cost= (integral Lagrange term) on the multistep adjoint: q parity
    with the forward quad= accumulation is bit-exact (the GL-3 increment
    is recomputed on the backward-difference interpolant of the replayed
    history array — linear in (D', d), composing with the corrector IFT
    and rescale chain), and gradients match central FD of the full
    solver. Bounds: 3e-5·|fd| + floor (CLAUDE.md round-4 FD-bound note)."""
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=1024,
                   max_steps=4096)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([3.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        y, q = ndf_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=opts,
                           cost=_lq)
        return jnp.sum(y ** 2) + jnp.sum(q)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 2.0)

    # forward parity: the primal q is the quad= accumulation bit-for-bit
    q_adj = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu, options=opts,
                        cost=_lq)[1]
    s_fwd = solve_bdf(vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, mu,
                      opts, quad=_lq)
    np.testing.assert_array_equal(np.asarray(q_adj), np.asarray(s_fwd.quad))

    def lfd(y0v, muv, t0v, tfv):
        s = solve_bdf(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                      y0v, muv, opts, quad=_lq)
        return float(jnp.sum(s.y ** 2) + jnp.sum(s.quad))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 2.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 2.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * abs(fd) + 2e-6
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 2.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 2.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 3e-5 * abs(fd) + 1e-5
    fd_t0 = (lfd(y0, mu, eps, 2.0) - lfd(y0, mu, -eps, 2.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 2.0 + eps)
             - lfd(y0, mu, 0.0, 2.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0) + 2e-6
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf) + 2e-6


def test_cost_with_terminal_events_mixed_batch():
    """cost= + events= on the multistep adjoint: q truncates at t*; the
    triggering lane's final increment re-quadratures on [0, θ*] through
    the replayed backward-difference interpolant, so dq/dt* rides the
    polished-root vjp. Mixed trigger/no-trigger batch vs FD."""
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([1.2, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096,
                   max_steps=8192)

    def loss(y0_, mu_):
        y, t, q = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                              options=opts, events=ev, cost=_lq)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t) + jnp.sum(q), t

    (val, t), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 2.0 and float(t[1]) == 2.0

    def lv(y0_, mu_):
        s = solve_bdf(vdp_rhs, 0.0, 2.0, y0_, mu_, opts, events=ev,
                      quad=_lq)
        return float(jnp.sum(s.y ** 2) + 2.0 * jnp.sum(s.t)
                     + jnp.sum(s.quad))

    eps = 1e-6
    for i in range(2):
        for j in range(2):
            e = jnp.zeros((2, 2)).at[i, j].set(eps)
            fd = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
            assert abs(grads[0][i, j] - fd) <= 2e-5 * max(abs(fd), 1.0)
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(grads[1][i] - fd) <= 2e-5 * max(abs(fd), 1.0)


def test_dae_boundary_time_gradients_n_alg():
    """n_alg= boundary-time cotangents on the index-1 Robertson DAE: t0/tf
    gradients use the CONSTRAINED velocity (adjoint.constrained_ydot) —
    the previous invertible-mass restriction is gone. Oracle: central FD
    of the full solver in tf (t0 = -tf by autonomy + the q-free loss)."""
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    y0 = jnp.array([[1.0, 0.0, 0.0]])
    k = jnp.array([[0.04, 3e7, 1e4]])
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=512,
                   max_steps=4096)

    def loss(t0, tf):
        yT = ndf_adjoint(_rob_dae, (t0, tf), y0, args=k, options=opts,
                  mass=mass, n_alg=1)
        return jnp.sum(yT ** 2)

    g_t0, g_tf = jax.grad(loss, argnums=(0, 1))(0.0, 10.0)

    def lfd(tfv):
        s = solve_bdf(_rob_dae, jnp.zeros(1), jnp.full(1, tfv), y0, k, opts, mass=mass)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-4
    fd_tf = (lfd(10.0 + eps) - lfd(10.0 - eps)) / (2 * eps)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf) + 1e-10
    # autonomous system: d/dt0 = -d/dtf
    assert abs(g_t0 + fd_tf) <= 1e-4 * abs(fd_tf) + 1e-8


def test_events_plus_t_eval_trajectory_fitting():
    """events + t_eval on the discrete adjoint (the dopri seg_ev
    convention): samples past t* are NaN, a triggered lane's later
    segments collapse to zero-length solves, and the masked-fit gradient
    matches central FD of the same composed loss."""
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([1.2, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=2048,
                   max_steps=8192)
    ts = jnp.array([0.5, 1.0, 1.5, 2.0])

    def loss(y0_, mu_):
        ys, yF, tt = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                          options=opts, t_eval=ts, events=ev)
        fit = jnp.where(jnp.isfinite(ys), ys ** 2, 0.0)
        return jnp.sum(fit) + jnp.sum(yF[:, 1] ** 2) + 2.0 * jnp.sum(tt)

    ys, yF, tt = ndf_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                      options=opts, t_eval=ts, events=ev)
    assert float(tt[0]) < 2.0 and float(tt[1]) == 2.0
    assert bool(jnp.all(jnp.isnan(ys[0, 3]))) \
        and bool(jnp.all(jnp.isfinite(ys[0, :3]))) \
        and bool(jnp.all(jnp.isfinite(ys[1])))

    g = jax.grad(loss, argnums=(0, 1))(y0, mu)
    lv = jax.jit(loss)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros((2, 2)).at[i, 0].set(eps)
        fd = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
        assert abs(g[0][i, 0] - fd) <= 2e-5 * max(abs(fd), 1.0)
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(g[1][i] - fd) <= 2e-5 * max(abs(fd), 1.0)
