"""Discrete-adjoint reverse-mode gradients through adaptive Dormand-Prince.

dopri_adjoint (solve/adjoint_dopri.py) is a jax.custom_vjp whose backward
pass scans jax.vjp pulls of a frozen-(t, h) explicit-RK step replay over
the recorded accepted-step mesh — reverse mode through the ADAPTIVE
explicit family (the neural-ODE / torchdiffeq discretize-then-optimize
role). Oracles, sharpest first:

1. bit-exact replay — _one_step at each recorded slot must reproduce the
   NEXT recorded step-start state exactly (the FSAL stage-0 value equals a
   fresh f(t, y), so no forward-pass change is needed for this to hold);
2. jax's own AD of the frozen replay chain — the hand-rolled backward scan
   is vjp-of-that-chain by construction, roundoff agreement;
3. central FD of the full solver — agrees to O(rtol); the controller's
   mesh sensitivity is the only difference (the rodas_adjoint contract).

The reference's explicit family has forward duals only (dopri853ted.hpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint_dopri import _one_step, dopri_adjoint
from janus_tpu.solve.dopri import TABLEAUS, solve_erk

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


OPTS = Options(rtol=1e-8, atol=1e-11, adjoint_steps=256)


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_replay_reproduces_forward_mesh(method):
    """_one_step at each recorded (t, h, y) slot equals the next recorded
    step-start state bitwise — FSAL reuse IS a fresh evaluation."""
    m = 2
    tab = TABLEAUS[method]
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([0.5, 2.0])
    sol = solve_erk(tab, vdp_rhs, jnp.zeros(m), jnp.full(m, 4.0), y0, mu,
                    OPTS, _mesh_size=256)
    assert np.all(np.asarray(sol.status) == 1)
    nacc = np.asarray(sol.stats["naccept"])
    mesh = sol.mesh
    rep = jax.jit(lambda t, h, y: _one_step(tab, vdp_rhs, t, h, y, mu))
    # roundoff, not bitwise: the two jitted programs may fuse FMAs
    # differently (the XLA:CPU lesson from linalg/gmres.py)
    for i in range(int(nacc.min()) - 1):
        yrep = rep(mesh["t"][:, i], mesh["h"][:, i], mesh["y"][:, i])
        np.testing.assert_allclose(np.asarray(yrep),
                                   np.asarray(mesh["y"][:, i + 1]),
                                   rtol=0, atol=1e-13)
    for lane in range(m):
        i = int(nacc[lane]) - 1
        yrep = rep(mesh["t"][:, i], mesh["h"][:, i], mesh["y"][:, i])
        np.testing.assert_allclose(np.asarray(yrep[lane]),
                                   np.asarray(sol.y[lane]),
                                   rtol=0, atol=1e-13)


def test_backward_scan_equals_ad_of_frozen_chain():
    """grad(dopri_adjoint) == jax.grad of the frozen replay chain to
    roundoff: the backward scan is vjp-of-that-chain by construction."""
    opts = Options(rtol=1e-6, atol=1e-9, adjoint_steps=64)
    tab = TABLEAUS["dopri5"]
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0]])
    mu = jnp.array([0.3, 1.5])
    sol = solve_erk(tab, vdp_rhs, jnp.zeros(m), jnp.full(m, 4.0), y0, mu,
                    opts, _mesh_size=64)
    assert np.all(np.asarray(sol.status) == 1)
    mesh = jax.lax.stop_gradient(sol.mesh)
    nacc = sol.stats["naccept"]

    def chain_loss(y0v, muv):
        def body(y, i):
            live = i < nacc
            tk = jnp.where(live, mesh["t"][:, i], 0.0)
            hk = jnp.where(live, mesh["h"][:, i], 1.0)
            ystep = _one_step(tab, vdp_rhs, tk, hk, y, muv)
            return jnp.where(live[:, None], ystep, y), None

        yT, _ = jax.lax.scan(body, y0v, jnp.arange(64))
        return jnp.sum(yT ** 2)

    g_y0_ref, g_mu_ref = jax.jit(jax.grad(chain_loss, argnums=(0, 1)))(
        y0, mu)

    def loss(y0v, muv):
        yT = dopri_adjoint(vdp_rhs, (0.0, 4.0), y0v, args=muv, options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    np.testing.assert_allclose(np.asarray(g_y0), np.asarray(g_y0_ref),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(g_mu), np.asarray(g_mu_ref),
                               rtol=1e-12, atol=0)


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_matches_fd_and_boundary_times(method):
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([0.5, 2.0])
    m = 2
    tab = TABLEAUS[method]

    def loss(y0, mu, t0, tf):
        yT = dopri_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=OPTS,
                           method=method)
        return jnp.sum(yT ** 2)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 4.0)

    def lfd(y0v, muv, t0v, tfv):
        s = solve_erk(tab, vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                      y0v, muv, OPTS)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 4.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 4.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 1e-5 * max(abs(fd), 1e-10)
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 4.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 4.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 1e-5 * max(abs(fd), 1e-10)
    fd_t0 = (lfd(y0, mu, eps, 4.0) - lfd(y0, mu, -eps, 4.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 4.0 + eps)
             - lfd(y0, mu, 0.0, 4.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-5 * abs(fd_t0)
    assert abs(g_tf - fd_tf) <= 1e-5 * abs(fd_tf)


def test_overflow_poisons_gradient():
    """A lane whose accepted-step count exceeds adjoint_steps must yield NaN
    (never a silently-truncated gradient)."""
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=4)
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([3.0])

    g = jax.grad(lambda y0_: jnp.sum(
        dopri_adjoint(vdp_rhs, (0.0, 4.0), y0_, args=mu,
                      options=opts) ** 2))(y0)
    assert bool(jnp.all(jnp.isnan(g)))


def test_dead_slot_stiff_args_stay_finite():
    """Heterogeneous horizons: the early-finishing lane's dead slots replay
    the identity (masked cascade) — its STIFF parameters must not overflow
    the benign-substitute stage cascade into NaN arg gradients."""
    opts = Options(rtol=1e-6, atol=1e-9, adjoint_steps=512)

    def rhs(t, y, p):
        # moderately stiff decay lane next to a slow lane: the stiff lane
        # finishes its span in many fewer dead-ring slots
        return jnp.stack([-p * y[..., 0], y[..., 1] * 0.1], axis=-1)

    y0 = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    p = jnp.array([800.0, 0.1])

    def loss(y0, p):
        yT = dopri_adjoint(rhs, (0.0, 1.0), y0, args=p, options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_p))
    # FD cross-check on the slow lane (the stiff lane's grad underflows)
    def lfd(pv):
        s = solve_erk(TABLEAUS["dopri5"], rhs, jnp.zeros(2), jnp.ones(2),
                      y0, pv, opts)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-5
    fd = (lfd(p.at[1].add(eps)) - lfd(p.at[1].add(-eps))) / (2 * eps)
    assert abs(g_p[1] - fd) <= 1e-4 * max(abs(fd), 1e-10)


def test_t_eval_trajectory_fitting_pytree_args():
    """t_eval mode with pytree args: gradients w.r.t. y0, shared + per-lane
    args leaves, and the SAMPLE TIMES all match FD of the plain solve."""
    def rhs(t, y, p):
        mu, drive = p["mu"], p["drive"]
        x, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [v, mu * (1.0 - x ** 2) * v - x + drive * jnp.sin(t)], axis=-1)

    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0]])
    p = {"mu": jnp.array([0.5, 2.0]), "drive": jnp.float64(0.3)}
    ts = jnp.array([1.0, 2.2, 3.1, 4.0])

    def loss(y0, p, ts):
        ys = dopri_adjoint(rhs, (0.0, 4.0), y0, args=p, options=OPTS,
                           t_eval=ts, method="dopri853")
        return jnp.sum(ys ** 2)

    g_y0, g_p, g_ts = jax.grad(loss, argnums=(0, 1, 2))(y0, p, ts)

    def lfd(y0v, pv, tsv):
        s = solve_erk(TABLEAUS["dopri853"], rhs, jnp.zeros(m),
                      jnp.full(m, 4.0), y0v, pv, OPTS, t_eval=tsv)
        return float(jnp.sum(s.ys ** 2))

    eps = 1e-6
    fd = (lfd(y0, {**p, "drive": p["drive"] + eps}, ts)
          - lfd(y0, {**p, "drive": p["drive"] - eps}, ts)) / (2 * eps)
    assert abs(g_p["drive"] - fd) <= 1e-5 * max(abs(fd), 1e-8)
    for i in range(m):
        fd = (lfd(y0, {**p, "mu": p["mu"].at[i].add(eps)}, ts)
              - lfd(y0, {**p, "mu": p["mu"].at[i].add(-eps)}, ts)) / (2 * eps)
        assert abs(g_p["mu"][i] - fd) <= 1e-5 * max(abs(fd), 1e-8)
        fd = (lfd(y0.at[i, 0].add(eps), p, ts)
              - lfd(y0.at[i, 0].add(-eps), p, ts)) / (2 * eps)
        assert abs(g_y0[i, 0] - fd) <= 1e-5 * abs(fd)
    for j in range(3):        # interior sample times (last ±eps exits tspan)
        fd = (lfd(y0, p, ts.at[j].add(eps))
              - lfd(y0, p, ts.at[j].add(-eps))) / (2 * eps)
        assert abs(g_ts[j] - fd) <= 1e-5 * abs(fd)


def test_dopri_adjoint_terminal_events_mixed_batch():
    """events= on the explicit discrete adjoint (the neural-ODE-with-
    stopping-condition path): mixed trigger/no-trigger batch vs an
    ANALYTIC oracle. Harmonic x = cos(w t), event x = c: t* = acos(c)/w
    is independent of w·t* → L = c² + w²(1−c²) + 2·acos(c)/w has
    dL/dw = 2w(1−c²) − 2·acos(c)/w². (FD is the WRONG oracle at tight
    rtol: the mesh-noise/eps ratio diverges — measured eps=1e-7 gives
    -0.7129 vs analytic -0.71220735; the adjoint hits it to 1e-8.)"""
    from janus_tpu.solve import solve_ivp
    from janus_tpu.solve.events import Event

    w = jnp.array([1.0, 1.3])
    y0 = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    c = 0.3
    thr = jnp.array([c, -50.0])     # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)

    def rhs(t, y, a):
        return jnp.stack([y[..., 1], -(a ** 2) * y[..., 0]], axis=-1)

    for method in ("dopri5", "dopri853"):
        def loss(y0_, w_):
            y, t = dopri_adjoint(rhs, (0.0, 2.0), y0_, args=w_,
                                 options=opts, method=method, events=ev)
            return jnp.sum(y ** 2) + 2.0 * jnp.sum(t), (y, t)

        (val, (y, t)), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(y0, w)
        np.testing.assert_allclose(float(t[0]), np.arccos(c) / float(w[0]),
                                   rtol=1e-10)
        assert float(t[1]) == 2.0

        # forward parity
        sol = solve_ivp(rhs, (0.0, 2.0), y0, method=method, args=w,
                        options=opts, events=ev)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(sol.y))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(sol.t))

        # analytic lane-0 parameter gradient
        w0 = float(w[0])
        dldw = 2 * w0 * (1 - c ** 2) - 2 * np.arccos(c) / w0 ** 2
        np.testing.assert_allclose(float(grads[1][0]), dldw, rtol=1e-6,
                                   err_msg=method)
        # no-trigger lane: L1 = cos²(2w) + 4w²sin²(2w)/4... compute directly:
        # y(2) = (cos(2w), -w sin(2w)); L1 = cos² + w² sin² + 2·2
        w1 = float(w[1])
        dl1 = (-2 * np.cos(2 * w1) * np.sin(2 * w1) * 2
               + 2 * w1 * np.sin(2 * w1) ** 2
               + w1 ** 2 * 2 * np.sin(2 * w1) * np.cos(2 * w1) * 2)
        np.testing.assert_allclose(float(grads[1][1]), dl1, rtol=1e-6,
                                   err_msg=method)


def test_dopri_adjoint_events_guards():
    from janus_tpu.solve.events import Event
    ev_nt = Event(lambda t, y, a: y[..., 0], terminal=False)
    with pytest.raises(ValueError, match="terminal"):
        dopri_adjoint(lambda t, y, a: -y, (0.0, 1.0), jnp.zeros((1, 2)),
                      events=ev_nt)


def test_events_plus_t_eval_trajectory_fitting():
    """events + t_eval (the canonical neural-ODE-with-stopping workload):
    samples past t* are NaN, a triggered lane's later segments collapse to
    zero-length solves, and the masked-fit gradient matches BOTH the
    continuous radau_adjoint on the same composition and central FD."""
    from janus_tpu.solve.adjoint import radau_adjoint
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([1.2, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=2048,
                   max_steps=8192)
    ts = jnp.array([0.5, 1.0, 1.5, 2.0])

    def loss(y0_, mu_, solver):
        ys, yF, tt = solver(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                            options=opts, t_eval=ts, events=ev)
        fit = jnp.where(jnp.isfinite(ys), ys ** 2, 0.0)
        return jnp.sum(fit) + jnp.sum(yF[:, 1] ** 2) + 2.0 * jnp.sum(tt)

    ys, yF, tt = dopri_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                               options=opts, t_eval=ts, events=ev)
    assert float(tt[0]) < 2.0 and float(tt[1]) == 2.0
    assert bool(jnp.all(jnp.isnan(ys[0, 3]))) \
        and bool(jnp.all(jnp.isfinite(ys[0, :3]))) \
        and bool(jnp.all(jnp.isfinite(ys[1])))

    g = jax.grad(lambda a, b: loss(a, b, dopri_adjoint),
                 argnums=(0, 1))(y0, mu)
    gr = jax.grad(lambda a, b: loss(a, b, radau_adjoint),
                  argnums=(0, 1))(y0, mu)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gr[1]),
                               rtol=0, atol=2e-5)

    lv = jax.jit(lambda a, b: loss(a, b, dopri_adjoint))
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros((2, 2)).at[i, 0].set(eps)
        fd = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
        assert abs(g[0][i, 0] - fd) <= 2e-5 * max(abs(fd), 1.0)
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(g[1][i] - fd) <= 2e-5 * max(abs(fd), 1.0)


def _lq(t, y, args):
    return y[..., 0] ** 2 + 0.1 * y[..., 1] ** 2


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_cost_terminal_fd_and_forward_parity(method):
    """cost= (integral Lagrange term): the primal q is the forward quad=
    accumulation bit-for-bit; the q̄ pull through each replayed step's
    GL-3 increment on the rebuilt dense interpolant matches central FD."""
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=512,
                   max_steps=2048)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([1.0, 3.0])
    m = 2
    tab = TABLEAUS[method]

    def loss(y0, mu, t0, tf):
        y, q = dopri_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=opts,
                             cost=_lq, method=method)
        return jnp.sum(y ** 2) + jnp.sum(q)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 2.0)

    q_adj = dopri_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu, options=opts,
                          cost=_lq, method=method)[1]
    s_fwd = solve_erk(tab, vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, mu,
                      opts, quad=_lq)
    np.testing.assert_array_equal(np.asarray(q_adj), np.asarray(s_fwd.quad))

    def lfd(y0v, muv, t0v, tfv):
        s = solve_erk(tab, vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                      y0v, muv, opts, quad=_lq)
        return float(jnp.sum(s.y ** 2) + jnp.sum(s.quad))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 2.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 2.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * max(abs(fd), 1e-6)
        fd = (lfd(y0.at[i, 0].add(eps), mu, 0.0, 2.0)
              - lfd(y0.at[i, 0].add(-eps), mu, 0.0, 2.0)) / (2 * eps)
        assert abs(g_y0[i, 0] - fd) <= 3e-5 * max(abs(fd), 1e-6)
    fd_t0 = (lfd(y0, mu, eps, 2.0) - lfd(y0, mu, -eps, 2.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 2.0 + eps)
             - lfd(y0, mu, 0.0, 2.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf)


def test_cost_t_eval_and_events():
    """cost= composed with t_eval (q spans the grid) and with events=
    (q truncated at t*, dq/dt* through the polished-root vjp)."""
    from janus_tpu.solve.events import Event

    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=512,
                   max_steps=2048)
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    mu = jnp.array([1.0, 1.0])
    ts = jnp.array([0.7, 1.4, 2.0])

    def loss_te(y0, mu):
        ys, q = dopri_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                              options=opts, cost=_lq, t_eval=ts)
        return jnp.sum(ys ** 2) + jnp.sum(q)

    g = jax.grad(loss_te, argnums=(0, 1))(y0, mu)
    lv = jax.jit(loss_te)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(g[1][i] - fd) <= 3e-5 * max(abs(fd), 1.0)
        e2 = jnp.zeros((2, 2)).at[i, 0].set(eps)
        fd = (lv(y0 + e2, mu) - lv(y0 - e2, mu)) / (2 * eps)
        assert abs(g[0][i, 0] - fd) <= 3e-5 * max(abs(fd), 1.0)

    thr = jnp.array([1.2, -50.0])
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)

    def loss_ev(y0, mu):
        y, t, q = dopri_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                                options=opts, cost=_lq, events=ev)
        return jnp.sum(y[:, 1] ** 2) + 2.0 * jnp.sum(t) + jnp.sum(q)

    g = jax.grad(loss_ev, argnums=(0, 1))(y0, mu)
    lv = jax.jit(loss_ev)
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(g[1][i] - fd) <= 3e-5 * max(abs(fd), 1.0)
        e2 = jnp.zeros((2, 2)).at[i, 0].set(eps)
        fd = (lv(y0 + e2, mu) - lv(y0 - e2, mu)) / (2 * eps)
        assert abs(g[0][i, 0] - fd) <= 3e-5 * max(abs(fd), 1.0)
