"""Discrete-adjoint reverse-mode gradients through the adaptive SEULEX solve.

seulex_adjoint (solve/adjoint_seulex.py) is a jax.custom_vjp whose backward
pass scans jax.vjp pulls of a frozen-(t, h, k) replay of the extrapolation
ladder over the recorded accepted-step mesh. Three oracles, sharpest first:

1. bit-exact replay — _one_step at each recorded slot must reproduce the
   NEXT recorded step-start state to roundoff (the recording forward runs
   _force_jac=True precisely so this holds);
2. jax's own AD of the frozen replay CHAIN — the hand-rolled backward scan
   is vjp-of-that-chain by construction, so the two gradients must agree to
   roundoff (validates the cotangent accumulation / live-mask mechanics);
3. central FD of the full solver — agrees to O(rtol); the controller's mesh
   sensitivity is the only difference (the rodas_adjoint contract).

Note grad(seulex_adjoint) is NOT the transpose of solve_seulex(tangents=):
the IND tangents drop ∂A/∂y (W-method), the replay vjp does not — so the
rodas-style transpose identity is deliberately absent here.

The reference's SEULEX (src/python/seulexted.py) has forward duals only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint_seulex import _one_step, seulex_adjoint
from janus_tpu.solve.radau import default_jacobian
from janus_tpu.solve.seulex import solve_seulex

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


OPTS = Options(rtol=1e-7, atol=1e-10, adjoint_steps=256, seulex_kmax=6)


def _rob_dae(t, y, k):
    """Robertson, semi-explicit index-1 form: 0 = 1 − y1 − y2 − y3."""
    k1, k2, k3 = k[..., 0], k[..., 1], k[..., 2]
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    f1 = -k1 * y1 + k3 * y2 * y3
    f2 = k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3
    return jnp.stack([f1, f2, 1.0 - y1 - y2 - y3], axis=-1)


def test_replay_reproduces_forward_mesh():
    """_one_step at each recorded (t, h, y, k) slot equals the next recorded
    step-start state to roundoff — the frozen step map IS the solver's."""
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    sol = solve_seulex(vdp_rhs, jnp.zeros(m), jnp.full(m, 3.0), y0, mu, OPTS,
                       _mesh_size=256, _force_jac=True)
    assert np.all(np.asarray(sol.status) == 1)
    nacc = np.asarray(sol.stats["naccept"])
    mesh = sol.mesh
    jac_fn = default_jacobian(vdp_rhs)
    rep = jax.jit(lambda t, h, y, k: _one_step(
        vdp_rhs, jac_fn, None, OPTS, t, h, y, k, mu))
    for i in range(int(nacc.min()) - 1):
        yrep = rep(mesh["t"][:, i], mesh["h"][:, i], mesh["y"][:, i],
                   mesh["k"][:, i])
        np.testing.assert_allclose(np.asarray(yrep),
                                   np.asarray(mesh["y"][:, i + 1]),
                                   rtol=0, atol=1e-13)
    # per-lane last step lands on the reported final state
    for lane in range(m):
        i = int(nacc[lane]) - 1
        yrep = rep(mesh["t"][:, i], mesh["h"][:, i], mesh["y"][:, i],
                   mesh["k"][:, i])
        np.testing.assert_allclose(np.asarray(yrep[lane]),
                                   np.asarray(sol.y[lane]),
                                   rtol=0, atol=1e-13)


def test_backward_scan_equals_ad_of_frozen_chain():
    """grad(seulex_adjoint) == jax.grad of the frozen replay chain to
    roundoff: the backward scan is vjp-of-that-chain by construction."""
    opts = Options(rtol=1e-6, atol=1e-9, adjoint_steps=64, seulex_kmax=6)
    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0]])
    mu = jnp.array([3.0, 15.0])
    sol = solve_seulex(vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, mu, opts,
                       _mesh_size=64, _force_jac=True)
    assert np.all(np.asarray(sol.status) == 1)
    mesh = jax.lax.stop_gradient(sol.mesh)
    nacc = sol.stats["naccept"]
    jac_fn = default_jacobian(vdp_rhs)

    def chain_loss(y0v, muv):
        def body(y, i):
            live = i < nacc
            tk = jnp.where(live, mesh["t"][:, i], 0.0)
            hk = jnp.where(live, mesh["h"][:, i], 1.0)
            kk = jnp.where(live, mesh["k"][:, i], 1)
            ystep = _one_step(vdp_rhs, jac_fn, None, opts, tk, hk, y, kk,
                              muv)
            return jnp.where(live[:, None], ystep, y), None

        yT, _ = jax.lax.scan(body, y0v, jnp.arange(64))
        return jnp.sum(yT ** 2)

    g_y0_ref, g_mu_ref = jax.jit(jax.grad(chain_loss, argnums=(0, 1)))(
        y0, mu)

    def loss(y0v, muv):
        yT = seulex_adjoint(vdp_rhs, (0.0, 2.0), y0v, args=muv, options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    np.testing.assert_allclose(np.asarray(g_y0), np.asarray(g_y0_ref),
                               rtol=1e-11, atol=0)
    np.testing.assert_allclose(np.asarray(g_mu), np.asarray(g_mu_ref),
                               rtol=1e-11, atol=0)


def test_matches_fd_and_boundary_times():
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        yT = seulex_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=OPTS)
        return jnp.sum(yT ** 2)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 3.0)

    def lfd(y0v, muv, t0v, tfv):
        s = solve_seulex(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                         y0v, muv, OPTS, _force_jac=True)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 3.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 3.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * max(abs(fd), 1e-10)
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 3.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 3.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 3e-5 * max(abs(fd), 1e-10)
    fd_t0 = (lfd(y0, mu, eps, 3.0) - lfd(y0, mu, -eps, 3.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 3.0 + eps)
             - lfd(y0, mu, 0.0, 3.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf)


def test_dae_index1_robertson():
    """Singular-mass (index-1) y0/args gradients: the discrete step map is
    defined whenever the forward solve is."""
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    m = 2
    y0 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (m, 1))
    k = jnp.tile(jnp.array([0.04, 3e7, 1e4]), (m, 1)) \
        * jnp.array([[1.0], [1.3]])
    opts = Options(rtol=1e-7, atol=1e-12, adjoint_steps=512, seulex_kmax=6)

    def loss(y0, k):
        yT = seulex_adjoint(_rob_dae, (0.0, 100.0), y0, args=k,
                            options=opts, mass=mass)
        return jnp.sum(yT[:, 1] ** 2 * 1e8)

    g_y0, g_k = jax.grad(loss, argnums=(0, 1))(y0, k)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_k))

    def lfd(kv):
        s = solve_seulex(_rob_dae, jnp.zeros(m), jnp.full(m, 100.0), y0, kv,
                         opts, mass=mass, _force_jac=True)
        return float(jnp.sum(s.y[:, 1] ** 2 * 1e8))

    eps = 1e-3 * 3e7
    fd = (lfd(k.at[0, 1].add(eps)) - lfd(k.at[0, 1].add(-eps))) / (2 * eps)
    assert abs(g_k[0, 1] - fd) <= 2e-4 * abs(fd)


def test_overflow_poisons_gradient():
    """A lane whose accepted-step count exceeds adjoint_steps must yield NaN
    (never a silently-truncated gradient)."""
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4, seulex_kmax=6)
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([50.0])

    g = jax.grad(lambda y0_: jnp.sum(
        seulex_adjoint(vdp_rhs, (0.0, 3.0), y0_, args=mu,
                       options=opts) ** 2))(y0)
    assert bool(jnp.all(jnp.isnan(g)))


def test_pytree_args_and_heterogeneous_lanes():
    """args as a pytree with shared (scalar) + per-lane leaves; lanes finish
    at different step counts (live-mask path). Oracle: FD of the solver."""
    opts = Options(rtol=1e-7, atol=1e-10, adjoint_steps=256, seulex_kmax=6)

    def rhs(t, y, p):
        mu, drive = p["mu"], p["drive"]
        x, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [v, mu * (1.0 - x ** 2) * v - x + drive * jnp.sin(t)], axis=-1)

    m = 3
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0], [0.5, -0.5]])
    p = {"mu": jnp.array([1.0, 100.0, 400.0]), "drive": jnp.float64(0.3)}

    def loss(y0, p):
        yT = seulex_adjoint(rhs, (0.0, 2.0), y0, args=p, options=opts)
        return jnp.sum(yT[:, 0] ** 2)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p)
    assert jnp.all(jnp.isfinite(g_y0))
    assert jnp.all(jnp.isfinite(g_p["mu"])) and jnp.isfinite(g_p["drive"])

    def lfd(pv):
        s = solve_seulex(rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, pv, opts,
                         _force_jac=True)
        return float(jnp.sum(s.y[:, 0] ** 2))

    eps = 1e-6
    fd = (lfd({**p, "drive": p["drive"] + eps})
          - lfd({**p, "drive": p["drive"] - eps})) / (2 * eps)
    assert abs(g_p["drive"] - fd) <= 3e-5 * max(abs(fd), 1e-8)
    for i in range(m):
        # FD step scaled to the parameter (an absolute 1e-6 on mu=400 is a
        # 2.5e-9 relative perturbation); the +1e-6 absolute term covers the
        # stiff lanes whose mu-gradient is NEAR ZERO (~1e-5): there the
        # frozen-mesh-vs-true-derivative gap (O(rtol·loss scale), measured
        # 2.4e-8 abs) dwarfs any relative bound on the tiny fd value
        ei = eps * max(1.0, float(p["mu"][i]))
        fd = (lfd({**p, "mu": p["mu"].at[i].add(ei)})
              - lfd({**p, "mu": p["mu"].at[i].add(-ei)})) / (2 * ei)
        assert abs(g_p["mu"][i] - fd) <= 3e-5 * abs(fd) + 1e-6


def test_t_eval_trajectory_fitting():
    """t_eval mode: chained warm-started segments; gradients w.r.t. y0,
    args, and the SAMPLE TIMES all match FD of the plain t_eval solve."""
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    ts = jnp.array([0.7, 1.4, 2.1, 3.0])
    m = 2

    def loss(y0, mu, ts):
        ys = seulex_adjoint(vdp_rhs, (0.0, 3.0), y0, args=mu, options=OPTS,
                            t_eval=ts)
        return jnp.sum(ys ** 2)

    g_y0, g_mu, g_ts = jax.grad(loss, argnums=(0, 1, 2))(y0, mu, ts)

    def lfd(y0v, muv, tsv):
        s = solve_seulex(vdp_rhs, jnp.zeros(m), jnp.full(m, 3.0), y0v, muv,
                         OPTS, t_eval=tsv, _force_jac=True)
        return float(jnp.sum(s.ys ** 2))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), ts)
              - lfd(y0, mu.at[i].add(-eps), ts)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * abs(fd)
        fd = (lfd(y0.at[i, 0].add(eps), mu, ts)
              - lfd(y0.at[i, 0].add(-eps), mu, ts)) / (2 * eps)
        assert abs(g_y0[i, 0] - fd) <= 3e-5 * abs(fd)
    for j in range(3):        # interior sample times (last ±eps exits tspan)
        fd = (lfd(y0, mu, ts.at[j].add(eps))
              - lfd(y0, mu, ts.at[j].add(-eps))) / (2 * eps)
        assert abs(g_ts[j] - fd) <= 3e-5 * abs(fd)


def test_terminal_events_mixed_batch_vs_fd():
    """events= on the SEULEX discrete adjoint: mixed trigger/no-trigger
    batch. The triggering lane's (y*, t*) cotangents pull through the vjp
    of the replayed extrapolation-quartic endpoint (midpoint Neville table
    rebuilt in the replay) with a differentiable Newton re-polish of θ*;
    the no-trigger lane keeps the plain terminal pull (+ t̄ → tf identity).
    Oracles: the CONTINUOUS radau adjoint on the same composed loss
    (sharp — both are O(rtol)-accurate gradients of the same smooth
    functional), and central FD of the full solver (loose — FD of the
    ADAPTIVE solver carries the controller's mesh/level-decision
    sensitivity, MEASURED at 2.2e-4 on the triggering lane's y0[1]
    component on this problem, stable across eps 1e-5/1e-6 while the
    adjoint matches the radau oracle to 2e-5; the frozen-mesh contract
    bounds the adjoint-vs-FD gap by that controller noise, not 1e-9)."""
    from janus_tpu.solve import solve_ivp
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([0.0, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096,
                   seulex_kmax=6)

    def loss(y0_, mu_):
        y, t = seulex_adjoint(vdp_rhs, (0.0, 6.0), y0_, args=mu_,
                              options=opts, events=ev)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t), (y, t)

    (val, (y, t)), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 6.0 and float(t[1]) == 6.0

    # forward parity: the adjoint's primal IS the events forward solve
    # (modulo _force_jac, which changes iteration matrices — run the same)
    sol = solve_seulex(vdp_rhs, 0.0, 6.0, y0, mu, opts, events=ev,
                       _force_jac=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(sol.y))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(sol.t))

    eps = 1e-6

    def lv(y0_, mu_):
        s = solve_seulex(vdp_rhs, 0.0, 6.0, y0_, mu_, opts, events=ev,
                         _force_jac=True)
        return float(jnp.sum(s.y ** 2) + 2.0 * jnp.sum(s.t))

    g_fd_y0 = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            e = jnp.zeros((2, 2)).at[i, j].set(eps)
            g_fd_y0[i, j] = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
    g_fd_mu = np.zeros(2)
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        g_fd_mu[i] = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grads[0]), g_fd_y0,
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(grads[1]), g_fd_mu,
                               rtol=0, atol=5e-4)

    # sharp oracle: the continuous radau adjoint of the same loss
    from janus_tpu.solve.adjoint import radau_adjoint
    ropts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096)

    def loss_r(y0_, mu_):
        yr, tr = radau_adjoint(vdp_rhs, (0.0, 6.0), y0_, args=mu_,
                               options=ropts, events=ev)
        return jnp.sum(yr ** 2) + 2.0 * jnp.sum(tr)

    gr = jax.grad(loss_r, argnums=(0, 1))(y0, mu)
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(gr[0]),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(grads[1]), np.asarray(gr[1]),
                               rtol=3e-4, atol=3e-5)


def test_events_guards():
    from janus_tpu.solve.events import Event
    ev_nt = Event(lambda t, y, a: y[..., 0], terminal=False)
    with pytest.raises(ValueError, match="terminal"):
        seulex_adjoint(vdp_rhs, (0.0, 1.0), jnp.zeros((1, 2)), args=1.0,
                       events=ev_nt)


def _lq(t, y, args):
    return y[..., 0] ** 2 + 0.1 * y[..., 1] ** 2


def test_cost_terminal_fd_and_parity():
    """cost= (integral Lagrange term): q parity with the forward quad=
    accumulation is bit-exact (the replayed midpoint-Neville interpolant
    and GL-3 rule are the forward's own), and the q̄ pull through each
    step's replayed increment matches central FD of the full solver.
    Near-zero-gradient bounds use the 3e-5·|fd| + floor form (CLAUDE.md
    round-4 FD-bound note)."""
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=1024,
                   max_steps=4096, seulex_kmax=6)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([3.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        y, q = seulex_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=opts,
                              cost=_lq)
        return jnp.sum(y ** 2) + jnp.sum(q)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 2.0)

    # forward parity: the primal q is the quad= accumulation bit-for-bit
    # (same _force_jac=True variant the adjoint records)
    q_adj = seulex_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu, options=opts,
                           cost=_lq)[1]
    s_fwd = solve_seulex(vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, mu,
                         opts, quad=_lq, _force_jac=True)
    np.testing.assert_array_equal(np.asarray(q_adj), np.asarray(s_fwd.quad))

    def lfd(y0v, muv, t0v, tfv):
        s = solve_seulex(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                         y0v, muv, opts, quad=_lq, _force_jac=True)
        return float(jnp.sum(s.y ** 2) + jnp.sum(s.quad))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 2.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 2.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * abs(fd) + 2e-6
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 2.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 2.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 3e-5 * abs(fd) + 2e-6
    fd_t0 = (lfd(y0, mu, eps, 2.0) - lfd(y0, mu, -eps, 2.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 2.0 + eps)
             - lfd(y0, mu, 0.0, 2.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0) + 2e-6
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf) + 2e-6


def test_cost_with_terminal_events_mixed_batch():
    """cost= + events=: q truncates at t* (the forward convention); the
    triggering lane's final increment re-quadratures on [0, θ*] through the
    replayed ladder interpolant so dq/dt* also rides the polished-root
    vjp. Mixed trigger/no-trigger batch vs FD of the full solver."""
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([1.2, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096,
                   seulex_kmax=6)

    def loss(y0_, mu_):
        y, t, q = seulex_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                                 options=opts, events=ev, cost=_lq)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t) + jnp.sum(q), t

    (val, t), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 2.0 and float(t[1]) == 2.0

    def lv(y0_, mu_):
        s = solve_seulex(vdp_rhs, 0.0, 2.0, y0_, mu_, opts, events=ev,
                         quad=_lq, _force_jac=True)
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
        yT = seulex_adjoint(_rob_dae, (t0, tf), y0, args=k, options=opts,
                  mass=mass, n_alg=1)
        return jnp.sum(yT ** 2)

    g_t0, g_tf = jax.grad(loss, argnums=(0, 1))(0.0, 10.0)

    def lfd(tfv):
        s = solve_seulex(_rob_dae, jnp.zeros(1), jnp.full(1, tfv), y0, k, opts, mass=mass, _force_jac=True)
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
        ys, yF, tt = seulex_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                          options=opts, t_eval=ts, events=ev)
        fit = jnp.where(jnp.isfinite(ys), ys ** 2, 0.0)
        return jnp.sum(fit) + jnp.sum(yF[:, 1] ** 2) + 2.0 * jnp.sum(tt)

    ys, yF, tt = seulex_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
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
