"""Discrete-adjoint reverse-mode gradients through the adaptive RODAS4 solve.

rodas_adjoint (solve/adjoint_rodas.py) is a jax.custom_vjp whose backward
pass is the exact transpose of the solver's frozen-mesh step map (one
jax.vjp of a step replay per recorded accepted step). The sharp oracle is
the forward IND tangents of solve/rodas.py: both differentiate the SAME
frozen-(t,h) discrete map, so  grad·δ == ȳ·sens(δ)  must hold to roundoff —
a far tighter contract than the O(rtol) continuous-adjoint comparison.
Secondary oracles: central FD of the full solver (agrees to O(rtol) — the
controller's mesh sensitivity is the only difference) and analytic flows.
The reference has forward duals only on its Rosenbrock family
(src/fortran/radau.f ROSCOR; radauted_impl.hpp duals) — no reverse mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint_rodas import rodas_adjoint
from janus_tpu.solve.rodas import solve_rodas

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


def _rob_dae(t, y, k):
    """Robertson, semi-explicit index-1 form: z = y3, 0 = 1 − y1 − y2 − y3."""
    k1, k2, k3 = k[..., 0], k[..., 1], k[..., 2]
    y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
    f1 = -k1 * y1 + k3 * y2 * y3
    f2 = k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3
    return jnp.stack([f1, f2, 1.0 - y1 - y2 - y3], axis=-1)


def test_transpose_of_ind_tangents_vdp():
    """grad(rodas_adjoint)·δ == ȳ·IND-sens(δ) to roundoff: the two are
    transposes of the same frozen-mesh linear map."""
    opts = Options(rtol=1e-6, atol=1e-9, adjoint_steps=256)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5], [2.5, -0.3]])
    mu = jnp.array([5.0, 20.0, 50.0])
    m = y0.shape[0]

    def loss(y0, mu):
        yT = rodas_adjoint(vdp_rhs, (0.0, 3.0), y0, args=mu, options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_mu = jax.jit(jax.grad(loss, argnums=(0, 1)))(y0, mu)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_mu))

    rng = np.random.default_rng(0)
    for _ in range(3):
        d_y0 = jnp.asarray(rng.standard_normal(y0.shape))
        d_mu = jnp.asarray(rng.standard_normal(mu.shape))
        sol = solve_rodas(vdp_rhs, jnp.zeros(m), jnp.full(m, 3.0), y0, mu,
                          opts, tangents=d_y0[None],
                          args_tangents=d_mu[None])
        lhs = jnp.sum(g_y0 * d_y0) + jnp.sum(g_mu * d_mu)
        rhs = jnp.sum(2.0 * sol.y * sol.sens[0])
        assert abs(lhs - rhs) <= 1e-10 * abs(rhs)


def test_matches_fd_and_boundary_times():
    opts = Options(rtol=1e-7, atol=1e-10, adjoint_steps=256)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        yT = rodas_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=opts)
        return jnp.sum(yT ** 2)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 3.0)

    def lfd(y0v, muv, t0v, tfv):
        s = solve_rodas(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                        y0v, muv, opts)
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
    """Singular-mass (index-1) gradients: the discrete step map is defined
    whenever the forward solve is — transpose identity and FD both hold."""
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    m = 2
    y0 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (m, 1))
    k = jnp.tile(jnp.array([0.04, 3e7, 1e4]), (m, 1)) \
        * jnp.array([[1.0], [1.3]])
    opts = Options(rtol=1e-7, atol=1e-10, adjoint_steps=512)

    def loss(y0, k):
        yT = rodas_adjoint(_rob_dae, (0.0, 100.0), y0, args=k,
                           options=opts, mass=mass)
        return jnp.sum(yT[:, 1] ** 2 * 1e8)

    g_y0, g_k = jax.grad(loss, argnums=(0, 1))(y0, k)
    assert jnp.all(jnp.isfinite(g_y0)) and jnp.all(jnp.isfinite(g_k))

    rng = np.random.default_rng(1)
    d_y0 = jnp.asarray(rng.standard_normal(y0.shape))
    d_k = jnp.asarray(rng.standard_normal(k.shape)) * k
    sol = solve_rodas(_rob_dae, jnp.zeros(m), jnp.full(m, 100.0), y0, k,
                      opts, mass=mass, tangents=d_y0[None],
                      args_tangents=d_k[None])
    ybar = jnp.zeros_like(sol.y).at[:, 1].set(2e8 * sol.y[:, 1])
    lhs = jnp.sum(g_y0 * d_y0) + jnp.sum(g_k * d_k)
    rhs = jnp.sum(ybar * sol.sens[0])
    assert abs(lhs - rhs) <= 1e-9 * abs(rhs)

    def lfd(kv):
        s = solve_rodas(_rob_dae, jnp.zeros(m), jnp.full(m, 100.0), y0, kv,
                        opts, mass=mass)
        return float(jnp.sum(s.y[:, 1] ** 2 * 1e8))

    eps = 1e-3 * 3e7
    fd = (lfd(k.at[0, 1].add(eps)) - lfd(k.at[0, 1].add(-eps))) / (2 * eps)
    assert abs(g_k[0, 1] - fd) <= 1e-4 * abs(fd)


def test_overflow_poisons_gradient():
    """A lane whose accepted-step count exceeds adjoint_steps must yield NaN
    (never a silently-truncated gradient)."""
    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=8)
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([50.0])

    g = jax.grad(lambda y0_: jnp.sum(
        rodas_adjoint(vdp_rhs, (0.0, 3.0), y0_, args=mu,
                      options=opts) ** 2))(y0)
    assert bool(jnp.all(jnp.isnan(g)))


def test_pytree_args_and_heterogeneous_lanes():
    """args as a pytree with shared (scalar) + per-lane leaves; lanes finish
    at different step counts (live-mask path). Oracle: IND transpose."""
    opts = Options(rtol=1e-6, atol=1e-9, adjoint_steps=512)

    def rhs(t, y, p):
        mu, drive = p["mu"], p["drive"]
        x, v = y[..., 0], y[..., 1]
        return jnp.stack(
            [v, mu * (1.0 - x ** 2) * v - x + drive * jnp.sin(t)], axis=-1)

    m = 3
    y0 = jnp.array([[2.0, 0.0], [1.0, 1.0], [0.5, -0.5]])
    p = {"mu": jnp.array([1.0, 100.0, 400.0]), "drive": jnp.float64(0.3)}

    def loss(y0, p):
        yT = rodas_adjoint(rhs, (0.0, 2.0), y0, args=p, options=opts)
        return jnp.sum(yT[:, 0] ** 2)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p)
    assert jnp.all(jnp.isfinite(g_y0))
    assert jnp.all(jnp.isfinite(g_p["mu"])) and jnp.isfinite(g_p["drive"])

    rng = np.random.default_rng(2)
    d_y0 = jnp.asarray(rng.standard_normal(y0.shape))
    d_mu = jnp.asarray(rng.standard_normal(m))
    d_dr = jnp.float64(0.7)
    sol = solve_rodas(rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, p, opts,
                      tangents=d_y0[None],
                      args_tangents={"mu": d_mu[None],
                                     "drive": jnp.array([d_dr])})
    ybar = jnp.zeros_like(sol.y).at[:, 0].set(2.0 * sol.y[:, 0])
    lhs = (jnp.sum(g_y0 * d_y0) + jnp.sum(g_p["mu"] * d_mu)
           + g_p["drive"] * d_dr)
    rhs_v = jnp.sum(ybar * sol.sens[0])
    assert abs(lhs - rhs_v) <= 1e-9 * abs(rhs_v)


def test_t_eval_trajectory_fitting():
    """t_eval mode: chained warm-started segments; gradients w.r.t. y0,
    args, and the SAMPLE TIMES all match FD of the plain t_eval solve."""
    opts = Options(rtol=1e-7, atol=1e-10, adjoint_steps=256)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([5.0, 30.0])
    ts = jnp.array([0.7, 1.4, 2.1, 3.0])
    m = 2

    def loss(y0, mu, ts):
        ys = rodas_adjoint(vdp_rhs, (0.0, 3.0), y0, args=mu, options=opts,
                           t_eval=ts)
        return jnp.sum(ys ** 2)

    g_y0, g_mu, g_ts = jax.grad(loss, argnums=(0, 1, 2))(y0, mu, ts)

    def lfd(y0v, muv, tsv):
        s = solve_rodas(vdp_rhs, jnp.zeros(m), jnp.full(m, 3.0), y0v, muv,
                        opts, t_eval=tsv)
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


def test_rodas_adjoint_terminal_events_mixed_batch_vs_fd():
    """events= on the discrete adjoint: a mixed trigger/no-trigger batch.
    The triggering lane's (y*, t*) cotangents pull through the vjp of the
    replayed CONTRO-cubic endpoint with a differentiable Newton re-polish
    of θ* from the recorded root; the no-trigger lane must keep the plain
    terminal pull (+ the t̄ → tf boundary identity). Oracle: central FD of
    the full solver (agrees to O(rtol·phase sensitivity))."""
    from janus_tpu.solve import solve_ivp
    from janus_tpu.solve.events import Event

    mu = jnp.array([2.0, 2.0])
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.5]])
    thr = jnp.array([0.0, -50.0])       # lane 0 triggers; lane 1 never
    ev = Event(lambda t, y, a: y[..., 0] - thr, terminal=True,
               direction=-1.0)
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096)

    def loss(y0_, mu_):
        y, t = rodas_adjoint(vdp_rhs, (0.0, 6.0), y0_, args=mu_,
                             options=opts, events=ev)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t), (y, t)

    (val, (y, t)), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 6.0 and float(t[1]) == 6.0

    # forward parity: the adjoint's primal IS the events forward solve
    sol = solve_ivp(vdp_rhs, (0.0, 6.0), y0, method="rodas", args=mu,
                    options=opts, events=ev)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(sol.y))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(sol.t))

    eps = 1e-6

    def lv(y0_, mu_):
        s = solve_ivp(vdp_rhs, (0.0, 6.0), y0_, method="rodas", args=mu_,
                      options=opts, events=ev)
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
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grads[1]), g_fd_mu,
                               rtol=0, atol=2e-5)


def test_rodas_adjoint_events_guards():
    from janus_tpu.solve.events import Event
    ev_nt = Event(lambda t, y, a: y[..., 0], terminal=False)
    with pytest.raises(ValueError, match="terminal"):
        rodas_adjoint(vdp_rhs, (0.0, 1.0), jnp.zeros((1, 2)), args=1.0,
                      events=ev_nt)


def _lq(t, y, args):
    return y[..., 0] ** 2 + 0.1 * y[..., 1] ** 2


def test_cost_terminal_fd_and_radau_crosscheck():
    """cost= (integral Lagrange term): the q̄ pull through each replayed
    step's GL-3 increment must match central FD of the forward quad= solve
    AND the continuous radau_adjoint(cost=) gradient on the same problem
    (both O(rtol)-accurate gradients of the same smooth functional)."""
    from janus_tpu.solve.adjoint import radau_adjoint

    opts = Options(rtol=1e-8, atol=1e-11, adjoint_steps=1024,
                   max_steps=4096)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([3.0, 30.0])
    m = 2

    def loss(y0, mu, t0, tf):
        y, q = rodas_adjoint(vdp_rhs, (t0, tf), y0, args=mu, options=opts,
                             cost=_lq)
        return jnp.sum(y ** 2) + jnp.sum(q)

    g_y0, g_mu, g_t0, g_tf = jax.grad(loss, argnums=(0, 1, 2, 3))(
        y0, mu, 0.0, 2.0)

    # forward parity: the primal q is the quad= accumulation bit-for-bit
    q_adj = rodas_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu, options=opts,
                          cost=_lq)[1]
    s_fwd = solve_rodas(vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0, mu,
                        opts, quad=_lq)
    np.testing.assert_array_equal(np.asarray(q_adj), np.asarray(s_fwd.quad))

    def lfd(y0v, muv, t0v, tfv):
        s = solve_rodas(vdp_rhs, jnp.full(m, t0v), jnp.full(m, tfv),
                        y0v, muv, opts, quad=_lq)
        return float(jnp.sum(s.y ** 2) + jnp.sum(s.quad))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps), 0.0, 2.0)
              - lfd(y0, mu.at[i].add(-eps), 0.0, 2.0)) / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * max(abs(fd), 1e-6)
        for j in range(2):
            fd = (lfd(y0.at[i, j].add(eps), mu, 0.0, 2.0)
                  - lfd(y0.at[i, j].add(-eps), mu, 0.0, 2.0)) / (2 * eps)
            assert abs(g_y0[i, j] - fd) <= 3e-5 * max(abs(fd), 1e-6)
    fd_t0 = (lfd(y0, mu, eps, 2.0) - lfd(y0, mu, -eps, 2.0)) / (2 * eps)
    fd_tf = (lfd(y0, mu, 0.0, 2.0 + eps)
             - lfd(y0, mu, 0.0, 2.0 - eps)) / (2 * eps)
    assert abs(g_t0 - fd_t0) <= 1e-4 * abs(fd_t0)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf)

    # continuous-adjoint cross-check (same functional, radau family)
    def loss_radau(y0, mu):
        y, q = radau_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                             options=opts, cost=_lq)
        return jnp.sum(y ** 2) + jnp.sum(q)

    gr_y0, gr_mu = jax.grad(loss_radau, argnums=(0, 1))(y0, mu)
    np.testing.assert_allclose(np.asarray(g_y0), np.asarray(gr_y0),
                               rtol=3e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_mu), np.asarray(gr_mu),
                               rtol=3e-5, atol=1e-7)


def test_cost_vector_q_t_eval():
    """Vector integrands [M, Q] with independent cotangents per component,
    composed with t_eval (q spans the whole grid; samples differentiable)."""
    opts = Options(rtol=1e-7, atol=1e-10, adjoint_steps=512)
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    mu = jnp.array([3.0, 20.0])
    ts = jnp.array([0.7, 1.4, 2.0])
    m = 2

    def lvec(t, y, args):
        return jnp.stack([y[..., 0] ** 2, jnp.sin(t) * y[..., 1]], axis=-1)

    w = jnp.array([1.0, -0.5])

    def loss(y0, mu):
        ys, q = rodas_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                              options=opts, cost=lvec, t_eval=ts)
        return jnp.sum(ys ** 2) + jnp.sum(q * w)

    g_y0, g_mu = jax.grad(loss, argnums=(0, 1))(y0, mu)

    def lfd(y0v, muv):
        s = solve_rodas(vdp_rhs, jnp.zeros(m), jnp.full(m, 2.0), y0v, muv,
                        opts, t_eval=ts, quad=lvec)
        return float(jnp.sum(s.ys ** 2) + jnp.sum(s.quad * w))

    eps = 1e-6
    for i in range(m):
        fd = (lfd(y0, mu.at[i].add(eps)) - lfd(y0, mu.at[i].add(-eps))) \
            / (2 * eps)
        assert abs(g_mu[i] - fd) <= 3e-5 * max(abs(fd), 1e-6)
        fd = (lfd(y0.at[i, 0].add(eps), mu)
              - lfd(y0.at[i, 0].add(-eps), mu)) / (2 * eps)
        assert abs(g_y0[i, 0] - fd) <= 3e-5 * max(abs(fd), 1e-6)


def test_cost_with_terminal_events_mixed_batch():
    """cost= + events=: q truncates at t* (the forward convention); the
    triggering lane's final increment re-quadratures on [0, θ*] so dq/dt*
    ALSO flows through the polished-root vjp. Mixed trigger/no-trigger."""
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
        y, t, q = rodas_adjoint(vdp_rhs, (0.0, 2.0), y0_, args=mu_,
                                options=opts, events=ev, cost=_lq)
        return jnp.sum(y ** 2) + 2.0 * jnp.sum(t) + jnp.sum(q), t

    (val, t), grads = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(y0, mu)
    assert float(t[0]) < 2.0 and float(t[1]) == 2.0

    def lv(y0_, mu_):
        s = solve_ivp(vdp_rhs, (0.0, 2.0), y0_, method="rodas", args=mu_,
                      options=opts, events=ev, quad=_lq)
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
        yT = rodas_adjoint(_rob_dae, (t0, tf), y0, args=k, options=opts,
                  mass=mass, n_alg=1)
        return jnp.sum(yT ** 2)

    g_t0, g_tf = jax.grad(loss, argnums=(0, 1))(0.0, 10.0)

    def lfd(tfv):
        s = solve_rodas(_rob_dae, jnp.zeros(1), jnp.full(1, tfv), y0, k, opts, mass=mass)
        return float(jnp.sum(s.y ** 2))

    eps = 1e-4
    fd_tf = (lfd(10.0 + eps) - lfd(10.0 - eps)) / (2 * eps)
    assert abs(g_tf - fd_tf) <= 1e-4 * abs(fd_tf) + 1e-10
    # autonomous system: d/dt0 = -d/dtf
    assert abs(g_t0 + fd_tf) <= 1e-4 * abs(fd_tf) + 1e-8


def test_events_plus_t_eval_trajectory_fitting():
    """events + t_eval on the RODAS discrete adjoint (the dopri seg_ev
    convention): samples past t* are NaN, a triggered lane's later
    segments collapse to zero-length solves, and the masked-fit gradient
    matches BOTH the continuous radau_adjoint and central FD."""
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

    ys, yF, tt = rodas_adjoint(vdp_rhs, (0.0, 2.0), y0, args=mu,
                               options=opts, t_eval=ts, events=ev)
    assert float(tt[0]) < 2.0 and float(tt[1]) == 2.0
    assert bool(jnp.all(jnp.isnan(ys[0, 3]))) \
        and bool(jnp.all(jnp.isfinite(ys[0, :3]))) \
        and bool(jnp.all(jnp.isfinite(ys[1])))

    g = jax.grad(lambda a, b: loss(a, b, rodas_adjoint),
                 argnums=(0, 1))(y0, mu)
    gr = jax.grad(lambda a, b: loss(a, b, radau_adjoint),
                  argnums=(0, 1))(y0, mu)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gr[1]),
                               rtol=0, atol=2e-5)

    lv = jax.jit(lambda a, b: loss(a, b, rodas_adjoint))
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros((2, 2)).at[i, 0].set(eps)
        fd = (lv(y0 + e, mu) - lv(y0 - e, mu)) / (2 * eps)
        assert abs(g[0][i, 0] - fd) <= 2e-5 * max(abs(fd), 1.0)
        e = jnp.zeros(2).at[i].set(eps)
        fd = (lv(y0, mu + e) - lv(y0, mu - e)) / (2 * eps)
        assert abs(g[1][i] - fd) <= 2e-5 * max(abs(fd), 1.0)
