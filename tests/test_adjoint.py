"""Continuous-adjoint reverse-mode gradients through the adaptive Radau solve.

radau_adjoint (solve/adjoint.py) is a jax.custom_vjp whose backward pass
integrates λ' = −Jᵀλ backward over the stored accepted-step mesh with the
primal reconstructed from each step's collocation polynomial. Beyond the
reference (forward duals only, radauted_impl.hpp). Oracles: FD re-solves,
jvp through the solve, analytic flows, and the checkpointed fixed-grid
reverse path (solve/fixed.py) on the NN-Hamiltonian training loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.models.neural import mlp_init, mlp_apply
from janus_tpu.models.problems import harmonic_rhs, vdp_rhs, vdp_jac
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.fixed import odeint_fixed

# heavy tier: large custom-vjp / jacfwd-through-solve compiles (CLAUDE.md
# suite-budget notes); excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    """This file compiles ~17 large custom-vjp programs; the XLA:CPU
    compiler segfaults (exit 139 in backend_compile_and_load) late in a
    single process once too many live executables accumulate (same
    pathology the module-scoped conftest fixture works around). Clear
    per-test here — every test compiles fresh programs anyway."""
    yield
    jax.clear_caches()


def test_adjoint_matches_fd_y0_and_params_stiff_vdp():
    m = 3
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([30.0, 100.0, 300.0])
    opts = Options(rtol=1e-9, atol=1e-12)

    def loss(z, mm):
        yT = radau_adjoint(vdp_rhs, (0.0, 1.0), z, args=mm, options=opts,
                           jac=vdp_jac)
        return jnp.sum(yT ** 2)

    g_y0, g_mu = jax.grad(loss, argnums=(0, 1))(y0, mus)
    eps = 1e-6
    for i in range(m):
        e = jnp.zeros((m,)).at[i].set(eps)
        fd = (loss(y0, mus + e) - loss(y0, mus - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_mu[i]), float(fd), rtol=2e-4)
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e, mus) - loss(y0 - e, mus)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=2e-5, atol=1e-9)


def test_adjoint_tf_and_t0_gradients():
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([50.0])
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)

    def loss_tf(tf):
        yT = radau_adjoint(vdp_rhs, (0.0, tf), y0, args=mu, options=opts,
                           jac=vdp_jac)
        return jnp.sum(yT ** 2)

    def loss_t0(t0):
        yT = radau_adjoint(vdp_rhs, (t0, 1.0), y0, args=mu, options=opts,
                           jac=vdp_jac)
        return jnp.sum(yT ** 2)

    eps = 1e-7
    g = float(jax.grad(loss_tf)(1.0))
    fd = float((loss_tf(1.0 + eps) - loss_tf(1.0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)
    g = float(jax.grad(loss_t0)(0.2))
    fd = float((loss_t0(0.2 + eps) - loss_t0(0.2 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_adjoint_reverse_time_analytic():
    opts = Options(rtol=1e-11, atol=1e-14)
    z0 = jnp.array([[1.3, -0.4]])

    def loss(z):
        yT = radau_adjoint(lambda t, y, a: -0.7 * y, (2.0, 0.0), z,
                           options=opts)
        return jnp.sum(yT ** 2)

    g = jax.grad(loss)(z0)
    want = 2.0 * z0 * np.exp(2 * 0.7 * 2.0)     # y(0) = z·e^{1.4}
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-8)


def test_adjoint_invertible_mass():
    mass = jnp.array([[2.0, 0.3], [0.1, 1.5]])
    opts = Options(rtol=1e-10, atol=1e-13)
    z0 = jnp.array([[1.3, -0.4]])

    def fm(t, y, a):
        return jnp.stack([-y[..., 0] + 0.2 * y[..., 1], -0.5 * y[..., 1]],
                         axis=-1)

    def loss(z):
        yT = radau_adjoint(fm, (0.0, 1.2), z, options=opts, mass=mass)
        return jnp.sum(yT ** 2)

    g = jax.grad(loss)(z0)
    eps = 1e-6
    for j in range(2):
        e = jnp.zeros((1, 2)).at[0, j].set(eps)
        fd = (loss(z0 + e) - loss(z0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, j]), float(fd), rtol=1e-6)


def test_adjoint_nn_hamiltonian_matches_fixed_grid():
    """The VERDICT 'done' criterion: jax.grad of an NN-Hamiltonian training
    loss through radau_adjoint matches the checkpointed fixed-grid reverse
    gradient (solve/fixed.py) — many-parameter reverse mode at adaptive
    cost."""
    key = jax.random.PRNGKey(3)
    params = mlp_init(key, [2, 16, 1], jnp.float64)

    def nn_rhs(t, y, p):
        def single(yy):
            g = jax.grad(lambda z: jnp.sum(mlp_apply(p, z)))(yy)
            return jnp.stack([g[1], -g[0]])
        return jax.vmap(single)(y)

    m, dt = 8, 0.5
    y0s = jax.random.normal(jax.random.PRNGKey(4), (m, 2), jnp.float64)
    y1s = odeint_fixed(harmonic_rhs, 0.0, dt, y0s, n_steps=64, args=1.0)
    opts = Options(rtol=1e-10, atol=1e-13)

    def loss_adj(p):
        pred = radau_adjoint(nn_rhs, (0.0, dt), y0s, args=p, options=opts)
        return jnp.mean((pred - y1s) ** 2)

    def loss_fixed(p):
        pred = odeint_fixed(nn_rhs, 0.0, dt, y0s, n_steps=200, args=p)
        return jnp.mean((pred - y1s) ** 2)

    g_adj = jax.grad(loss_adj)(params)
    g_fix = jax.grad(loss_fixed)(params)
    flat_a = jnp.concatenate([jnp.ravel(l) for l in
                              jax.tree_util.tree_leaves(g_adj)])
    flat_f = jnp.concatenate([jnp.ravel(l) for l in
                              jax.tree_util.tree_leaves(g_fix)])
    assert bool(jnp.all(jnp.isfinite(flat_a)))
    np.testing.assert_allclose(np.asarray(flat_a), np.asarray(flat_f),
                               rtol=2e-4, atol=1e-10)


def test_adjoint_mesh_overflow_poisons_gradient():
    """Exceeding Options.adjoint_steps must yield NaN gradients, not silent
    truncation."""
    y0 = jnp.array([[2.0, 0.0]])
    opts = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4)

    def loss(z):
        yT = radau_adjoint(vdp_rhs, (0.0, 1.0), z, args=jnp.array([100.0]),
                           options=opts, jac=vdp_jac)
        return jnp.sum(yT ** 2)

    # primal value is unaffected (the forward solve ran normally)
    assert bool(jnp.isfinite(loss(y0)))
    g = jax.grad(loss)(y0)
    assert bool(jnp.all(jnp.isnan(g)))


def test_adjoint_raises_on_variable_stages():
    with pytest.raises(ValueError):
        radau_adjoint(vdp_rhs, (0.0, 1.0), jnp.zeros((1, 2)),
                      options=Options(min_stages=1, max_stages=7))


def test_adjoint_primal_matches_solve_radau():
    """The undifferentiated value is exactly the ordinary solve."""
    from janus_tpu.solve.radau import solve_radau
    y0 = jnp.array([[2.0, 0.0], [1.0, 0.5]])
    mu = jnp.array([20.0, 60.0])
    opts = Options(rtol=1e-8, atol=1e-11)
    yT = radau_adjoint(vdp_rhs, (0.0, 0.8), y0, args=mu, options=opts)
    sol = solve_radau(vdp_rhs, 0.0, 0.8, y0, args=mu, options=opts)
    np.testing.assert_allclose(np.asarray(yT), np.asarray(sol.y), rtol=0,
                               atol=0)


def test_adjoint_t_eval_trajectory_fit_matches_fd():
    """Trajectory-fitting loss: Σ_j w_j·|y(t_j)|² sampled by the chained
    t_eval mode; gradients w.r.t. y0 and θ must match FD re-solves."""
    m = 2
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([30.0, 100.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    ts = jnp.array([0.3, 0.7, 1.0, 1.4])
    w = jnp.arange(1.0, 5.0)[None, :, None]

    def loss(z, mm):
        ys = radau_adjoint(vdp_rhs, (0.0, 1.4), z, args=mm, options=opts,
                           jac=vdp_jac, t_eval=ts)
        return jnp.sum(w * ys ** 2)

    g_y0, g_mu = jax.grad(loss, argnums=(0, 1))(y0, mus)
    eps = 1e-6
    for i in range(m):
        e = jnp.zeros((m,)).at[i].set(eps)
        fd = (loss(y0, mus + e) - loss(y0, mus - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_mu[i]), float(fd), rtol=2e-4)
        for j in range(2):
            e2 = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e2, mus) - loss(y0 - e2, mus)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=2e-4, atol=1e-8)


def test_adjoint_t_eval_primal_matches_dense_output():
    """Chained-segment samples sit on the same solution the one-pass dense
    output interpolates: agreement to solve tolerance."""
    from janus_tpu.solve.radau import solve_radau
    y0 = jnp.array([[2.0, 0.0], [1.0, 0.5]])
    mu = jnp.array([20.0, 60.0])
    opts = Options(rtol=1e-9, atol=1e-12)
    ts = jnp.array([0.2, 0.5, 0.9, 1.3])
    ys = radau_adjoint(vdp_rhs, (0.0, 1.3), y0, args=mu, options=opts,
                       jac=vdp_jac, t_eval=ts)
    sol = solve_radau(vdp_rhs, 0.0, 1.3, y0, args=mu, options=opts,
                      jac=vdp_jac, t_eval=ts)
    assert ys.shape == (2, 4, 2)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(sol.ys),
                               rtol=1e-6, atol=1e-9)


def test_adjoint_t_eval_sample_time_gradient():
    """dL/dt_j flows through the chained segment boundaries (both as one
    segment's tf and the next one's t0)."""
    y0 = jnp.array([[2.0, 0.0]])
    mu = jnp.array([40.0])
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    ts0 = jnp.array([0.4, 0.8, 1.2])

    def loss(ts):
        ys = radau_adjoint(vdp_rhs, (0.0, 1.2), y0, args=mu, options=opts,
                           jac=vdp_jac, t_eval=ts)
        return jnp.sum(jnp.arange(1.0, 4.0)[None, :, None] * ys ** 2)

    g = jax.grad(loss)(ts0)
    eps = 1e-7
    for j in range(3):
        e = jnp.zeros((3,)).at[j].set(eps)
        fd = (loss(ts0 + e) - loss(ts0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[j]), float(fd), rtol=1e-4,
                                   atol=1e-9)


def test_adjoint_gmres_large_d_matches_fd():
    """stage_solver='gmres' reverse mode on a D=96 Fisher-KPP MOL line —
    far beyond the dense LU's trace budget; Jᵀ·v by vjp pulls + transposed
    Thomas preconditioner. Gradients must match FD re-solves."""
    from tests.test_radau_gmres import _mol_rhs

    d = 96
    dx = 1.0 / (d + 1)
    xg = np.linspace(dx, 1.0 - dx, d)
    rhs = _mol_rhs(dx)
    m = 2
    y0 = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2))[None], (m, 1))
    rates0 = jnp.array([1.0, 8.0])[:, None]
    opts = Options(rtol=1e-7, atol=1e-10, stage_solver="gmres",
                   gmres_iters=25)

    def loss(z, rates):
        yT = radau_adjoint(rhs, (0.0, 0.4), z, args=(0.01, rates),
                           options=opts)
        return jnp.sum(jnp.asarray(xg)[None, :] * yT ** 2)

    g_y0, g_r = jax.grad(loss, argnums=(0, 1))(y0, rates0)
    assert bool(jnp.all(jnp.isfinite(g_y0))) and bool(
        jnp.all(jnp.isfinite(g_r)))
    eps = 1e-5
    for i in range(m):
        e = jnp.zeros((m, 1)).at[i, 0].set(eps)
        fd = (loss(y0, rates0 + e) - loss(y0, rates0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_r[i, 0]), float(fd), rtol=2e-4)
    for j in (17, 48):                       # spot-check y0 components
        e = jnp.zeros((m, d)).at[0, j].set(eps)
        fd = (loss(y0 + e, rates0) - loss(y0 - e, rates0)) / (2 * eps)
        np.testing.assert_allclose(float(g_y0[0, j]), float(fd), rtol=5e-4,
                                   atol=1e-8)


def _osc_rhs(t, y, p):
    """Damped nonlinear oscillator: y0' = y1, y1' = -k·y0 - c·y1 - 0.1·y0³."""
    k, c = p["k"], p["c"]
    return jnp.stack([y[:, 1],
                      -k * y[:, 0] - c * y[:, 1] - 0.1 * y[:, 0] ** 3],
                     axis=-1)


def _level_event(t, y, p):
    return y[:, 0] - p["level"]


def test_adjoint_event_gradients_match_fd():
    """Terminal-event adjoint: L mixes y(t*) and t*; gradients w.r.t. y0,
    dynamics params, and an event-only param (g_θ term) must match FD
    re-solves (implicit-function jump λ(t*) = ȳ − w·g_yᵀ, grads −w·g_θ)."""
    from janus_tpu.solve.events import Event

    m = 2
    y0 = jnp.array([[2.0, 0.0], [1.5, -0.3]])
    p0 = {"k": jnp.array([3.0, 4.0]), "c": jnp.array([0.25, 0.4]),
          "level": jnp.array([-0.8, -0.5])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    ev = Event(_level_event, terminal=True, direction=-1.0)

    def loss(z, p):
        y_star, t_star = radau_adjoint(_osc_rhs, (0.0, 12.0), z, args=p,
                                       options=opts, events=ev)
        return jnp.sum(y_star[:, 1] ** 2) + jnp.sum(
            jnp.array([0.7, 1.3]) * t_star)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p0)
    eps = 1e-6
    for name in ("k", "c", "level"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            pp = dict(p0); pm = dict(p0)
            pp[name] = p0[name] + e
            pm[name] = p0[name] - e
            fd = (loss(y0, pp) - loss(y0, pm)) / (2 * eps)
            np.testing.assert_allclose(float(g_p[name][i]), float(fd),
                                       rtol=5e-4, atol=1e-9,
                                       err_msg=f"d/d{name}[{i}]")
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e, p0) - loss(y0 - e, p0)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=5e-4, atol=1e-9,
                                       err_msg=f"d/dy0[{i},{j}]")


def test_adjoint_event_mixed_batch_and_tf():
    """A lane whose event never fires takes the ordinary terminal adjoint
    (incl. the tf cotangent THROUGH the returned t_term); the event lane's tf
    gradient is exactly zero."""
    from janus_tpu.solve.events import Event

    m = 2
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.0]])
    # lane 0 crosses level; lane 1's level is unreachably low (damped osc)
    p0 = {"k": jnp.array([3.0, 3.0]), "c": jnp.array([0.3, 0.3]),
          "level": jnp.array([-0.5, -50.0])}
    # lane 1 integrates the whole span at rtol 1e-10 (~650 accepted steps)
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=1024)
    ev = Event(_level_event, terminal=True, direction=-1.0)
    w_t = jnp.array([0.7, 1.3])

    def loss(z, p, tf):
        y_star, t_star = radau_adjoint(_osc_rhs, (0.0, tf), z, args=p,
                                       options=opts, events=ev)
        return jnp.sum(y_star ** 2) + jnp.sum(w_t * t_star)

    tf0 = 3.0
    g_y0, g_tf = jax.grad(loss, argnums=(0, 2))(y0, p0, tf0)
    eps = 1e-6
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e, p0, tf0) - loss(y0 - e, p0, tf0)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=5e-4, atol=1e-9)
    # tf gradient: lane 1 contributes ȳ·ẏ(tf) + w_t[1]; lane 0 contributes 0
    fd_tf = (loss(y0, p0, tf0 + eps) - loss(y0, p0, tf0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_tf), float(fd_tf), rtol=5e-4)

    # and the event lane's t* is insensitive to tf: drop lane 1's terms
    def loss_ev_only(tf):
        y_star, t_star = radau_adjoint(_osc_rhs, (0.0, tf), y0, args=p0,
                                       options=opts, events=ev)
        return jnp.sum(y_star[0] ** 2) + t_star[0]

    g = jax.grad(loss_ev_only)(tf0)
    np.testing.assert_allclose(float(g), 0.0, atol=1e-12)


def test_adjoint_event_mass_matrix():
    """Invertible mass + terminal event: ẏ* in the jump uses M⁻¹f."""
    from janus_tpu.solve.events import Event

    mass = jnp.array([[2.0, 0.0], [0.5, 1.0]])
    y0 = jnp.array([[2.0, 0.0]])
    p0 = {"k": jnp.array([3.0]), "c": jnp.array([0.3]),
          "level": jnp.array([-0.4])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    ev = Event(_level_event, terminal=True, direction=-1.0)

    def loss(z, p):
        y_star, t_star = radau_adjoint(_osc_rhs, (0.0, 20.0), z, args=p,
                                       options=opts, mass=mass, events=ev)
        return jnp.sum(y_star ** 2) + 0.5 * t_star[0]

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p0)
    eps = 1e-6
    for name in ("k", "level"):
        e = jnp.full((1,), eps)
        pp = dict(p0); pm = dict(p0)
        pp[name] = p0[name] + e
        pm[name] = p0[name] - e
        fd = (loss(y0, pp) - loss(y0, pm)) / (2 * eps)
        np.testing.assert_allclose(float(g_p[name][0]), float(fd), rtol=5e-4,
                                   err_msg=f"d/d{name}")
    for j in range(2):
        e = jnp.zeros((1, 2)).at[0, j].set(eps)
        fd = (loss(y0 + e, p0) - loss(y0 - e, p0)) / (2 * eps)
        np.testing.assert_allclose(float(g_y0[0, j]), float(fd), rtol=5e-4,
                                   atol=1e-9)


def _rob_dae_rhs(t, y, k):
    """Robertson-style semi-explicit index-1 DAE, mass = diag(2, 1, 0):
    2·x1' = 2·(−k1 x1 + k3 x2 z), x2' = k1 x1 − k2 x2² − k3 x2 z,
    0 = x1 + x2 + z − 1 (the scaled A block exercises A⁻ᵀ in the init)."""
    k1, k2, k3 = k["k1"], k["k2"], k["k3"]
    x1, x2, z = y[:, 0], y[:, 1], y[:, 2]
    return jnp.stack([2.0 * (-k1 * x1 + k3 * x2 * z),
                      k1 * x1 - k2 * x2 ** 2 - k3 * x2 * z,
                      x1 + x2 + z - 1.0], axis=-1)


def test_adjoint_index1_dae_matches_fd():
    """n_alg=1 singular-mass adjoint: gradients w.r.t. differential y0 slots
    (z0 consistently reconstructed) and parameters match FD re-solves; the
    loss touches the ALGEBRAIC terminal value too (ȳ_z manifold term)."""
    m = 2
    mass = jnp.diag(jnp.array([2.0, 1.0, 0.0]))
    x0 = jnp.array([[1.0, 0.2], [0.8, 0.4]])
    k0 = {"k1": jnp.array([0.5, 0.7]), "k2": jnp.array([10.0, 6.0]),
          "k3": jnp.array([2.0, 3.0])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    w = jnp.array([0.6, 1.1, 1.7])

    def loss(xd, k):
        z0 = 1.0 - xd[:, 0] - xd[:, 1]
        y0 = jnp.concatenate([xd, z0[:, None]], axis=-1)
        yT = radau_adjoint(_rob_dae_rhs, (0.0, 2.0), y0, args=k,
                           options=opts, mass=mass, n_alg=1)
        return jnp.sum(w[None, :] * yT ** 2)

    g_x0, g_k = jax.grad(loss, argnums=(0, 1))(x0, k0)
    eps = 1e-6
    for name in ("k1", "k2", "k3"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            kp = dict(k0); km = dict(k0)
            kp[name] = k0[name] + e
            km[name] = k0[name] - e
            fd = (loss(x0, kp) - loss(x0, km)) / (2 * eps)
            np.testing.assert_allclose(float(g_k[name][i]), float(fd),
                                       rtol=5e-5, atol=1e-10,
                                       err_msg=f"d/d{name}[{i}]")
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(x0 + e, k0) - loss(x0 - e, k0)) / (2 * eps)
            np.testing.assert_allclose(float(g_x0[i, j]), float(fd),
                                       rtol=5e-5, atol=1e-10,
                                       err_msg=f"d/dx0[{i},{j}]")


def test_adjoint_index1_dae_tf_gradient():
    mass = jnp.diag(jnp.array([2.0, 1.0, 0.0]))
    x0 = jnp.array([[1.0, 0.2]])
    k0 = {"k1": jnp.array([0.5]), "k2": jnp.array([10.0]),
          "k3": jnp.array([2.0])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)

    def loss(tf):
        z0 = 1.0 - x0[:, 0] - x0[:, 1]
        y0 = jnp.concatenate([x0, z0[:, None]], axis=-1)
        yT = radau_adjoint(_rob_dae_rhs, (0.0, tf), y0, args=k0,
                           options=opts, mass=mass, n_alg=1)
        return jnp.sum(yT ** 2)

    g = jax.grad(loss)(2.0)
    eps = 1e-6
    fd = (loss(2.0 + eps) - loss(2.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_adjoint_checkpoints_matches_unsegmented():
    """radau_adjoint(checkpoints=C): segmented-remat reverse mode. The
    primal must match the warm-start-chained forward solve and the gradient
    must match the unsegmented adjoint (same math, C× less mesh memory) —
    with adjoint_steps sized per SEGMENT, small enough that the
    unsegmented sweep could not even store the whole span."""
    m = 3
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.array([5.0, 10.0, 20.0])   # limit cycles: ~3.2k total steps,
    #                                      spread across the span (measured)
    opts_full = Options(rtol=1e-9, atol=1e-12, adjoint_steps=4096)
    opts_seg = Options(rtol=1e-9, atol=1e-12, adjoint_steps=1280)

    def loss(z, mm, opts, ckpt):
        yT = radau_adjoint(vdp_rhs, (0.0, 20.0), z, args=mm, options=opts,
                           jac=vdp_jac, checkpoints=ckpt)
        return jnp.sum(yT ** 2)

    v_seg = loss(y0, mus, opts_seg, 4)
    v_full = loss(y0, mus, opts_full, 0)
    # segment boundaries quantize a few steps, so agreement is to solver
    # tolerance over ~3k steps, not bitwise
    np.testing.assert_allclose(float(v_seg), float(v_full), rtol=1e-6)
    g_seg = jax.grad(loss, argnums=(0, 1))(y0, mus, opts_seg, 4)
    g_full = jax.grad(loss, argnums=(0, 1))(y0, mus, opts_full, 0)
    for a, b in zip(jax.tree_util.tree_leaves(g_seg),
                    jax.tree_util.tree_leaves(g_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-9)
    # a 1280-step budget cannot hold the whole ~3.2k-step mu=5 span: the
    # unsegmented sweep at the per-segment budget must poison the gradient
    g_tight = jax.grad(loss)(y0, mus, opts_seg, 0)
    assert bool(jnp.any(jnp.isnan(g_tight)))


def test_adjoint_checkpoints_with_cost():
    y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
    opts = Options(rtol=1e-8, atol=1e-10, adjoint_steps=256)

    def loss(mu):
        y, q = radau_adjoint(vdp_rhs, (0.0, 3.0), y0,
                             args=jnp.array([mu, mu + 1.0]), options=opts,
                             cost=lambda t, y_, a: y_[:, 0] ** 2,
                             checkpoints=3)
        return jnp.sum(q) + 0.3 * jnp.sum(y ** 2)

    g = float(jax.grad(loss)(4.0))
    eps = 1e-6
    fd = float((loss(4.0 + eps) - loss(4.0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=2e-5)


def test_adjoint_checkpoints_mode_restrictions():
    from janus_tpu.solve.events import Event
    y0 = jnp.zeros((1, 2))
    with pytest.raises(ValueError, match="terminal-mode"):
        radau_adjoint(vdp_rhs, (0.0, 1.0), y0, args=jnp.ones(1),
                      t_eval=jnp.array([0.5]), checkpoints=2)
    with pytest.raises(ValueError, match="terminal-mode"):
        radau_adjoint(vdp_rhs, (0.0, 1.0), y0, args=jnp.ones(1),
                      events=Event(lambda t, y, a: y[:, 0], terminal=True),
                      checkpoints=2)


def test_adjoint_index1_dae_with_cost_matches_fd():
    """n_alg + cost=: integral cost on an index-1 DAE. The integrand touches
    the ALGEBRAIC variable, so ν_z(T) must carry the l_zᵀq̄ consistency term
    (g_zᵀν_z = −f_zᵀν_x − l_zᵀq̄); gradients vs FD re-solves."""
    m = 2
    mass = jnp.diag(jnp.array([2.0, 1.0, 0.0]))
    x0 = jnp.array([[1.0, 0.2], [0.8, 0.4]])
    k0 = {"k1": jnp.array([0.5, 0.7]), "k2": jnp.array([10.0, 6.0]),
          "k3": jnp.array([2.0, 3.0])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    w = jnp.array([0.6, 1.1, 1.7])

    def cost(t, y, k):
        # weight on the algebraic slot z AND a parameter-dependent term
        return y[:, 0] ** 2 + 0.5 * y[:, 2] + 0.1 * k["k1"] * y[:, 1]

    def loss(xd, k):
        z0 = 1.0 - xd[:, 0] - xd[:, 1]
        y0 = jnp.concatenate([xd, z0[:, None]], axis=-1)
        yT, q = radau_adjoint(_rob_dae_rhs, (0.0, 2.0), y0, args=k,
                              options=opts, mass=mass, n_alg=1, cost=cost)
        return jnp.sum(w[None, :] * yT ** 2) + jnp.sum(q)

    g_x0, g_k = jax.grad(loss, argnums=(0, 1))(x0, k0)
    eps = 1e-6
    for name in ("k1", "k2", "k3"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            kp = dict(k0); km = dict(k0)
            kp[name] = k0[name] + e
            km[name] = k0[name] - e
            fd = (loss(x0, kp) - loss(x0, km)) / (2 * eps)
            np.testing.assert_allclose(float(g_k[name][i]), float(fd),
                                       rtol=5e-5, atol=1e-10,
                                       err_msg=f"d/d{name}[{i}]")
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(x0 + e, k0) - loss(x0 - e, k0)) / (2 * eps)
            np.testing.assert_allclose(float(g_x0[i, j]), float(fd),
                                       rtol=5e-5, atol=1e-10,
                                       err_msg=f"d/dx0[{i},{j}]")


def test_adjoint_event_on_index1_dae_matches_fd():
    """events + n_alg: terminal event on a semi-explicit index-1 DAE. The
    jump uses the CONSTRAINED velocity ẏ* = (ẋ, −g_z⁻¹(g_t+g_x ẋ)) and the
    jumped cotangent then passes through the adjoint-DAE terminal
    projections; the event function touches the ALGEBRAIC variable and an
    event-only parameter (g_θ). Mixed batch: lane 1 never triggers (plain
    DAE terminal adjoint on the full span). FD oracle on every input."""
    from janus_tpu.solve.events import Event

    m = 2
    # state (x, u | z): A = diag(2, 1), constraint z = x^2
    mass = jnp.diag(jnp.array([2.0, 1.0, 0.0]))

    def rhs(t, y, p):
        x, u, z = y[..., 0], y[..., 1], y[..., 2]
        return jnp.stack([-2.0 * p["th"] * x, -u, z - x * x], axis=-1)

    # z decays like x0^2 e^{-2 th t}; event z = c (direction -1)
    ev = Event(lambda t, y, p: y[..., 2] - p["c"], terminal=True,
               direction=-1.0)
    xu0 = jnp.array([[1.2, 0.8], [0.9, 1.1]])
    p0 = {"th": jnp.array([1.0, 1.3]),
          "c": jnp.array([0.3, 1e-4])}   # lane 1 never reaches 1e-4 by t=3
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    w = jnp.array([0.7, 1.9, 0.4])

    def loss(xu, p):
        z0 = xu[:, :1] ** 2                     # consistent algebraic IC
        y0 = jnp.concatenate([xu, z0], axis=-1)
        y_star, t_star = radau_adjoint(rhs, (0.0, 3.0), y0, args=p,
                                       options=opts, mass=mass, n_alg=1,
                                       events=ev)
        return (jnp.sum(w[None, :] * y_star ** 2)
                + jnp.sum(jnp.array([1.1, 0.6]) * t_star))

    # sanity: lane 0 triggered, lane 1 ran to tf
    z0 = xu0[:, :1] ** 2
    y0f = jnp.concatenate([xu0, z0], axis=-1)
    from janus_tpu.solve.radau import solve_radau
    sol = solve_radau(rhs, 0.0, 3.0, y0f, args=p0, options=opts, mass=mass,
                      events=ev)
    assert int(sol.event_idx[0]) == 0 and int(sol.event_idx[1]) == -1

    g_xu, g_p = jax.grad(loss, argnums=(0, 1))(xu0, p0)
    eps = 1e-6
    for name in ("th", "c"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            pp = dict(p0); pm = dict(p0)
            pp[name] = p0[name] + e
            pm[name] = p0[name] - e
            fd = (loss(xu0, pp) - loss(xu0, pm)) / (2 * eps)
            np.testing.assert_allclose(float(g_p[name][i]), float(fd),
                                       rtol=5e-5, atol=1e-9,
                                       err_msg=f"d/d{name}[{i}]")
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(xu0 + e, p0) - loss(xu0 - e, p0)) / (2 * eps)
            np.testing.assert_allclose(float(g_xu[i, j]), float(fd),
                                       rtol=5e-5, atol=1e-9,
                                       err_msg=f"d/dxu0[{i},{j}]")


def test_adjoint_gmres_index1_dae_matches_fd():
    """stage_solver='gmres' + n_alg: large-D semi-explicit index-1 DAE
    reverse mode, fully matrix-free — g_z comes from z-slot jvp probes of
    the matrix-free Jacobian, the FEM mass block solves run GMRES+Thomas
    (A⁻¹/A⁻ᵀ), and the backward stage sweeps use Jᵀ·v vjp pulls. Problem:
    1-D reaction-diffusion line (Dirichlet left) whose RIGHT boundary flux
    couples to an algebraic variable pinned to the boundary value,
    g(x, z) = z − x_last² (the full Jacobian is exactly tridiagonal, so the
    Thomas preconditioner is exact). D = 48+1 is far beyond the unrolled
    LU's trace budget. FD oracle with consistency-restored ICs."""
    n1 = 48
    m = 2
    dx = 1.0 / (n1 + 1)

    def rhs(t, y, p):
        nu, c = p
        x, z = y[:, :n1], y[:, n1]
        xl = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))       # Dirichlet 0 left
        xr = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))        # free right
        lap = (xl - 2.0 * x + xr) / dx ** 2
        fx = nu * lap + x * (1.0 - x)
        fx = fx.at[:, -1].add(c * z)                    # z feeds the flux
        g = z - x[:, -1] ** 2
        return jnp.concatenate([fx, g[:, None]], axis=-1)

    def cost(t, y, p):
        return jnp.mean(y[:, :n1] ** 2, axis=-1) + 0.5 * y[:, n1] ** 2

    # FEM-style tridiagonal mass on the differential block, zero z row
    a = (np.diag(np.full(n1, 2.0 / 3.0)) + np.diag(np.full(n1 - 1, 1.0 / 6.0), 1)
         + np.diag(np.full(n1 - 1, 1.0 / 6.0), -1))
    mass = jnp.asarray(np.block(
        [[a, np.zeros((n1, 1))], [np.zeros((1, n1 + 1))]]))

    xg = np.linspace(dx, 1.0 - dx, n1)
    x0 = jnp.tile(jnp.asarray(np.exp(-60.0 * (xg - 0.6) ** 2))[None], (m, 1))
    p0 = (jnp.array([0.02, 0.05])[:, None], jnp.array([0.8, 0.3]))
    opts = Options(rtol=1e-7, atol=1e-10, stage_solver="gmres",
                   gmres_iters=25)
    w = jnp.asarray(np.concatenate([xg, [0.7]]))

    @jax.jit
    def loss(x, p):
        z0 = x[:, -1:] ** 2                             # consistent IC
        y0 = jnp.concatenate([x, z0], axis=-1)
        yT, q = radau_adjoint(rhs, (0.0, 0.3), y0, args=p, options=opts,
                              mass=mass, n_alg=1, cost=cost)
        return jnp.sum(w[None, :] * yT ** 2) + jnp.sum(q)

    g_x0, g_p = jax.jit(jax.grad(loss, argnums=(0, 1)))(x0, p0)
    assert bool(jnp.all(jnp.isfinite(g_x0)))
    eps = 1e-5
    for i in range(m):
        e_nu = (jnp.zeros((m, 1)).at[i, 0].set(eps), jnp.zeros((m,)))
        fd = (loss(x0, (p0[0] + e_nu[0], p0[1]))
              - loss(x0, (p0[0] - e_nu[0], p0[1]))) / (2 * eps)
        np.testing.assert_allclose(float(g_p[0][i, 0]), float(fd),
                                   rtol=3e-4, err_msg=f"d/dnu[{i}]")
        e_c = jnp.zeros((m,)).at[i].set(eps)
        fd = (loss(x0, (p0[0], p0[1] + e_c))
              - loss(x0, (p0[0], p0[1] - e_c))) / (2 * eps)
        np.testing.assert_allclose(float(g_p[1][i]), float(fd),
                                   rtol=3e-4, atol=1e-9,
                                   err_msg=f"d/dc[{i}]")
    for j in (10, 30, 47):                              # spot-check x0 slots
        e = jnp.zeros((m, n1)).at[0, j].set(eps)
        fd = (loss(x0 + e, p0) - loss(x0 - e, p0)) / (2 * eps)
        np.testing.assert_allclose(float(g_x0[0, j]), float(fd), rtol=3e-4,
                                   atol=1e-8, err_msg=f"d/dx0[{j}]")


def test_adjoint_events_with_t_eval_matches_fd():
    """events + t_eval composition (VERDICT round-3 item 2): a trajectory-
    fitting loss over dense samples TRUNCATED at t* plus event terms, on a
    mixed trigger/no-trigger batch. Samples past t* are NaN (the forward
    path's convention); the loss masks them. Gradients w.r.t. y0 and every
    param (incl. the event level's g_θ term) must match FD re-solves."""
    from janus_tpu.solve.events import Event

    m = 2
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.0]])
    # lane 0 crosses the level inside the grid; lane 1 never does
    p0 = {"k": jnp.array([3.0, 3.0]), "c": jnp.array([0.3, 0.3]),
          "level": jnp.array([-0.5, -50.0])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    ev = Event(_level_event, terminal=True, direction=-1.0)
    t_eval = jnp.linspace(0.4, 3.2, 8)
    w_t = jnp.array([0.7, 1.3])

    def loss(z, p):
        ys, y_star, t_star = radau_adjoint(_osc_rhs, (0.0, 4.0), z, args=p,
                                           options=opts, events=ev,
                                           t_eval=t_eval)
        fit = jnp.sum(jnp.where(jnp.isfinite(ys), (ys - 0.3) ** 2, 0.0))
        return fit + jnp.sum(w_t * t_star) + jnp.sum(y_star[:, 1] ** 2)

    g_y0, g_p = jax.grad(loss, argnums=(0, 1))(y0, p0)
    assert bool(jnp.all(jnp.isfinite(g_y0)))
    eps = 1e-6
    for name in ("k", "c", "level"):
        for i in range(m):
            e = jnp.zeros((m,)).at[i].set(eps)
            pp = dict(p0); pm = dict(p0)                      # noqa: E702
            pp[name] = p0[name] + e
            pm[name] = p0[name] - e
            fd = (loss(y0, pp) - loss(y0, pm)) / (2 * eps)
            np.testing.assert_allclose(float(g_p[name][i]), float(fd),
                                       rtol=5e-4, atol=1e-9,
                                       err_msg=f"d/d{name}[{i}]")
    for i in range(m):
        for j in range(2):
            e = jnp.zeros((m, 2)).at[i, j].set(eps)
            fd = (loss(y0 + e, p0) - loss(y0 - e, p0)) / (2 * eps)
            np.testing.assert_allclose(float(g_y0[i, j]), float(fd),
                                       rtol=5e-4, atol=1e-9,
                                       err_msg=f"d/dy0[{i},{j}]")


def test_adjoint_events_t_eval_primal_matches_forward():
    """The chained events+t_eval primal must reproduce the forward solver's
    composed semantics: identical samples, NaN exactly past t*, identical
    (t*, y*)."""
    from janus_tpu.solve import solve_ivp
    from janus_tpu.solve.events import Event

    m = 2
    y0 = jnp.array([[2.0, 0.0], [2.0, 0.0]])
    p0 = {"k": jnp.array([3.0, 3.0]), "c": jnp.array([0.3, 0.3]),
          "level": jnp.array([-0.5, -50.0])}
    opts = Options(rtol=1e-10, atol=1e-13, adjoint_steps=512)
    ev = Event(_level_event, terminal=True, direction=-1.0)
    t_eval = jnp.linspace(0.4, 3.2, 8)

    ys, y_star, t_star = radau_adjoint(_osc_rhs, (0.0, 4.0), y0, args=p0,
                                       options=opts, events=ev,
                                       t_eval=t_eval)
    fwd = solve_ivp(_osc_rhs, (0.0, float(t_eval[-1])), y0, method="radau",
                    args=p0, options=opts, events=ev, t_eval=t_eval)
    np.testing.assert_allclose(np.asarray(t_star[0]),
                               np.asarray(fwd.event_t[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(y_star), np.asarray(fwd.y),
                               rtol=1e-7, atol=1e-10)
    a, b = np.asarray(ys), np.asarray(fwd.ys)
    assert (np.isnan(a) == np.isnan(b)).all()
    mask = ~np.isnan(a)
    np.testing.assert_allclose(a[mask], b[mask], rtol=1e-7, atol=1e-10)
