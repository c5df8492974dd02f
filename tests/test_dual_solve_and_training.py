"""Dual-number solves (sensitivities incl. final time) + NN Hamiltonian
training through the solver — the reference's flagship capabilities
(RadauTedTest.SensitivityTest ode_solver_test.cpp:620-763; DeltaNet training
sssc_dnn_vdp_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from janus_tpu import ham
from janus_tpu.jet.solve import dual_solve_ivp, solve_with_sensitivities
from janus_tpu.jet.core import Jet
from janus_tpu.models.neural import mlp_init, mlp_apply
from janus_tpu.models.problems import vdp_rhs, harmonic_rhs
from janus_tpu.solve import solve_ivp, Options
from janus_tpu.solve.fixed import odeint_fixed


def test_sensitivities_vs_fd_resolve_stiff():
    """∂y(T)/∂y0 on stiff VdP vs finite-difference re-solves at the
    reference's tolerances (atol 1e-3/1e-4, ode_solver_test.cpp:654-682)."""
    mu = 100.0
    tf = 0.5
    y0 = jnp.array([[2.0, 0.5]])
    opts = Options(rtol=1e-10, atol=1e-13)
    yj, sol = solve_with_sensitivities(vdp_rhs, (0.0, tf), y0, args=mu,
                                       options=opts)
    assert int(sol.status[0]) == 1
    eps = 1e-6
    for j in range(2):
        e = jnp.zeros((1, 2)).at[0, j].set(eps)
        sp = solve_ivp(vdp_rhs, (0.0, tf), y0 + e, args=mu, method="radau",
                       options=opts)
        sm = solve_ivp(vdp_rhs, (0.0, tf), y0 - e, args=mu, method="radau",
                       options=opts)
        fd = (sp.y - sm.y) / (2 * eps)
        np.testing.assert_allclose(yj.d[j], fd, rtol=1e-3, atol=1e-4)


def test_final_time_sensitivity_column():
    """∂y(T)/∂T must equal f(T, y(T)) (the extra dual column,
    ode_solver_test.cpp:647)."""
    mu = 10.0
    tf = 1.0
    y0 = jnp.array([[2.0, 0.0]])
    yj, sol = solve_with_sensitivities(vdp_rhs, (0.0, tf), y0, args=mu,
                                       options=Options(rtol=1e-11, atol=1e-14),
                                       wrt_tf=True)
    assert yj.nsens == 3
    expect = vdp_rhs(tf, yj.r, mu)
    np.testing.assert_allclose(yj.d[2], expect, rtol=1e-6, atol=1e-8)


def test_parameter_sensitivity_via_jet_args():
    """Jet-valued args: ∂y(T)/∂μ rides through the solve."""
    tf = 1.0
    y0 = jnp.array([[2.0, 0.0]])
    mu = Jet(jnp.asarray(10.0), jnp.ones((1,)))
    yj, tj, sol = dual_solve_ivp(vdp_rhs, (0.0, tf), y0, args=mu,
                                 options=Options(rtol=1e-11, atol=1e-14))
    eps = 1e-6
    sp = solve_ivp(vdp_rhs, (0.0, tf), y0, args=10.0 + eps, method="radau",
                   options=Options(rtol=1e-11, atol=1e-14))
    sm = solve_ivp(vdp_rhs, (0.0, tf), y0, args=10.0 - eps, method="radau",
                   options=Options(rtol=1e-11, atol=1e-14))
    fd = (sp.y - sm.y) / (2 * eps)
    np.testing.assert_allclose(yj.d[0], fd, rtol=1e-4, atol=1e-6)


def test_forward_vs_reverse_gradients_agree():
    """SURVEY build step 7: gradients via forward sensitivities through the
    ADAPTIVE solver vs reverse mode through the FIXED-step solver agree."""
    omega = 1.3
    y0 = jnp.array([[1.0, 0.2]])
    tf = 2.0
    target = jnp.array([[0.3, -0.5]])

    def loss_adaptive(om):
        sol = solve_ivp(harmonic_rhs, (0.0, tf), y0, args=om,
                        method="radau", rtol=1e-11, atol=1e-14)
        return jnp.sum((sol.y - target) ** 2)

    def loss_fixed(om):
        yT = odeint_fixed(harmonic_rhs, 0.0, tf, y0, n_steps=400, args=om)
        return jnp.sum((yT - target) ** 2)

    g_fwd = jax.jacfwd(loss_adaptive)(omega)
    g_rev = jax.grad(loss_fixed)(omega)
    np.testing.assert_allclose(g_fwd, g_rev, rtol=1e-5)


def test_train_nn_hamiltonian_through_solver():
    """Config 4 (small): fit an MLP Hamiltonian so the learned dynamics
    reproduce harmonic-oscillator trajectories; loss must drop >100x."""
    key = jax.random.PRNGKey(0)
    dim = 2           # phase space [q, v]
    params = mlp_init(key, [dim, 32, 32, 1], jnp.float64)

    def nn_rhs(t, y, p):
        def h_single(yy):
            return jnp.sum(mlp_apply(p, yy))

        def single(yy):
            g = jax.grad(h_single)(yy)
            # canonical: q' = ∂H/∂v, v' = −∂H/∂q  (y = [q, v])
            return jnp.stack([g[1], -g[0]])
        return jax.vmap(single)(y)

    # training data: true oscillator flows over short horizons
    m = 64
    key, k1, k2 = jax.random.split(key, 3)
    y0s = jax.random.normal(k1, (m, dim))
    dt = 0.5
    y1s = odeint_fixed(harmonic_rhs, 0.0, dt, y0s, n_steps=64, args=1.0)

    def loss_fn(p):
        pred = odeint_fixed(nn_rhs, 0.0, dt, y0s, n_steps=16, args=p)
        return jnp.mean((pred - y1s) ** 2)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    l0 = float(loss_fn(params))
    for _ in range(300):
        params, opt_state, l = step(params, opt_state)
    l1 = float(l)
    assert l1 < l0 / 100, (l0, l1)
    # the learned field should now generalize to unseen states
    ytest = jnp.array([[0.7, -0.3]])
    pred = odeint_fixed(nn_rhs, 0.0, dt, ytest, n_steps=64, args=params)
    true = odeint_fixed(harmonic_rhs, 0.0, dt, ytest, n_steps=64, args=1.0)
    np.testing.assert_allclose(pred, true, atol=0.05)


def test_dyn_playback_recording():
    """DynTe-style per-step logs (SURVEY §5)."""
    mu = 50.0
    sol = solve_ivp(vdp_rhs, (0.0, 5.0), jnp.array([[2.0, 0.0]]),
                    method="radau", args=mu,
                    options=Options(rtol=1e-6, atol=1e-9, record_steps=256))
    assert sol.dyn is not None
    n = int(sol.stats["nsteps"][0])
    assert int(sol.dyn["idx"][0]) == n
    hs = np.asarray(sol.dyn["h"][0, :n])
    acc = np.asarray(sol.dyn["accepted"][0, :n])
    assert np.all(np.isfinite(hs))
    assert acc.sum() == int(sol.stats["naccept"][0])
    # recorded accepted h values integrate to tf
    ts = np.asarray(sol.dyn["t"][0, :n])
    np.testing.assert_allclose((ts[acc] + hs[acc]).max(), 5.0, rtol=1e-12)


def test_state_recording():
    """record_states stores the accepted trajectory (solout buffer role)."""
    mu = 20.0
    sol = solve_ivp(vdp_rhs, (0.0, 3.0), jnp.array([[2.0, 0.0]]),
                    method="radau", args=mu,
                    options=Options(rtol=1e-8, atol=1e-11, record_steps=256,
                                    record_states=True))
    n = int(sol.dyn["idx"][0])
    acc = np.asarray(sol.dyn["accepted"][0, :n])
    ys = np.asarray(sol.dyn["y"][0, :n][acc])
    ts = np.asarray(sol.dyn["t"][0, :n][acc]) + np.asarray(
        sol.dyn["h"][0, :n][acc])
    # recorded trajectory matches a dense-output resample at those times
    sol2 = solve_ivp(vdp_rhs, (0.0, 3.0), jnp.array([[2.0, 0.0]]),
                     method="radau", args=mu, rtol=1e-8, atol=1e-11,
                     t_eval=jnp.asarray(ts[:-1]))
    np.testing.assert_allclose(ys[:-1], np.asarray(sol2.ys[0]),
                               rtol=1e-6, atol=1e-8)
    # final recorded state equals the solution endpoint
    np.testing.assert_allclose(ys[-1], np.asarray(sol.y[0]), rtol=1e-12)


def test_tf_jet_fast_path_no_fallback():
    """A Jet tf rides the IND fast path: the terminal-time column is the
    one-rhs-call correction dy(T)/dT = f(T, y(T)) — no transform fallback
    (a warning here = regression)."""
    import warnings
    tf = 1.0
    y0 = Jet(jnp.array([[2.0, 0.0]]),
             jnp.stack([jnp.array([[1.0, 0.0]]), jnp.array([[0.0, 1.0]])]))
    tfj = Jet(jnp.asarray(tf), jnp.array([0.0, 0.0]))  # primal-only tf col
    opts = Options(rtol=1e-11, atol=1e-14)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        yj, tj, sol = dual_solve_ivp(vdp_rhs, (0.0, tfj), y0, args=10.0,
                                     options=opts)
    # zero tf seed: matches the pure-y0 IND sensitivities
    ref = solve_ivp(vdp_rhs, (0.0, tf), y0.r, args=10.0, method="radau",
                    options=opts, tangents=y0.d)
    np.testing.assert_allclose(np.asarray(yj.d), np.asarray(ref.sens),
                               rtol=1e-9, atol=1e-12)

    # live tf seed: the extra column is f(T, y(T))
    tfj2 = Jet(jnp.asarray(tf), jnp.array([0.0, 1.0]))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        yj2, tj2, _ = dual_solve_ivp(vdp_rhs, (0.0, tfj2), y0, args=10.0,
                                     options=opts)
    expect = np.asarray(ref.sens[1] + vdp_rhs(tf, yj2.r, 10.0))
    np.testing.assert_allclose(np.asarray(yj2.d[1]), expect,
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(tj2.d), [[0.0], [1.0]], atol=0)


def test_events_fast_path_exposes_event_time_tangents():
    """Terminal events ride the IND fast path (fixed-stage radau): y* AND
    t* tangents come back as Jets, matching central FD re-solves."""
    import warnings
    from janus_tpu.solve.events import Event

    def f(t, y, args):
        return jnp.stack([y[..., 1], -args * y[..., 0]], axis=-1)

    # crossing y1 = 0 from above, omega^2 = args: t* = pi/(2 sqrt(args))
    ev = Event(lambda t, y, a: y[..., 0], terminal=True, direction=-1)
    y0r = jnp.array([[1.0, 0.0]])
    seeds = jnp.stack([jnp.array([[1.0, 0.0]]), jnp.array([[0.0, 1.0]])])
    opts = Options(rtol=1e-11, atol=1e-14)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        yj, tj, sol = dual_solve_ivp(f, (0.0, 4.0), Jet(y0r, seeds),
                                     args=4.0, options=opts, events=ev)
    assert int(sol.status[0]) == 5                     # EVENT_TERMINATED
    np.testing.assert_allclose(float(tj.r[0]), np.pi / 4, rtol=1e-8)

    eps = 1e-6
    for k in range(2):
        sp = solve_ivp(f, (0.0, 4.0), y0r + eps * seeds[k], args=4.0,
                       method="radau", options=opts, events=ev)
        sm = solve_ivp(f, (0.0, 4.0), y0r - eps * seeds[k], args=4.0,
                       method="radau", options=opts, events=ev)
        fd_y = (sp.y - sm.y) / (2 * eps)
        fd_t = (sp.t - sm.t) / (2 * eps)
        # central FD of a component with zero first derivative leaves an
        # O(eps)*curvature residual (~1.3e-7 here) — atol must sit above it
        np.testing.assert_allclose(np.asarray(yj.d[k]), np.asarray(fd_y),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tj.d[k]), np.asarray(fd_t),
                                   rtol=1e-4, atol=1e-6)
