"""Variable-order BDF/NDF (orders 1-5) oracle tests.

Reference analog: examples/python/bdf_torch.py:1-129 (orders 1-5 adaptive
prototype) and the vendored scipy BDF (examples/python/bdf_reference.py).
Oracle patterns per SURVEY.md §4: scipy cross-checks at matched tolerance,
order adaptation exercised, dense output and events on the BDF interpolant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp as ss

from janus_tpu.solve import solve_ivp, Options, SUCCESS, EVENT_TERMINATED
from janus_tpu.solve.events import Event
from janus_tpu.models.problems import vdp_rhs, robertson_rhs, harmonic_rhs


def scipy_vdp(mu, tf, rtol, atol, method="BDF"):
    return ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
              (0.0, tf), [2.0, 0.0], method=method, rtol=rtol, atol=atol)


def test_stiff_vdp_scipy_parity():
    mu = 1000.0
    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)
    # step count within ~1.5x of scipy's own BDF at the same tolerance
    sp = scipy_vdp(mu, 2.0, 1e-7, 1e-10, method="BDF")
    assert int(sol.stats["nsteps"][0]) < 1.5 * sp.t.size + 50


def test_order_adaptation_exercised():
    """On a long stiff VdP run the order controller must actually climb."""
    mu = 100.0
    sol = solve_ivp(vdp_rhs, (0.0, 50.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.status[0]) == SUCCESS
    assert int(sol.stats["order"][0]) >= 3
    # and pays far fewer steps than BDF2 at the same tolerance
    sol2 = solve_ivp(vdp_rhs, (0.0, 50.0), jnp.array([[2.0, 0.0]]),
                     method="bdf2", args=mu, rtol=1e-7, atol=1e-10)
    assert int(sol.stats["nsteps"][0]) < 0.7 * int(sol2.stats["nsteps"][0])


def test_robertson_long_horizon():
    y0 = jnp.array([[1.0, 0.0, 0.0]])
    ref = ss(lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                           0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                           3e7 * y[1] ** 2],
             (0.0, 1e5), [1.0, 0.0, 0.0], method="Radau",
             rtol=1e-10, atol=1e-14)
    sol = solve_ivp(robertson_rhs, (0.0, 1e5), y0, method="bdf",
                    rtol=1e-7, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=2e-4, atol=1e-10)


def test_heterogeneous_batch():
    mus = jnp.array([1.0, 10.0, 100.0, 1000.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (4, 1))

    sol = solve_ivp(vdp_rhs, (0.0, 3.0), y0, method="bdf", args=mus,
                    rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i, mu in enumerate(np.asarray(mus)):
        ref = scipy_vdp(float(mu), 3.0, 1e-10, 1e-13, method="Radau")
        np.testing.assert_allclose(sol.y[i], ref.y[:, -1],
                                   rtol=5e-4, atol=5e-6)


def test_dense_output():
    t_eval = jnp.linspace(0.0, 10.0, 41)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11,
                    t_eval=t_eval)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.ys[0, :, 0], np.cos(np.asarray(t_eval)),
                               atol=2e-5)


def test_events_terminal():
    # harmonic oscillator: x crosses zero at t = pi/2
    ev = Event(lambda t, y, args: y[..., 0], terminal=True, direction=-1.0)
    sol = solve_ivp(harmonic_rhs, (0.0, 10.0), jnp.array([[1.0, 0.0]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11, events=ev)
    assert int(sol.status[0]) == EVENT_TERMINATED
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 2, atol=1e-5)
    np.testing.assert_allclose(float(sol.t[0]), np.pi / 2, atol=1e-5)


def test_reverse_time():
    sol = solve_ivp(harmonic_rhs, (2.0, 0.0),
                    jnp.array([[np.cos(2.0), -np.sin(2.0)]]),
                    method="bdf", args=1.0, rtol=1e-8, atol=1e-11)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], [1.0, 0.0], atol=1e-5)


def test_classic_bdf_toggle():
    """ndf=False (classical BDF) must also integrate correctly."""
    from janus_tpu.solve.ndf import solve_bdf
    mu = 100.0
    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_bdf(vdp_rhs, 0.0, 2.0, jnp.array([[2.0, 0.0]]), args=mu,
                    options=Options(rtol=1e-7, atol=1e-10), ndf=False)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)


def test_analytic_jacobian_path():
    mu = 1000.0

    def jac(t, y, args):
        x, v = y[..., 0], y[..., 1]
        z = jnp.zeros_like(x)
        row0 = jnp.stack([z, jnp.ones_like(x)], axis=-1)
        row1 = jnp.stack([-2 * mu * x * v - 1.0, mu * (1 - x * x)], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    ref = scipy_vdp(mu, 2.0, 1e-10, 1e-13, method="Radau")
    sol = solve_ivp(vdp_rhs, (0.0, 2.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=mu, rtol=1e-7, atol=1e-10, jac=jac)
    assert int(sol.status[0]) == SUCCESS
    np.testing.assert_allclose(sol.y[0], ref.y[:, -1], rtol=1e-4, atol=1e-6)


def test_ndf_invertible_mass_matches_scipy():
    """FEM-style tridiagonal mass on a small reaction line: the NDF
    corrector (M − c·J)·Δ = c·f − M·(ψ + d) must match scipy BDF on the
    transformed system y' = M⁻¹f (scipy's BDF has no mass support —
    MATLAB's ode15s is the role model)."""
    from scipy.integrate import solve_ivp as ssolve

    d = 12
    dx = 1.0 / (d + 1)

    def rhs(t, y, args):
        left = jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
        right = jnp.pad(y[:, 1:], ((0, 0), (0, 1)))
        lap = (left - 2 * y + right) / dx ** 2
        return 0.02 * lap + args * y * (1.0 - y)

    mass = (jnp.eye(d) * 2.0 / 3.0 + jnp.eye(d, k=1) / 6.0
            + jnp.eye(d, k=-1) / 6.0)
    xg = np.linspace(dx, 1.0 - dx, d)
    y0 = jnp.asarray(np.exp(-100 * (xg - 0.4) ** 2))[None]
    r = 4.0
    sol = solve_ivp(rhs, (0.0, 0.5), y0, method="bdf", args=r, mass=mass,
                    rtol=1e-9, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS

    minv = np.linalg.inv(np.asarray(mass))

    def f1(t, y):
        lap = np.empty_like(y)
        lap[0] = (y[1] - 2 * y[0]) / dx ** 2
        lap[-1] = (y[-2] - 2 * y[-1]) / dx ** 2
        lap[1:-1] = (y[:-2] - 2 * y[1:-1] + y[2:]) / dx ** 2
        return minv @ (0.02 * lap + r * y * (1 - y))

    ref = ssolve(f1, (0, 0.5), np.asarray(y0[0]), method="BDF",
                 rtol=1e-11, atol=1e-14)
    assert ref.success
    np.testing.assert_allclose(np.asarray(sol.y[0]), ref.y[:, -1],
                               rtol=1e-6, atol=1e-9)


def test_ndf_robertson_dae_matches_radau():
    """Robertson in semi-explicit index-1 DAE form (mass = diag(1,1,0),
    third row the conservation constraint): NDF must track the radau DAE
    solve at tight tolerance — the ode15s singular-mass role, enabled by
    the linearized backward-Euler difference-array startup (VERDICT
    round-3 item 8)."""
    from janus_tpu.solve.radau import solve_radau

    def dae(t, y, args):
        x1, x2, z = y[:, 0], y[:, 1], y[:, 2]
        return jnp.stack([
            -0.04 * x1 + 1e4 * x2 * z,
            0.04 * x1 - 1e4 * x2 * z - 3e7 * x2 ** 2,
            x1 + x2 + z - 1.0,
        ], axis=-1)

    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    y0 = jnp.array([[1.0, 0.0, 0.0]])
    tf = 100.0
    sol = solve_ivp(dae, (0.0, tf), y0, method="bdf", mass=mass,
                    rtol=1e-8, atol=1e-12)
    assert int(sol.status[0]) == SUCCESS
    ref = solve_radau(dae, 0.0, tf, y0, mass=mass,
                      options=Options(rtol=1e-11, atol=1e-14))
    assert int(ref.status[0]) == SUCCESS
    np.testing.assert_allclose(np.asarray(sol.y[0]), np.asarray(ref.y[0]),
                               rtol=1e-6, atol=1e-12)
    # constraint satisfied at the end
    np.testing.assert_allclose(float(jnp.sum(sol.y[0])), 1.0, rtol=1e-9)


@pytest.mark.parametrize("stage_solver", ["gmres", "tridiag"])
def test_ndf_gmres_mol_line_matches_scipy(stage_solver):
    """Matrix-free NDF corrector solves (the reference's BDF+Krylov mode,
    vdp_bdf_gmres.cpp): D = 96 Fisher-KPP line far beyond the unrolled
    dense LU; GMRES + tridiagonal probe preconditioner, or the direct
    tridiagonal modified-Newton ('tridiag')."""
    from scipy.integrate import solve_ivp as ssolve

    d = 96
    dx = 1.0 / (d + 1)
    xg = np.linspace(dx, 1.0 - dx, d)

    def rhs(t, y, args):
        nu, r = args
        left = jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
        right = jnp.pad(y[:, 1:], ((0, 0), (0, 1)))
        lap = (left - 2 * y + right) / dx ** 2
        return nu * lap + r * y * (1.0 - y)

    m = 2
    y0 = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2))[None], (m, 1))
    rates = jnp.array([1.0, 8.0])[:, None]
    opts = Options(rtol=1e-7, atol=1e-10, stage_solver=stage_solver,
                   gmres_iters=15)
    sol = solve_ivp(rhs, (0.0, 0.4), y0, method="bdf", args=(0.01, rates),
                    options=opts)
    assert bool(jnp.all(sol.status == SUCCESS))
    for i in range(m):
        r = float(rates[i, 0])

        def f1(t, y):
            lap = np.empty_like(y)
            lap[0] = (y[1] - 2 * y[0]) / dx ** 2
            lap[-1] = (y[-2] - 2 * y[-1]) / dx ** 2
            lap[1:-1] = (y[:-2] - 2 * y[1:-1] + y[2:]) / dx ** 2
            return 0.01 * lap + r * y * (1 - y)

        ref = ssolve(f1, (0, 0.4), np.asarray(y0[i]), method="BDF",
                     rtol=1e-9, atol=1e-12)
        assert ref.success
        np.testing.assert_allclose(np.asarray(sol.y[i]), ref.y[:, -1],
                                   rtol=1e-4, atol=1e-7, err_msg=f"lane {i}")


def test_ndf_gmres_rejects_analytic_jac():
    with pytest.raises(ValueError):
        solve_ivp(lambda t, y, a: -y, (0.0, 1.0), jnp.zeros((1, 4)),
                  method="bdf", jac=lambda t, y, a: jnp.zeros((1, 4, 4)),
                  options=Options(stage_solver="gmres"))


# ---------------------------------------------------------------------------
# first-class IND tangents (solve_bdf(tangents=), round 4)
# ---------------------------------------------------------------------------

def test_ndf_ind_tangents_match_jvp():
    # y0 seed + parameter seed vs jax.jvp through the full solver. IND
    # freezes the mesh controls, jvp differentiates them too — they agree
    # to O(rtol), both converging to the true sensitivity.
    m = 4
    mu = jnp.array([1.0, 5.0, 20.0, 50.0])
    y0 = jnp.stack([jnp.full((m,), 2.0), jnp.zeros((m,))], axis=-1)
    opts = Options(rtol=1e-8, atol=1e-10)
    seeds = jnp.zeros((2, m, 2)).at[0, :, 0].set(1.0)
    args_t = {"mu": jnp.stack([jnp.zeros(m), jnp.ones(m)])}

    f = vdp_rhs
    sol = solve_ivp(f, (0.0, 1.0), y0, method="bdf", args={"mu": mu},
                    options=opts, tangents=seeds, args_tangents=args_t)
    assert bool(jnp.all(sol.status == SUCCESS))
    assert sol.sens.shape == (2, m, 2)

    def run(y0_, mu_):
        return solve_ivp(f, (0.0, 1.0), y0_, method="bdf",
                         args={"mu": mu_}, options=opts).y

    _, j1 = jax.jvp(run, (y0, mu), (seeds[0], jnp.zeros(m)))
    _, j2 = jax.jvp(run, (y0, mu), (jnp.zeros_like(y0), jnp.ones(m)))
    np.testing.assert_allclose(np.asarray(sol.sens[0]), np.asarray(j1),
                               rtol=0, atol=3e-6)
    np.testing.assert_allclose(np.asarray(sol.sens[1]), np.asarray(j2),
                               rtol=0, atol=3e-6)


def test_ndf_ind_tangents_dae_mass_vs_fd():
    # Robertson semi-explicit index-1 DAE: consistent seed (1, 0, -1)
    # (perturbation stays on the constraint manifold) vs central FD
    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0]))
    m = 3
    y0 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (m, 1))
    args = (4e-2, 3e7, 1e4)
    opts = Options(rtol=1e-8, atol=1e-11)

    def f(t, y, a):
        k1, k2, k3 = a
        y1, y2, y3 = y[..., 0], y[..., 1], y[..., 2]
        return jnp.stack([-k1 * y1 + k3 * y2 * y3,
                          k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3,
                          y1 + y2 + y3 - 1.0], axis=-1)

    seeds = jnp.zeros((1, m, 3)).at[0, :, 0].set(1.0).at[0, :, 2].set(-1.0)
    sol = solve_ivp(f, (0.0, 10.0), y0, method="bdf", args=args,
                    options=opts, mass=mass, tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))

    eps = 1e-6
    yp = y0.at[:, 0].add(eps).at[:, 2].add(-eps)
    ym = y0.at[:, 0].add(-eps).at[:, 2].add(eps)
    sp = solve_ivp(f, (0.0, 10.0), yp, method="bdf", args=args,
                   options=opts, mass=mass).y
    sm = solve_ivp(f, (0.0, 10.0), ym, method="bdf", args=args,
                   options=opts, mass=mass).y
    fd = (sp - sm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(sol.sens[0]), np.asarray(fd),
                               rtol=0, atol=2e-5)


def test_ndf_ind_tangents_gmres_corrector():
    # matrix-free corrector (tridiag preconditioner) + tangents: the
    # Richardson tangent iteration reuses the step's frozen gmres closures
    D = 48
    x = jnp.linspace(0, 1, D)

    def heat(t, y, args):
        k = args
        lap = jnp.roll(y, 1, -1) - 2 * y + jnp.roll(y, -1, -1)
        lap = lap.at[..., 0].set(y[..., 1] - 2 * y[..., 0])
        lap = lap.at[..., -1].set(y[..., -2] - 2 * y[..., -1])
        return k * lap * (D + 1) ** 2 + y * (1 - y)

    y0 = jnp.stack([jnp.exp(-40 * (x - 0.3) ** 2),
                    jnp.exp(-40 * (x - 0.6) ** 2)])
    opts = Options(rtol=1e-7, atol=1e-10, stage_solver="gmres",
                   gmres_iters=8)
    seeds = jnp.zeros((1, 2, D)).at[0].set(jnp.sin(jnp.pi * x)[None])
    sol = solve_ivp(heat, (0.0, 0.2), y0, method="bdf", args=0.05,
                    options=opts, tangents=seeds)
    assert bool(jnp.all(sol.status == SUCCESS))

    def run(y0_):
        return solve_ivp(heat, (0.0, 0.2), y0_, method="bdf", args=0.05,
                         options=opts).y

    _, jg = jax.jvp(run, (y0,), (seeds[0],))
    np.testing.assert_allclose(np.asarray(sol.sens[0]), np.asarray(jg),
                               rtol=0, atol=2e-5)


def test_ndf_ind_terminal_only_raises():
    y0 = jnp.zeros((1, 2))
    seeds = jnp.zeros((1, 1, 2))
    with pytest.raises(ValueError, match="terminal-mode"):
        solve_ivp(lambda t, y, a: -y, (0.0, 1.0), y0, method="bdf",
                  tangents=seeds, t_eval=jnp.array([0.5, 1.0]))
    with pytest.raises(ValueError, match="terminal-mode"):
        solve_ivp(lambda t, y, a: -y, (0.0, 1.0), y0, method="bdf",
                  tangents=seeds,
                  events=Event(lambda t, y, a: y[..., 0] - 0.5))


def test_ndf_ind_dual_solve_routing():
    # dual_solve_ivp(method='bdf') must ride the IND fast path (no warning)
    import warnings as _w
    from janus_tpu.jet.core import Jet
    from janus_tpu.jet.solve import dual_solve_ivp
    m = 2
    mu = jnp.array([2.0, 10.0])
    y0 = jnp.stack([jnp.full((m,), 2.0), jnp.zeros((m,))], axis=-1)
    seeds = jnp.zeros((1, m, 2)).at[0, :, 0].set(1.0)
    y0j = Jet(y0, seeds)
    f = vdp_rhs
    with _w.catch_warnings():
        _w.simplefilter("error")
        yj, tj, sol = dual_solve_ivp(f, (0.0, 1.0), y0j, method="bdf",
                                     args=mu, rtol=1e-8, atol=1e-10)
    assert yj.d.shape == (1, m, 2)

    def run(y0_):
        return solve_ivp(f, (0.0, 1.0), y0_, method="bdf", args=mu,
                         options=Options(rtol=1e-8, atol=1e-10)).y

    _, j1 = jax.jvp(run, (y0,), (seeds[0],))
    np.testing.assert_allclose(np.asarray(yj.d[0]), np.asarray(j1),
                               rtol=0, atol=3e-6)


def test_ndf_dense_mesh_interpolate_and_quad():
    # dense= stores the backward-difference polynomial in the shared power
    # basis (base value = interp(0), which keeps the 5-power expansion
    # exact); interpolate must equal the t_eval sampling path to roundoff.
    # quad= is GL-3 on the same interpolant vs a scipy-augmented oracle.
    mus = jnp.array([10.0, 200.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    ts = jnp.linspace(0.0, 3.0, 23)
    sol = solve_ivp(vdp_rhs, (0.0, 3.0), y0, method="bdf", args=mus,
                    rtol=1e-8, atol=1e-11, dense=2048,
                    quad=lambda t, y, a: y[:, 0] ** 2)
    assert bool(jnp.all(sol.status == SUCCESS))
    yi = sol.interpolate(ts)
    ref = solve_ivp(vdp_rhs, (0.0, 3.0), y0, method="bdf", args=mus,
                    rtol=1e-8, atol=1e-11, t_eval=ts)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(ref.ys),
                               rtol=0, atol=1e-13)
    for i, mu in enumerate(np.asarray(mus)):
        oracle = ss(lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0],
                                  y[0] ** 2],
                    (0, 3.0), [2.0, 0.0, 0.0], method="Radau",
                    rtol=1e-11, atol=1e-14)
        np.testing.assert_allclose(float(sol.quad[i]), oracle.y[2, -1],
                                   rtol=1e-6, err_msg=f"lane {i}")


def test_ndf_dense_overflow_nan():
    sol = solve_ivp(vdp_rhs, (0.0, 3.0), jnp.array([[2.0, 0.0]]),
                    method="bdf", args=100.0, rtol=1e-8, atol=1e-11,
                    dense=4)
    yi = sol.interpolate(jnp.linspace(0.0, 3.0, 5))
    assert bool(jnp.all(jnp.isnan(yi)))
