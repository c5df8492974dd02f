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
