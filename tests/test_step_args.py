"""Per-accepted-step parameter slabs on the ADAPTIVE steppers.

Reference semantics: dopri853ted.hpp:302-308 (``theta`` sliced by the step
count, every stage of a step on the same slab; exhaustion error :658-666)
and seulexted.py:13-27, 326-370 (``nparams_step``). Here the slab index is
each lane's OWN accept count and exhaustion is a per-lane status
(PARAMS_EXHAUSTED) instead of a host-side throw.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import (solve_ivp, Options, SUCCESS, PARAMS_EXHAUSTED)


def _slab_rhs(t, y, a):
    # forcing-only RHS: ydot = u (the current slab row), per lane
    args, u = a
    return jnp.broadcast_to(u[:, None], y.shape)


@pytest.mark.parametrize("method", ["dopri5", "dopri853", "seulex",
                                    "rodas", "radau"])
def test_constant_slabs_match_plain_run(method):
    # a slab table whose rows are all identical must reproduce the plain
    # args run exactly (same mesh, same stages)
    mu = jnp.array([5.0, 50.0])
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
    if method in ("seulex", "rodas", "radau"):
        tf = 1.0
    else:
        mu = jnp.array([0.5, 2.0])   # explicit methods: nonstiff
        tf = 2.0

    def vdp(t, y, a):
        m_ = a[0] if isinstance(a, tuple) else a
        x, v = y[..., 0], y[..., 1]
        return jnp.stack([v, m_ * (1 - x * x) * v - x], axis=-1)

    def vdp_slab(t, y, a):
        base, slab = a
        return vdp(t, y, base * slab)

    opts = Options(rtol=1e-7, atol=1e-10)
    plain = solve_ivp(vdp, (0.0, tf), y0, method=method, args=mu,
                      options=opts)
    S = 512
    slabs = jnp.ones((S,))
    slabbed = solve_ivp(vdp_slab, (0.0, tf), y0, method=method, args=mu,
                        options=opts, step_args=slabs)
    assert bool(jnp.all(plain.status == SUCCESS))
    assert bool(jnp.all(slabbed.status == SUCCESS))
    np.testing.assert_allclose(np.asarray(slabbed.y), np.asarray(plain.y),
                               rtol=0, atol=1e-13)
    assert bool(jnp.all(slabbed.stats["naccept"] == plain.stats["naccept"]))


@pytest.mark.parametrize("method", ["dopri5", "dopri853", "seulex",
                                    "rodas", "radau"])
def test_exhaustion_status(method):
    # far fewer slab rows than steps: the lane must FAIL loudly with
    # PARAMS_EXHAUSTED (the reference's exhaustion throw, made per-lane)
    y0 = jnp.array([[1.0, 0.0]])

    def f(t, y, a):
        base, slab = a
        return jnp.stack([y[..., 1], -y[..., 0]], axis=-1) * (1.0 + 0 * slab[:, None])

    sol = solve_ivp(f, (0.0, 50.0), y0, method=method, args=None,
                    options=Options(rtol=1e-9, atol=1e-12, max_step=1.0),
                    step_args=jnp.ones((3,)))
    assert int(sol.status[0]) == PARAMS_EXHAUSTED
    # it failed exactly when the rows ran out
    assert int(sol.stats["naccept"][0]) == 3


def test_dopri_step_indexed_forcing_playback_oracle():
    # slab row k holds the value k; ydot = u  =>  y(T) - y0 = sum_k k * h_k
    # over the accepted steps — checked against the DynTe playback rings
    m = 2
    y0 = jnp.zeros((m, 1))
    S = 256
    slabs = jnp.arange(S, dtype=jnp.float64) / S
    opts = Options(rtol=1e-8, atol=1e-11, record_steps=256, max_step=0.25)
    sol = solve_ivp(_slab_rhs, (0.0, 3.0), y0, method="dopri853",
                    args=None, options=opts, step_args=slabs)
    assert bool(jnp.all(sol.status == SUCCESS))
    dyn = sol.dyn
    acc = np.asarray(dyn["accepted"])
    h = np.asarray(dyn["h"])
    for lane in range(m):
        hs = h[lane][acc[lane]]
        expected = float(np.sum(np.arange(hs.size) / S * hs))
        np.testing.assert_allclose(float(sol.y[lane, 0]), expected,
                                   rtol=1e-12, atol=1e-12,
                                   err_msg=f"lane {lane}")


def test_per_lane_slab_table():
    # leaves with second axis == M are per-lane tables [S, M]: each lane
    # integrates its OWN staircase
    m = 3
    y0 = jnp.zeros((m, 1))
    S = 128
    base = jnp.linspace(0.1, 1.0, S)
    lane_scale = jnp.array([1.0, 2.0, -1.0])
    table = base[:, None] * lane_scale[None, :]          # [S, M]
    opts = Options(rtol=1e-8, atol=1e-11, record_steps=256, max_step=0.25)
    sol = solve_ivp(_slab_rhs, (0.0, 2.0), y0, method="dopri5",
                    args=None, options=opts, step_args=table)
    assert bool(jnp.all(sol.status == SUCCESS))
    acc = np.asarray(sol.dyn["accepted"])
    h = np.asarray(sol.dyn["h"])
    for lane in range(m):
        hs = h[lane][acc[lane]]
        u = np.asarray(base)[: hs.size] * float(lane_scale[lane])
        np.testing.assert_allclose(float(sol.y[lane, 0]),
                                   float(np.sum(u * hs)),
                                   rtol=1e-12, atol=1e-12)


def test_slab_gradients_forward_mode():
    # the reference's whole point: theta is a DUAL — optimize a per-step
    # control table. jvp through the solve w.r.t. the slab table vs FD.
    m = 1
    y0 = jnp.zeros((m, 1))
    S = 64
    slabs0 = jnp.linspace(0.2, 0.8, S)
    opts = Options(rtol=1e-8, atol=1e-11, max_step=0.25)

    def rhs(t, y, a):
        _, u = a
        # control enters nonlinearly so the gradient is nontrivial
        return (u[:, None] - 0.5 * y) * 1.0

    def run(slabs):
        return solve_ivp(rhs, (0.0, 2.0), y0, method="dopri5", args=None,
                         options=opts, step_args=slabs).y[0, 0]

    seed = jnp.sin(jnp.arange(S) * 0.3)
    _, jv = jax.jvp(run, (slabs0,), (seed,))
    # FD needs LARGE eps here: the two FD meshes are chosen independently,
    # so small eps divides O(rtol) mesh noise (the radau-HVP FD lesson —
    # measured: eps=1e-7 gives -1.34, 1e-6 -0.609, 1e-4 -0.5617 vs
    # jvp -0.5614; FD converges TOWARD the jvp as eps grows)
    eps = 1e-4
    fd = (run(slabs0 + eps * seed) - run(slabs0 - eps * seed)) / (2 * eps)
    np.testing.assert_allclose(float(jv), float(fd), rtol=5e-3, atol=1e-10)


def test_step_args_unsupported_method_raises():
    with pytest.raises(ValueError, match="step_args"):
        solve_ivp(lambda t, y, a: -y, (0.0, 1.0), jnp.zeros((1, 2)),
                  method="bdf", step_args=jnp.ones((4,)))
    # variable-order radau has no slab-row contract (re-attempts across
    # orders); only fixed-stage radau takes slabs
    with pytest.raises(ValueError, match="fixed-stage"):
        solve_ivp(lambda t, y, a: -y, (0.0, 1.0), jnp.zeros((1, 2)),
                  method="radaup", step_args=jnp.ones((4,)))
