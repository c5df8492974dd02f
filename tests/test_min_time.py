"""Free-final-time PMP shooting (the reference's flagship L3 workload:
unknowns [p10, p20, tF] with H(tF) = 0 transversality,
vdp_pmp_transient_multishoot.py:380-401 / vdp_sssc_minT.py) — min-time VdP
with a umax GRID converging as ONE batch, tF Jacobian column from the
Jet-tf endpoint velocity, p0 columns from IND tangents."""

import os
import sys

import numpy as np
import pytest

# heavy tier: shooting Newton = many solve-with-tangents compiles
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def test_min_time_umax_grid_converges_in_one_batch():
    import jax.numpy as jnp
    import vdp_min_time as mt

    umax = jnp.linspace(0.8, 2.0, 4)
    z, fn, args = mt.solve_grid(umax)
    # every lane of the grid converged in the one batch
    assert bool(jnp.all(fn < 1e-8)), np.asarray(fn)
    tf = np.asarray(z[:, 2])
    # more control authority is strictly faster, and tF is sane
    assert np.all(np.diff(tf) < 0.0), tf
    assert np.all(tf > 0.2) and np.all(tf < 10.0)

    # the transversality residual really encodes min-time: H ≈ 0 at tF AND
    # (autonomous flow) all along the trajectory
    from janus_tpu.solve import Options
    from janus_tpu.solve.radau import solve_radau

    m = umax.shape[0]
    y0 = jnp.concatenate([jnp.tile(mt.X0[None], (m, 1)), z[:, :2]], axis=-1)
    opts = Options(rtol=1e-9, atol=1e-12)
    for frac in (0.3, 0.7, 1.0):
        sol = solve_radau(mt.pmp_rhs, 0.0, z[:, 2] * frac, y0, args=args,
                          options=opts)
        h = np.asarray(mt.hamiltonian(sol.y, args))
        np.testing.assert_allclose(h, 0.0, atol=5e-5,
                                   err_msg=f"H at {frac} tF")
    # terminal state reaches the origin
    solT = solve_radau(mt.pmp_rhs, 0.0, z[:, 2], y0, args=args, options=opts)
    np.testing.assert_allclose(np.asarray(solT.y[:, :2]), 0.0, atol=1e-7)
    # near-bang-bang control at the final smoothing eps: |u| ≈ umax away
    # from switches for the strongest-control lane
    u = -np.asarray(umax)[:, None] * np.tanh(
        np.asarray(solT.y[:, 3:4]) / float(args[2]))
    assert np.all(np.abs(u) <= np.asarray(umax)[:, None] + 1e-9)
