"""Fused one-kernel SoA Radau5 vs the lockstep driver (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options
from janus_tpu.solve.radau import solve_radau
from janus_tpu.solve.radau_fused import solve_radau_fused


def test_fused_matches_lockstep_heterogeneous():
    m = 64
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.linspace(5.0, 1000.0, m)
    opts = Options(rtol=1e-6, atol=1e-9, pivoting=False)
    ref = solve_radau(vdp_rhs, 0.0, 1.0, y0, args=mus, options=opts)
    fus = solve_radau_fused(vdp_rhs, 0.0, 1.0, y0, args=mus, options=opts,
                            tile=64, interpret=True)
    assert bool(jnp.all(fus.status == 1))
    np.testing.assert_allclose(fus.y, ref.y, rtol=1e-6, atol=1e-9)
    # same order of work (fresh-jac policy changes counts slightly)
    assert abs(int(fus.stats["nsteps"][0]) - int(ref.stats["nsteps"][0])) < 10


def test_fused_nonmultiple_tile_padding():
    m = 37                       # not a multiple of the tile
    y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (m, 1))
    mus = jnp.full((m,), 50.0)
    opts = Options(rtol=1e-7, atol=1e-10)
    fus = solve_radau_fused(vdp_rhs, 0.0, 2.0, y0, args=mus, options=opts,
                            tile=16, interpret=True)
    ref = solve_radau(vdp_rhs, 0.0, 2.0, y0, args=mus, options=opts)
    assert bool(jnp.all(fus.status == 1))
    np.testing.assert_allclose(fus.y, ref.y, rtol=1e-6, atol=1e-9)


def test_fused_scalar_args():
    y0 = jnp.array([[2.0, 0.0]])
    opts = Options(rtol=1e-7, atol=1e-10)
    fus = solve_radau_fused(vdp_rhs, 0.0, 1.0, y0, args=100.0, options=opts,
                            tile=8, interpret=True)
    ref = solve_radau(vdp_rhs, 0.0, 1.0, y0, args=100.0, options=opts)
    np.testing.assert_allclose(fus.y, ref.y, rtol=1e-6, atol=1e-9)
