"""Native C++ oracle + dataset IO: build, cross-implementation consistency.

The oracle pattern mirrors the reference's use of Fortran RODAS / scipy as
independent implementations (SURVEY §2.4/§4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu import native
from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import solve_ivp


def test_native_builds_and_solves_vdp():
    y, stats = native.radau5_cpu(native.RHS_VDP, 0.0, 2.0, [2.0, 0.0],
                                 [1000.0], rtol=1e-8, atol=1e-11)
    from scipy.integrate import solve_ivp as ss
    ref = ss(lambda t, yy: [yy[1], 1000.0 * (1 - yy[0] ** 2) * yy[1] - yy[0]],
             (0.0, 2.0), [2.0, 0.0], method="Radau", rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(y, ref.y[:, -1], rtol=1e-6, atol=1e-8)
    assert stats["naccept"] > 0 and stats["nfev"] > stats["naccept"]


def test_native_vs_jax_solver_consistency():
    """Three independent implementations (native C++, JAX batched, scipy)
    agree on a stiff solve — the reference's A/B verification pattern."""
    mu = 100.0
    ynat, _ = native.radau5_cpu(native.RHS_VDP, 0.0, 5.0, [2.0, 0.0], [mu],
                                rtol=1e-9, atol=1e-12)
    sol = solve_ivp(vdp_rhs, (0.0, 5.0), jnp.array([[2.0, 0.0]]),
                    method="radau", args=mu, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(sol.y[0], ynat, rtol=1e-6, atol=1e-8)


def test_traj_io_roundtrip(tmp_path):
    data = np.random.default_rng(0).standard_normal((64, 7))
    path = tmp_path / "ds.jtrj"
    native.traj_write(path, data)
    back = native.traj_read(path)
    np.testing.assert_array_equal(back, data)


def test_traj_io_rejects_garbage(tmp_path):
    p = tmp_path / "bad.jtrj"
    p.write_bytes(b"not a dataset")
    with pytest.raises(RuntimeError):
        native.traj_read(p)
