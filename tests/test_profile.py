"""Profiler hooks (SURVEY §5 jax.profiler integration plan)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu import diag
from janus_tpu.solve import Options, solve_ivp


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "jtrace")

    def rhs(t, y, args):
        return -y

    with diag.trace(logdir):
        sol = solve_ivp(rhs, (0.0, 1.0), jnp.ones((4, 2)), method="dopri5",
                        options=Options(rtol=1e-6, atol=1e-9))
        np.asarray(sol.y)
    hits = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
    assert hits, f"no xplane written under {logdir}"


def test_annotate_and_scope_are_transparent():
    with diag.annotate("outer"):
        with diag.scope("inner"):
            x = jnp.arange(4.0) * 2.0
    np.testing.assert_allclose(np.asarray(x), [0.0, 2.0, 4.0, 6.0])

    @jax.jit
    def f(v):
        with diag.scope("phase"):
            return v * v

    np.testing.assert_allclose(np.asarray(f(jnp.array(3.0))), 9.0)


def test_device_memory_stats_shape():
    stats = diag.device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on some backends


def test_marginal_seconds_positive():
    def make_chained(n):
        @jax.jit
        def run(x):
            def body(i, c):
                return jnp.sin(c) + x * 1e-6
            return jax.lax.fori_loop(0, n * 200, body, x)
        return run

    dt = diag.marginal_seconds(make_chained, jnp.ones((256,)),
                               n_lo=1, n_hi=4)
    assert dt > 0.0
