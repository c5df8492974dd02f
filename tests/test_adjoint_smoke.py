"""FAST-tier reverse-mode smokes: one tiny gradient per adjoint family.

The full adjoint suites (test_adjoint*.py) are slow-marked — they compile
many large custom-vjp programs — so without this file a quick
``pytest -m "not slow"`` run would exercise ZERO reverse mode. Each test
here is deliberately minimal: M=2 lanes, a short mildly-stiff VdP span,
loose tolerances, finiteness + ONE central-FD spot check of a parameter
gradient (loose band — the sharp oracles live in the slow tier).
"""

import jax
import jax.numpy as jnp
import pytest

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options, solve_adjoint


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    yield
    jax.clear_caches()


_Y0 = jnp.array([[2.0, 0.0], [1.5, 0.5]])
_MU = jnp.array([2.0, 8.0])
_TF = 1.0


def _loss(method, opts):
    def loss(mu):
        y = solve_adjoint(vdp_rhs, (0.0, _TF), _Y0, method=method,
                          args=mu, options=opts)
        return jnp.sum(y ** 2)
    return loss


@pytest.mark.parametrize("method", ["radau", "rodas", "bdf", "dopri5",
                                    "seulex", "radaup"])
def test_adjoint_family_smoke(method):
    opts = Options(rtol=1e-5, atol=1e-8, adjoint_steps=256, max_steps=1024)
    loss = _loss(method, opts)
    g = jax.grad(loss)(_MU)
    assert g.shape == _MU.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-4
    fd = (loss(_MU.at[1].add(eps)) - loss(_MU.at[1].add(-eps))) / (2 * eps)
    # loose: frozen-mesh / continuous-adjoint vs FD at rtol 1e-5
    assert abs(g[1] - fd) <= 2e-2 * max(abs(fd), 1e-3)
