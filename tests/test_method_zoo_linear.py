"""Cross-method consistency on random stiff linear systems.

Property-style oracle sweep (SURVEY §4's matched-tolerance convention,
generalized): y' = A y with A = Q Λ Qᵀ, Λ random log-spaced NEGATIVE
eigenvalues spanning ~4 decades (stiffness ratio ~1e4), Q a random
orthogonal matrix — the analytic solution is y(T) = Q e^{ΛT} Qᵀ y0, so
every method is checked against exact math, not against another solver.
Each implicit family must hit the terminal state to a tolerance-scaled
error on every lane; explicit dopri gets the mildly stiff subset.

This guards the whole dispatcher surface at once: a controller or
linear-solve regression in ANY family shows up as a batch-lane miss here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from janus_tpu.solve import solve_ivp, Options, SUCCESS

SEED = 20260818
D = 4
M = 6
TF = 2.0


def _random_problems():
    rng = np.random.default_rng(SEED)
    As, y0s, yTs = [], [], []
    for _ in range(M):
        # orthogonal Q via QR; eigenvalues -10^{-1..3} (ratio 1e4)
        q, _ = np.linalg.qr(rng.standard_normal((D, D)))
        lam = -np.power(10.0, rng.uniform(-1.0, 3.0, D))
        As.append((q * lam) @ q.T)
        y0 = rng.standard_normal(D)
        y0s.append(y0)
        yTs.append((q * np.exp(lam * TF)) @ q.T @ y0)
    return (jnp.asarray(np.stack(As)), jnp.asarray(np.stack(y0s)),
            np.stack(yTs))


A_ALL, Y0_ALL, YT_ALL = _random_problems()


def _rhs(t, y, args):
    return jnp.einsum("mij,mj->mi", args, y)


IMPLICIT = ["radau", "radau9", "radaup", "bdf", "bdf2", "seulex", "rodas",
            "grk4t"]


@pytest.mark.parametrize("method", IMPLICIT)
def test_linear_stiff_sweep(method):
    sol = solve_ivp(_rhs, (0.0, TF), Y0_ALL, args=A_ALL, method=method,
                    options=Options(rtol=1e-8, atol=1e-11))
    assert bool(jnp.all(sol.status == SUCCESS)), np.asarray(sol.status)
    # terminal values decay to ~|y0|·e^{λ_min T}; errors accumulate at
    # O(rtol · nsteps) — 1e-5 abs on unit-scale data is ~3 decades of slack
    np.testing.assert_allclose(np.asarray(sol.y), YT_ALL,
                               rtol=1e-5, atol=1e-7,
                               err_msg=f"method={method}")


@pytest.mark.parametrize("method", ["dopri5", "dopri853"])
def test_linear_mild_sweep_explicit(method):
    # restrict the spectrum to ~[-10, 0): explicit methods shouldn't be
    # asked to win a stiffness fight, only to be correct
    rng = np.random.default_rng(SEED + 1)
    As, y0s, yTs = [], [], []
    for _ in range(M):
        q, _ = np.linalg.qr(rng.standard_normal((D, D)))
        lam = -np.power(10.0, rng.uniform(-1.0, 1.0, D))
        As.append((q * lam) @ q.T)
        y0 = rng.standard_normal(D)
        y0s.append(y0)
        yTs.append((q * np.exp(lam * TF)) @ q.T @ y0)
    sol = solve_ivp(_rhs, (0.0, TF), jnp.asarray(np.stack(y0s)),
                    args=jnp.asarray(np.stack(As)), method=method,
                    options=Options(rtol=1e-9, atol=1e-12))
    assert bool(jnp.all(sol.status == SUCCESS))
    np.testing.assert_allclose(np.asarray(sol.y), np.stack(yTs),
                               rtol=1e-6, atol=1e-8,
                               err_msg=f"method={method}")
