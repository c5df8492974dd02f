"""Feature-matrix contract: every unsupported (method, feature) cell in
``solve.FEATURES`` must RAISE through the ``solve_ivp`` dispatcher — nothing
is silently dropped (the reference's single-entry-point role,
odesolvers/common_integrator.py:21-33). The README matrix's dashes are
either inherent (explicit methods take no Jacobian) or legacy rows (bdf2 /
grk4t, kept as cross-check integrators and subsumed by bdf / rodas) — this
file is the executable form of that table.
"""

import jax.numpy as jnp
import pytest

from janus_tpu.solve import FEATURES, solve_ivp
from janus_tpu.solve.events import Event


def _rhs(t, y, args):
    return -y


_JAC = lambda t, y, args: -jnp.eye(2)[None].repeat(y.shape[0], 0)  # noqa
_MASS = jnp.eye(2)
_EV = Event(lambda t, y, a: y[..., 0] - 0.5, terminal=True)
_TS = jnp.array([0.5, 1.0])

_KW = {
    "jac": {"jac": _JAC},
    "mass": {"mass": _MASS},
    "events": {"events": _EV},
    "t_eval": {"t_eval": _TS},
}

_CASES = [
    (method, feat)
    for method, sup in FEATURES.items()
    for feat, ok in zip(("jac", "mass", "events", "t_eval"), sup)
    if not ok
]


@pytest.mark.parametrize("method,feat", _CASES,
                         ids=[f"{m}-{f}" for m, f in _CASES])
def test_unsupported_feature_raises(method, feat):
    y0 = jnp.ones((2, 2))
    with pytest.raises(ValueError):
        solve_ivp(_rhs, (0.0, 1.0), y0, method=method, **_KW[feat])
