"""Reverse-time integration (the reference's PosNeg mechanism).

Reference analog: radaute_example_reverse.cpp / radauted_example_reverse.cpp
negate the dynamics and Jacobian by hand and set PosNeg; here the solvers
accept tf < t0 directly (signed h throughout), so backward costate sweeps —
the PMP use case — need no problem rewriting.

Demo: integrate the damped oscillator forward 0→T, then run time BACKWARD
T→0 from the endpoint and recover the initial state to solver tolerance.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.solve import Options, solve_ivp

jax.config.update("jax_enable_x64", True)


def rhs(t, y, args):
    q, v = y[..., 0], y[..., 1]
    return jnp.stack([v, -q - 0.15 * v], axis=-1)


def main():
    T = 6.0
    y0 = jnp.array([[1.0, 0.0], [0.3, -0.4], [2.0, 1.0]])
    opts = Options(rtol=1e-10, atol=1e-12)

    fwd = solve_ivp(rhs, (0.0, T), y0, method="radau", options=opts)
    assert bool(jnp.all(fwd.success))

    bwd = solve_ivp(rhs, (T, 0.0), fwd.y, method="radau", options=opts)
    assert bool(jnp.all(bwd.success))

    err = float(jnp.max(jnp.abs(bwd.y - y0)))
    print(f"forward endpoint:  {np.asarray(fwd.y[0])}")
    print(f"roundtrip error:   {err:.2e}  (tolerance-level)")
    assert err < 1e-7
    # stiff solvers are not the only ones: dopri853 backward too
    bwd8 = solve_ivp(rhs, (T, 0.0), fwd.y, method="dopri853", options=opts)
    print(f"dopri853 backward: {float(jnp.max(jnp.abs(bwd8.y - y0))):.2e}")


if __name__ == "__main__":
    main()
