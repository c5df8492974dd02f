"""Chip probe: where does the 1.5M-traj/s headline step spend its time?

VERDICT round-4 item 9: decompose the bench config (65k stiff VdP mu=1e3,
Radau9 f32 rtol 1e-6 compensated, pallas_lu, 2 IND directions) by switching
one ingredient off at a time and reading the marginal chained-solve cost:

  full bench config           -> the headline
  K=0 (no tangent sweep)      -> IND cost share
  compensated=False           -> double-word accumulation share
  AD jacobian (drop vdp_jac)  -> analytic-jac saving
  rtol 1e-4 (vs 1e-6)         -> tolerance/step-count share

Axon-relay rules (CLAUDE.md): marginal n=1 vs 6 chained, perturbed inputs,
sens folded into the carry, best-of-2.

Run from /root/repo as `python - < experiments/headline_probe_chip.py`.

MEASURED (TPU v5e-1, f32, 2026-08-20, marginal n=1 vs 6, best-of-2; a
concurrent CPU pytest adds ~10% host-dispatch noise — read deltas, not
digits):
  full bench config    38.54 ms/solve  (1.70M traj/s w/ 2 IND dirs)
  K=0 no tangents      35.44 ms        (tangent sweep = +8.7% for K=2)
  compensated=False    40.63 ms        (compensation is FREE within noise)
  AD jacobian          38.46 ms        (analytic jac a wash at D=2)
  rtol 1e-4            19.15 ms        (2x: step count is the whole game)
CONCLUSIONS: no single removable ingredient exceeds ~9% — the headline
cost is fundamental step-count x stage-solve work on the already-fused
Pallas path. The identified levers that remain are (a) fewer steps
(tolerance/order trades, already swept: Radau9 at rtol 1e-6 is the
optimum) and (b) fusing MORE of the step (transforms + tangent sweep)
into one kernel — the direction round-1's radau_fused A/B measured as a
7x LOSS. Parked: this is the measured ceiling of the lockstep design;
the bench headline stands at ~1.5-1.7M traj/s w/ sensitivities.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options
from janus_tpu.solve.radau import solve_radau

BATCH, MU, TF = 65536, 1000.0, 1.0
y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (BATCH, 1))
mus = jnp.full((BATCH,), MU, jnp.float32)
SEEDS = jnp.stack([jnp.zeros_like(y0).at[:, j].set(1.0) for j in range(2)])


def marginal_ms(step, n_lo=1, n_hi=6):
    def chained(z, n):
        def body(i, carry):
            return step(z + carry[:, None] * 1e-9)
        return jax.lax.fori_loop(0, n, body, z[:, 0])

    t = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(chained, static_argnums=1)
        np.asarray(fn(y0, n))
        best = np.inf
        for r in range(2):
            z = y0 + (r + 1) * 1e-7
            t0 = time.perf_counter()
            np.asarray(fn(z, n))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def case(label, opts, jac=vdp_jac, seeds=SEEDS):
    def step(z):
        s = solve_radau(vdp_rhs, 0.0, TF, z, mus, options=opts, jac=jac,
                        tangents=seeds)
        out = s.y[:, 0]
        if seeds is not None:
            out = out + 1e-30 * (s.sens[0][:, 0] + s.sens[1][:, 0])
        return out
    ms = marginal_ms(step)
    print(f"{label:22s} {ms:7.2f} ms/solve  ({BATCH / ms * 1e3 / 1e6:.2f}M "
          "traj/s)")


def main():
    print("backend:", jax.default_backend())
    base = Options(rtol=1e-6, atol=1e-9, pivoting=False, compensated=True,
                   min_stages=5, max_stages=5, pallas_lu=True)
    case("full bench config", base)
    case("K=0 no tangents", base, seeds=None)
    case("compensated=False", base.replace(compensated=False))
    case("AD jacobian", base, jac=None)
    case("rtol 1e-4", base.replace(rtol=1e-4, atol=1e-7))


if __name__ == "__main__":
    main()
