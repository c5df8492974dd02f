"""Chip A/B: Options(pallas_lu=True) beyond radau — rodas, NDF, seulex.

VERDICT round-4 item 7: the radau precedent (experiments/pallas_lu_chip.py)
paid 1.27x end-to-end + 30x faster compiles, so the same fused SoA Pallas
factor/solve kernels are now wired behind the SAME option into
- rodas: the step's one E = M/(hγ) − J factor + 6 back-subs (+6/dir IND),
- bdf/NDF: the corrector (M − cJ) factor + per-iteration solves,
- seulex: one (M/h' − J) factor per ladder LEVEL + nseq[k] substep solves,
all pivot-free only (the kernel has no pivoting), jnp-dispatched off-TPU.

Config: the chip_matrix.py convention — 8192 heterogeneous-mu VdP lanes
(mu 10^1.5..10^3), rtol 1e-4 f32 pivot-free, TF=1. Axon-relay timing rules
(CLAUDE.md): chained solves in one jit, inputs perturbed per iteration,
marginal cost between two chain lengths, best-of-3; outputs consumed so XLA
cannot DCE anything.

Run from /root/repo as `python - < experiments/pallas_families_chip.py`.

MEASURED (TPU v5e-1, f32, 2026-08-20, marginal n=1 vs 6, best-of-3):
  rodas  primal     stock 0.524 ms  pallas 0.033 ms  -> "15.8x"  close=True
  rodas  K=2 IND    stock 1.309 ms  pallas 0.905 ms  -> 1.45x   close=True
  bdf    primal     stock 4.679 ms  pallas 4.113 ms  -> 1.14x   close=True
  seulex primal     stock 1.572 ms  pallas 0.900 ms  -> 1.75x   close=True
  rodas primal RECHECK (n=2 vs 8, fresh perturbations): stock 0.424 ms,
  pallas 0.060 ms — REPRODUCED, with identical mean naccept (15.3) and
  close final states both ways, so the work is real and equal; but the
  pallas chain's TOTAL wall barely grows with chain length (t2=26.9,
  t8=27.3 ms), i.e. the D=2 pallas step has fallen below the relay's
  per-call measurement floor. Honest claim: rodas primal >= the 1.45x
  the K=2 IND case (which CONTAINS the primal) shows; the exact primal
  multiple is unresolvable through the tunnel at this problem size.
  Verdict: WIRED for all three (strict win everywhere; biggest on seulex,
  whose ladder refactors at EVERY level). bench.py keeps the radau
  headline; the option is documented in Options.pallas_lu.
  IND tangents under pallas (vmapped _pallas_lu_solve over the K seed
  directions — vmap-over-Pallas) checked on chip for seulex AND bdf at
  M=2048: y and sens BIT-IDENTICAL to the stock pivot-free path (same
  elimination order, same f32 arithmetic at D=2).
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
from janus_tpu.solve.ndf import solve_bdf
from janus_tpu.solve.rodas import solve_rodas
from janus_tpu.solve.seulex import solve_seulex

M, TF = 8192, 1.0
y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))
mus = jnp.logspace(1.5, 3.0, M).astype(jnp.float32)
SEEDS = jnp.stack([jnp.zeros_like(y0).at[:, j].set(1.0) for j in range(2)])


def marginal_ms(step, n_lo=1, n_hi=6):
    def chained(z, n):
        def body(i, carry):
            return step(z + carry[:, None] * 1e-9)
        return jax.lax.fori_loop(0, n, body, z[:, 0])

    t = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(chained, static_argnums=1)
        np.asarray(fn(y0, n))                          # compile+warm
        best = np.inf
        for r in range(3):
            z = y0 + (r + 1) * 1e-7
            t0 = time.perf_counter()
            np.asarray(fn(z, n))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def run_case(name, make_step):
    out = {}
    ys = {}
    for pallas in (False, True):
        opts = Options(rtol=1e-4, atol=1e-7, pivoting=False,
                       pallas_lu=pallas)
        step = make_step(opts)
        ys[pallas] = np.asarray(jax.jit(step)(y0))
        out[pallas] = marginal_ms(step)
    eq = np.allclose(ys[False], ys[True], rtol=2e-4, atol=1e-5)
    speed = out[False] / out[True]
    print(f"{name:14s} stock {out[False]:7.3f} ms  pallas {out[True]:7.3f} "
          f"ms  -> {speed:4.2f}x  close={eq}")


def main():
    print("backend:", jax.default_backend())

    def rodas_primal(opts):
        def step(z):
            s = solve_rodas(vdp_rhs, 0.0, TF, z, mus, opts, jac=vdp_jac)
            return s.y[:, 0]
        return step

    def rodas_ind(opts):
        def step(z):
            s = solve_rodas(vdp_rhs, 0.0, TF, z, mus, opts, jac=vdp_jac,
                            tangents=SEEDS)
            return s.y[:, 0] + 1e-30 * (s.sens[0][:, 0] + s.sens[1][:, 0])
        return step

    def bdf_primal(opts):
        def step(z):
            s = solve_bdf(vdp_rhs, 0.0, TF, z, mus, opts, jac=vdp_jac)
            return s.y[:, 0]
        return step

    def seulex_primal(opts):
        def step(z):
            s = solve_seulex(vdp_rhs, 0.0, TF, z, mus, opts, jac=vdp_jac)
            return s.y[:, 0]
        return step

    run_case("rodas primal", rodas_primal)
    run_case("rodas K=2 IND", rodas_ind)
    run_case("bdf primal", bdf_primal)
    run_case("seulex primal", seulex_primal)


if __name__ == "__main__":
    main()
