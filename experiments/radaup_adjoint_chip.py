"""Chip timing: reverse mode on the VARIABLE-ORDER radau ladder.

solve_adjoint(method='radaup') = the continuous radau adjoint over the
variable-order forward solve (round-5: the forward records its per-lane
order ladder in the mesh; the backward sweep integrates the linear adjoint
ODE at the ladder's top order on the recorded mesh — solve/adjoint.py
vo_orders). This times one full (y0, mu) gradient at the chip_matrix
convention (heterogeneous-mu VdP, rtol 1e-4 f32 pivot-free) against the
fixed-stage radau adjoint on the same problem, batch scaled to M=1024
(the VO adjoint compile at M=8192 exceeds the experiment budget).

Axon-relay rules (CLAUDE.md): chained evals in one jit, inputs perturbed,
gradients folded into the carry, marginal cost between two chain lengths,
best-of-3.

Run from /root/repo as `python - < experiments/radaup_adjoint_chip.py`.

MEASURED (TPU v5e-1, f32, 2026-08-20, M=1024, rtol 1e-4, TF=1,
adjoint_steps=128, marginal n=1 vs 4, best-of-3):
  radaup (VO 1..7, f32-capped 1..5) adjoint   6.46 ms/grad
  fixed radau s=3 adjoint                     4.19 ms/grad
  gradients cross-agree (both are the same continuous adjoint on
  different forward meshes): max rel diff 9.2e-5 at rtol 1e-4.
The VO premium (~1.5x) tracks the forward ladder's premium
(experiments/radaup_chip.py: VO ~2x fixed) diluted by the backward sweep
running at ONE order — the ladder costs only where the forward ran.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from janus_tpu.models.problems import vdp_rhs
from janus_tpu.solve import Options, solve_adjoint

M, TF = 1024, 1.0
y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))
mus = jnp.logspace(1.5, 3.0, M).astype(jnp.float32)


def make_grad(method, opts):
    def gstep(z):
        g_y0, g_mu = jax.grad(
            lambda zz, mm: jnp.sum(solve_adjoint(
                vdp_rhs, (0.0, TF), zz, method=method, args=mm,
                options=opts) ** 2), argnums=(0, 1))(z, mus)
        return g_y0, g_mu
    return gstep


def marginal_ms(gstep, n_lo=1, n_hi=4):
    def chained(z, n):
        def body(i, carry):
            gz, gmu = gstep(z + carry[:, None] * 1e-9)
            return gz[:, 0] * 1e-9 + carry + gmu * 1e-12
        return jax.lax.fori_loop(0, n, body, z[:, 0])

    t = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(chained, static_argnums=1)
        np.asarray(fn(y0, n))
        best = np.inf
        for r in range(3):
            z = y0 + (r + 1) * 1e-7
            t0 = time.perf_counter()
            np.asarray(fn(z, n))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def main():
    print("backend:", jax.default_backend())
    opts_vo = Options(rtol=1e-4, atol=1e-7, pivoting=False,
                      adjoint_steps=128)
    opts_fx = Options(rtol=1e-4, atol=1e-7, pivoting=False,
                      adjoint_steps=128, min_stages=3, max_stages=3)
    g_vo = make_grad("radaup", opts_vo)
    g_fx = make_grad("radau", opts_fx)

    gv = np.asarray(jax.jit(g_vo)(y0)[1])
    gf = np.asarray(jax.jit(g_fx)(y0)[1])
    print("finite:", bool(np.all(np.isfinite(gv))),
          "rel diff vs fixed:",
          float(np.max(np.abs(gv - gf) / np.maximum(np.abs(gf), 1e-3))))
    print(f"radaup VO adjoint  {marginal_ms(g_vo):6.2f} ms/grad")
    print(f"fixed s=3 adjoint  {marginal_ms(g_fx):6.2f} ms/grad")


if __name__ == "__main__":
    main()
