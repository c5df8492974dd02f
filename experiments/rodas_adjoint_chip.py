"""On-chip throughput of the RODAS discrete adjoint (full (y0, mu) gradient).

8192 heterogeneous-mu Van der Pol lanes, rtol 1e-4 f32 pivot-free (the
chip_matrix.py convention), loss = sum(y(T)^2). Times one jax.grad
evaluation via rodas_adjoint (solve/adjoint_rodas.py: forward solve with
mesh recording + backward lax.scan of per-step vjp replays) and, for
context, the primal solve and the radau continuous adjoint at the same
config (its round-3 chip reading: 15.3 ms at rtol 1e-4 over [0, 1]... note
that used adjoint_steps=128; this script re-times it in-process so the
comparison shares a host/tunnel state).

Axon-relay timing rules (CLAUDE.md): n evals chained in one jit, inputs
perturbed per iteration, gradients folded into the carry so XLA cannot
dead-code-eliminate the backward sweep, marginal cost between two n values.

MEASURED (TPU v5e-1, f32, 2026-08-19, 8192 lanes, rtol 1e-4, TF=1.0,
adjoint_steps=128, best-of-4 marginals):
  primal rodas              0.71 ms/solve
  rodas discrete adjoint    3.18 ms/gradient  = 2.6M traj-grads/s
  radau continuous adjoint  12.83 ms/gradient = 0.64M traj-grads/s
The discrete adjoint's backward replay is direct (no Newton iteration to
transpose), so the full-gradient multiple over its primal is ~4.5x while
radau's continuous adjoint pays ~2.7x over ITS slower primal — net 4.0x
faster end-to-end at this config. Gradients cross-checked finite and
radau-vs-rodas consistent to ~2e-3 relative (two different O(rtol)
conventions at rtol 1e-4).
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
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.adjoint_rodas import rodas_adjoint
from janus_tpu.solve.rodas import solve_rodas

M = 8192
TF = 1.0
OPTS = Options(rtol=1e-4, atol=1e-7, pivoting=False, adjoint_steps=128)

y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))
mus = jnp.logspace(1.5, 3.0, M).astype(jnp.float32)


def primal(z):
    s = solve_rodas(vdp_rhs, 0.0, TF, z, args=mus, options=OPTS, jac=vdp_jac)
    return s.y[:, 0]


def grad_rodas(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(rodas_adjoint(
            vdp_rhs, (0.0, TF), zz, args=mm, options=OPTS,
            jac=vdp_jac) ** 2),
        argnums=(0, 1))(z, mus)
    return g_y0[:, 0] + g_mu


def grad_radau(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(radau_adjoint(
            vdp_rhs, (0.0, TF), zz, args=mm, options=OPTS,
            jac=vdp_jac) ** 2),
        argnums=(0, 1))(z, mus)
    return g_y0[:, 0] + g_mu


def chained(step, z, n):
    def body(i, carry):
        return step(z + carry[:, None] * 1e-9)
    return jax.lax.fori_loop(0, n, body, z[:, 0])


def marginal_ms(step, n_lo=2, n_hi=8):
    lo = jax.jit(chained, static_argnums=(0, 2))
    t = {}
    for n in (n_lo, n_hi):
        np.asarray(lo(step, y0, n))                    # compile+warm
        best = np.inf
        for r in range(4):
            z = y0 + (r + 1) * 1e-7
            t0 = time.perf_counter()
            np.asarray(lo(step, z, n))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def main():
    print("backend:", jax.default_backend())
    gr = np.asarray(grad_rodas(y0))
    ga = np.asarray(grad_radau(y0))
    print("rodas grad finite:", bool(np.all(np.isfinite(gr))),
          " radau grad finite:", bool(np.all(np.isfinite(ga))))
    rel = np.max(np.abs(gr - ga) / np.maximum(np.abs(ga), 1e-3))
    print(f"rodas-vs-radau gradient rel diff: {rel:.2e}")

    p_ms = marginal_ms(primal)
    d_ms = marginal_ms(grad_rodas)
    c_ms = marginal_ms(grad_radau)
    print(f"primal rodas            {p_ms:8.2f} ms/solve")
    print(f"rodas discrete adjoint  {d_ms:8.2f} ms/grad  "
          f"{M / d_ms * 1e3:12.0f} traj-grads/s")
    print(f"radau continuous adj    {c_ms:8.2f} ms/grad  "
          f"{M / c_ms * 1e3:12.0f} traj-grads/s")
    print(f"discrete/continuous: {c_ms / d_ms:.2f}x; "
          f"grad multiple over rodas primal: {d_ms / p_ms:.2f}x")


if __name__ == "__main__":
    main()
