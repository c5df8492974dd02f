"""On-chip throughput of the round-4 discrete adjoints: SEULEX, dopri, NDF.

Two workloads, each timed as one full (y0, mu) jax.grad evaluation
(axon-relay rules: chained evals in one jit, inputs perturbed, gradients
folded into the carry so XLA cannot DCE the backward sweep, marginal cost
between two chain lengths, best-of-4):

- STIFF: 8192 heterogeneous-mu VdP lanes (mu 10^1.5..10^3), rtol 1e-4 f32
  pivot-free, TF=1 — seulex_adjoint AND ndf_adjoint vs the rodas discrete
  adjoint at the identical config (rodas_adjoint_chip.py measured 3.18
  ms/grad). SEULEX pays (a) _force_jac recording (fresh J per step) and
  (b) a backward replay that re-runs the whole extrapolation ladder per
  step, so it is expected to trail rodas; the experiment quantifies by how
  much, with seulex_kmax=5 bounding the compiled ladder depth (the adjoint
  docstring's guidance — every level compiles one replay per backward
  step). NDF pays one fresh-J transposed LU per backward step plus the
  difference-ARRAY cotangent algebra (8 slots instead of a y vector).
- NONSTIFF (the neural-ODE shape): 8192 soft-mu VdP lanes (mu 0.3..3),
  TF=4, rtol 1e-6 f32 — dopri_adjoint(dopri5): explicit cascade replays,
  no factorizations anywhere.

Run from /root/repo as `python - < experiments/adjoint_families_chip.py`.

MEASURED (TPU v5e-1, f32, 2026-08-19, best-of-4 marginals, n=2 vs 8):
  STIFF 8192 lanes rtol 1e-4 TF=1 (adjoint_steps=128):
    primal seulex           1.79 ms/solve
    seulex discrete adjoint 20.34 ms/grad = 0.40M traj-grads/s
    (rodas same config: 3.18 ms/grad — prefer rodas_adjoint for stiff
     training loops; seulex_adjoint's value is matching seulex FORWARD
     solves exactly, e.g. inside seulex-based fitting pipelines)
  NONSTIFF 8192 lanes rtol 1e-6 TF=4 (adjoint_steps=256):
    primal dopri5           1.54 ms/solve
    dopri5 discrete adjoint 5.73 ms/grad = 1.43M traj-grads/s
    grad multiple over primal 3.7x (explicit replay, no factorizations);
    gradients agree with the radau continuous adjoint to 3e-4 relative.
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
from janus_tpu.solve.adjoint_dopri import dopri_adjoint
from janus_tpu.solve.adjoint_ndf import ndf_adjoint
from janus_tpu.solve.adjoint_seulex import seulex_adjoint
from janus_tpu.solve.dopri import TABLEAUS, solve_erk
from janus_tpu.solve.ndf import solve_bdf
from janus_tpu.solve.seulex import solve_seulex

M = 8192
y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))

# stiff workload (the rodas_adjoint_chip.py config)
TF_S = 1.0
OPTS_S = Options(rtol=1e-4, atol=1e-7, pivoting=False, adjoint_steps=128,
                 seulex_kmax=5)
mus_s = jnp.logspace(1.5, 3.0, M).astype(jnp.float32)

# nonstiff workload (neural-ODE shape)
TF_N = 4.0
OPTS_N = Options(rtol=1e-6, atol=1e-9, adjoint_steps=256)
mus_n = jnp.logspace(np.log10(0.3), np.log10(3.0), M).astype(jnp.float32)


def primal_seulex(z):
    s = solve_seulex(vdp_rhs, jnp.zeros(M), jnp.full(M, TF_S), z, mus_s,
                     OPTS_S, jac=vdp_jac)
    return s.y[:, 0]


def grad_seulex(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(seulex_adjoint(
            vdp_rhs, (0.0, TF_S), zz, args=mm, options=OPTS_S,
            jac=vdp_jac) ** 2),
        argnums=(0, 1))(z, mus_s)
    return g_y0[:, 0] + g_mu


def primal_ndf(z):
    s = solve_bdf(vdp_rhs, jnp.zeros(M), jnp.full(M, TF_S), z, mus_s,
                  OPTS_S, jac=vdp_jac)
    return s.y[:, 0]


def grad_ndf(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(ndf_adjoint(
            vdp_rhs, (0.0, TF_S), zz, args=mm, options=OPTS_S,
            jac=vdp_jac) ** 2),
        argnums=(0, 1))(z, mus_s)
    return g_y0[:, 0] + g_mu


def primal_dopri(z):
    s = solve_erk(TABLEAUS["dopri5"], vdp_rhs, jnp.zeros(M),
                  jnp.full(M, TF_N), z, mus_n, OPTS_N)
    return s.y[:, 0]


def grad_dopri(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(dopri_adjoint(
            vdp_rhs, (0.0, TF_N), zz, args=mm, options=OPTS_N) ** 2),
        argnums=(0, 1))(z, mus_n)
    return g_y0[:, 0] + g_mu


def grad_radau_nonstiff(z):
    g_y0, g_mu = jax.grad(
        lambda zz, mm: jnp.sum(radau_adjoint(
            vdp_rhs, (0.0, TF_N), zz, args=mm, options=OPTS_N,
            jac=vdp_jac) ** 2),
        argnums=(0, 1))(z, mus_n)
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

    gs = np.asarray(grad_seulex(y0))
    print("seulex grad finite:", bool(np.all(np.isfinite(gs))))
    gd = np.asarray(grad_dopri(y0))
    gr = np.asarray(grad_radau_nonstiff(y0))
    print("dopri grad finite:", bool(np.all(np.isfinite(gd))))
    rel = np.max(np.abs(gd - gr) / np.maximum(np.abs(gr), 1e-3))
    print(f"dopri-vs-radau (nonstiff) gradient rel diff: {rel:.2e}")

    gn = np.asarray(grad_ndf(y0))
    print("ndf grad finite:", bool(np.all(np.isfinite(gn))))

    ps = marginal_ms(primal_seulex)
    ds = marginal_ms(grad_seulex)
    print(f"primal seulex            {ps:8.2f} ms/solve")
    print(f"seulex discrete adjoint  {ds:8.2f} ms/grad  "
          f"{M / ds * 1e3:12.0f} traj-grads/s  ({ds / ps:.2f}x primal)")

    pn = marginal_ms(primal_ndf)
    dn = marginal_ms(grad_ndf)
    print(f"primal ndf               {pn:8.2f} ms/solve")
    print(f"ndf discrete adjoint     {dn:8.2f} ms/grad  "
          f"{M / dn * 1e3:12.0f} traj-grads/s  ({dn / pn:.2f}x primal)")

    pd = marginal_ms(primal_dopri)
    dd = marginal_ms(grad_dopri)
    print(f"primal dopri5            {pd:8.2f} ms/solve")
    print(f"dopri5 discrete adjoint  {dd:8.2f} ms/grad  "
          f"{M / dd * 1e3:12.0f} traj-grads/s  ({dd / pd:.2f}x primal)")


if __name__ == "__main__":
    main()
