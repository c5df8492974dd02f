"""On-chip throughput of the first-class RODAS4 IND tangents.

Compares, at 8192 heterogeneous-mu Van der Pol lanes (rtol 1e-4, f32,
pivot-free — the chip_matrix.py convention):

  1. primal rodas solve;
  2. rodas + K=2 IND directions (solve_rodas(tangents=): direct tangent
     back-substitutions on each step's factored E, exact dJ[delta]*k_i);
  3. the same 2 sensitivity directions by the vmapped-jvp transform
     (what dual_solve_ivp falls back to without the fast path).

Axon-relay timing rules (CLAUDE.md): n solves chained in one jit, inputs
perturbed per iteration, sensitivities folded into the carry so XLA cannot
dead-code-eliminate the tangent work, marginal cost between two n values.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options, SUCCESS
from janus_tpu.solve.rodas import solve_rodas

M = 8192
TF = 1.0
OPTS = Options(rtol=1e-4, atol=1e-7, pivoting=False)

y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))
mus = jnp.logspace(1.5, 3.0, M).astype(jnp.float32)
seeds = jnp.stack([jnp.zeros_like(y0).at[:, j].set(1.0) for j in range(2)])


def primal(z):
    s = solve_rodas(vdp_rhs, 0.0, TF, z, args=mus, options=OPTS, jac=vdp_jac)
    return s.y[:, 0], s.status


def ind(z):
    s = solve_rodas(vdp_rhs, 0.0, TF, z, args=mus, options=OPTS, jac=vdp_jac,
                    tangents=seeds)
    return (s.y[:, 0] + 1e-30 * (s.sens[0][:, 0] + s.sens[1][:, 0]),
            s.status)


def jvp_transform(z):
    def fin(zz):
        return solve_rodas(vdp_rhs, 0.0, TF, zz, args=mus, options=OPTS,
                           jac=vdp_jac).y

    outs = [jax.jvp(fin, (z,), (seeds[k],))[1] for k in range(2)]
    st = solve_rodas(vdp_rhs, 0.0, TF, z, args=mus, options=OPTS,
                     jac=vdp_jac).status
    return (fin(z)[:, 0] + 1e-30 * (outs[0][:, 0] + outs[1][:, 0]), st)


def chained(step, z, n):
    def body(i, carry):
        out, _ = step(z + carry[:, None] * 1e-9)
        return out
    return jax.lax.fori_loop(0, n, body, z[:, 0])


def marginal_ms(step, n_lo=2, n_hi=12):
    lo = jax.jit(chained, static_argnums=(0, 2))
    t = {}
    for n in (n_lo, n_hi):
        np.asarray(lo(step, y0, n))                    # compile+warm
        best = np.inf
        for r in range(4):
            z = y0 + (r + 1) * 1e-7   # perturb: identical repeats are
            t0 = time.perf_counter()  # cached upstream in the relay
            np.asarray(lo(step, z, n))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n_hi] - t[n_lo]) / (n_hi - n_lo) * 1e3


def main():
    print("backend:", jax.default_backend())
    st = np.asarray(primal(y0)[1])
    print("primal success:", float((st == SUCCESS).mean()))
    st = np.asarray(ind(y0)[1])
    print("ind success:", float((st == SUCCESS).mean()))

    p_ms = marginal_ms(primal)
    i_ms = marginal_ms(ind)
    j_ms = marginal_ms(jvp_transform)
    print(f"primal             {p_ms:8.2f} ms/solve  "
          f"{M / p_ms * 1e3:12.0f} traj/s")
    print(f"IND (K=2)          {i_ms:8.2f} ms/solve  "
          f"{M / i_ms * 1e3:12.0f} traj/s")
    print(f"jvp transform(K=2) {j_ms:8.2f} ms/solve  "
          f"{M / j_ms * 1e3:12.0f} traj/s")
    print(f"IND speedup over transform: {j_ms / i_ms:.2f}x; "
          f"tangent overhead vs primal: {i_ms / p_ms:.2f}x")


if __name__ == "__main__":
    main()
