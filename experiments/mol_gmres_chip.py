"""Chip timing: large-D MOL radau — GMRES depth and the direct tridiag mode.

D=128 Fisher-KPP line, M=1024 lanes, rtol 1e-4 f32 (chip conventions:
chained solves in one jit, perturbed inputs, marginal cost between chain
lengths). Sweeps the three reachable stage-solver configs.

MEASURED (TPU v5e-1, 2026-08-19):
- gmres_iters=20 + Thomas-scan preconditioner (the pre-PCR code): 172.1
  ms/solve, compile 234 s. [no longer reachable: PCR replaced Thomas on
  TPU -- kept for the record]
- gmres_iters=20 + PCR (parallel cyclic reduction, 7 vectorized
  elimination sweeps instead of 256 sequential scan steps): 48.6 ms/solve,
  compile 167 s -> 3.54x.
- gmres_iters=3 + PCR (the preconditioner is EXACT for this 3-point
  stencil, so 20 Arnoldi steps were waste): 6.94 ms/solve, same accuracy
  (7.6e-8 vs scipy rtol 1e-8 oracle).
- stage_solver='tridiag' (DIRECT PCR solve of the tridiagonal stage
  operator, no Krylov at all -- modified Newton): 3.02 ms/solve, err
  9.9e-8, naccept 11-18. 57x the round-start configuration; ~330k
  MOL-line solves/sec/chip at D=128.
The sequential depth was the cost: every GMRES iteration applies the
preconditioner once, so the stage solve's critical path was O(N) tiny
steps; PCR collapses it to O(log N) VPU sweeps. The solver dispatches by
backend at trace time (PCR on TPU, Thomas on CPU where the ~8x FLOP
multiplier loses; linalg/gmres.py tridiag_solve_auto).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from janus_tpu.solve import Options, SUCCESS
from janus_tpu.solve.radau import solve_radau

D = 128
DX = 1.0 / (D + 1)
M = 1024
XG = np.linspace(DX, 1.0 - DX, D)


def rhs(t, y, args):
    nu, r = args
    left = jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(y[:, 1:], ((0, 0), (0, 1)))
    lap = (left - 2 * y + right) / DX ** 2
    return nu * lap + r * y * (1.0 - y)


def main():
    y0 = jnp.tile(jnp.asarray(np.exp(-100 * (XG - 0.3) ** 2),
                              jnp.float32)[None], (M, 1))
    rates = jnp.linspace(1.0, 8.0, M, dtype=jnp.float32)[:, None]

    from scipy.integrate import solve_ivp as ssolve

    def fref(t, y, r):
        lap = np.empty_like(y)
        lap[0] = (y[1] - 2 * y[0]) / DX ** 2
        lap[-1] = (y[-2] - 2 * y[-1]) / DX ** 2
        lap[1:-1] = (y[:-2] - 2 * y[1:-1] + y[2:]) / DX ** 2
        return 0.01 * lap + r * y * (1 - y)

    ref = ssolve(lambda t, y: fref(t, y, float(rates[0, 0])), (0, 0.4),
                 np.asarray(y0[0], np.float64), method="Radau",
                 rtol=1e-8, atol=1e-11)

    for label, opts in [
        ("gmres(20)", Options(rtol=1e-4, atol=1e-7, stage_solver="gmres",
                              gmres_iters=20, pivoting=False)),
        ("gmres(3)", Options(rtol=1e-4, atol=1e-7, stage_solver="gmres",
                             gmres_iters=3, pivoting=False)),
        ("tridiag", Options(rtol=1e-4, atol=1e-7, stage_solver="tridiag",
                            pivoting=False)),
    ]:
        def chain(z, n):
            def one(c, _):
                s = solve_radau(rhs, 0.0, 0.4, c, args=(0.01, rates),
                                options=opts)
                return s.y * 0.999 + z * 0.001, s.status
            return jax.lax.scan(one, z, None, length=n)

        f1 = jax.jit(lambda z: chain(z, 1))
        f3 = jax.jit(lambda z: chain(z, 3))
        t0 = time.time()
        o1, s1 = f1(y0)
        np.asarray(o1)
        compile_s = time.time() - t0
        np.asarray(f3(y0 + 1e-6)[0])
        sol = jax.jit(lambda z: solve_radau(
            rhs, 0.0, 0.4, z, args=(0.01, rates), options=opts).y)(y0)
        err = float(np.max(np.abs(np.asarray(sol[0]) - ref.y[:, -1])))
        best = np.inf
        for it in range(3):
            z = y0 + 1e-5 * it
            t0 = time.time(); np.asarray(f1(z)[0]); t1 = time.time() - t0
            t0 = time.time(); np.asarray(f3(z)[0]); t3 = time.time() - t0
            best = min(best, (t3 - t1) / 2)
        ok = bool(jnp.all(s1 == SUCCESS))
        print(f"{label}: {best*1e3:.2f} ms/solve  ok={ok} "
              f"err_vs_scipy={err:.2e}  compile={compile_s:.0f}s")


if __name__ == "__main__":
    main()
