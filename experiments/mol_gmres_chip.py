"""Chip timing: gmres radau on a D=128 Fisher-KPP MOL line.

MEASURED (TPU v5e-1, f32, M=1024, D=128, rtol 1e-4, gmres_iters=20):
- Thomas-scan preconditioner (2 sequential length-128 lax.scans per
  application, [M]-wide steps): 172.1 ms/solve, compile 234 s.
- PARALLEL CYCLIC REDUCTION (tridiag_solve_pcr: 7 fully vectorized
  elimination sweeps over the whole [M, D] array): 48.6 ms/solve,
  compile 167 s -> 3.54x. Terminal state matches scipy Radau (rtol 1e-8
  oracle) to 3.5e-7.
- PCR + gmres_iters=3 (the preconditioner is EXACT for this 3-point
  stencil, so 20 Arnoldi steps were pure waste): 6.94 ms/solve, same
  accuracy (7.6e-8). iters 5/8: 8.0/10.2 ms.
- stage_solver='tridiag' (DIRECT PCR solve of the tridiagonal stage
  operator, no Krylov at all — modified Newton, exact here): 3.02
  ms/solve, err 9.9e-8, naccept 11-18. 57x the round-start Thomas@20
  configuration; ~330k MOL-line solves/sec/chip at D=128.
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

d = 128
dx = 1.0 / (d + 1)
xg = np.linspace(dx, 1.0 - dx, d)
m = 1024

def rhs(t, y, args):
    nu, r = args
    left = jnp.pad(y[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(y[:, 1:], ((0, 0), (0, 1)))
    lap = (left - 2 * y + right) / dx ** 2
    return nu * lap + r * y * (1.0 - y)

y0 = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2), jnp.float32)[None], (m, 1))
rates = jnp.linspace(1.0, 8.0, m, dtype=jnp.float32)[:, None]
opts = Options(rtol=1e-4, atol=1e-7, stage_solver="gmres", gmres_iters=20,
               pivoting=False)

def chain(z, n):
    def one(c, _):
        s = solve_radau(rhs, 0.0, 0.4, c, args=(0.01, rates), options=opts)
        return s.y * 0.999 + z * 0.001, s.status
        
    out, st = jax.lax.scan(one, z, None, length=n)
    return out, st

f1 = jax.jit(lambda z: chain(z, 1))
f3 = jax.jit(lambda z: chain(z, 3))
t0 = time.time()
o1, s1 = f1(y0); np.asarray(o1)
print("compile+run1", time.time() - t0, "status ok:", bool(jnp.all(s1 == SUCCESS)))
o3, s3 = f3(y0 + 1e-6); np.asarray(o3)
best = np.inf
for it in range(3):
    z = y0 + 1e-5 * it
    t0 = time.time(); np.asarray(f1(z)[0]); t1 = time.time() - t0
    t0 = time.time(); np.asarray(f3(z)[0]); t3 = time.time() - t0
    best = min(best, (t3 - t1) / 2)
print(f"marginal per solve: {best*1e3:.2f} ms  (M={m}, D={d})")
