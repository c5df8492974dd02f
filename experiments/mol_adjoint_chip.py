"""Chip: reverse-mode gradient throughput on the D=128 MOL line, tridiag stages.

MEASURED (TPU v5e-1, f32, M=1024, D=128, rtol 1e-4, adjoint_steps=48,
stage_solver='tridiag'): full (y0 [128] + rate) gradient through the
adaptive Radau solve = 14.85 ms -> 69k traj-grads/s on a 128-dimensional
PDE line; forward + backward sweeps both ride the direct PCR tridiagonal
stage solves, Jacobian never materialized.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint

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
w = jnp.asarray(xg, jnp.float32)
opts = Options(rtol=1e-4, atol=1e-7, stage_solver="tridiag", pivoting=False,
               adjoint_steps=48)

def gstep(z, r):
    def loss(zz, rr):
        yT = radau_adjoint(rhs, (0.0, 0.4), zz, args=(0.01, rr), options=opts)
        return jnp.sum(w[None, :] * yT ** 2)
    return jax.grad(loss, argnums=(0, 1))(z, r)

def chain(z, n):
    def one(c, _):
        gz, gr = gstep(c, rates)
        return c + 1e-9 * gz, gr
    return jax.lax.scan(one, z, None, length=n)

f1 = jax.jit(lambda z: chain(z, 1))
f3 = jax.jit(lambda z: chain(z, 3))
t0 = time.time()
o1, gr1 = f1(y0); np.asarray(o1); np.asarray(gr1)
print("compile+run1", round(time.time() - t0, 1), "s; grads finite:",
      bool(jnp.all(jnp.isfinite(gr1))))
np.asarray(f3(y0 + 1e-6)[0])
best = np.inf
for it in range(3):
    z = y0 + 1e-5 * it
    t0 = time.time(); np.asarray(f1(z)[0]); t1 = time.time() - t0
    t0 = time.time(); np.asarray(f3(z)[0]); t3 = time.time() - t0
    best = min(best, (t3 - t1) / 2)
print(f"full (y0, rate) gradient: {best*1e3:.2f} ms  (M={m}, D={d}) = "
      f"{m/best:.0f} traj-grads/s")
