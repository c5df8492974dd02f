"""On-chip validation + timing of the round-3 adjoint extensions.

Four reverse-mode paths that did not exist before this round, each run in
hardware f32 on the real chip (or f64 on CPU when no TPU is attached):

  1. t_eval trajectory-fitting gradient — chained adaptive segments,
     loss = sum_j w_j |y(t_j)|^2, grad w.r.t. (y0, mu);
  2. terminal-event gradient — differentiable (y*, t*) via the
     implicit-function jump, incl. an event-only parameter (g_theta);
  3. semi-explicit index-1 DAE gradient (n_alg=1, singular mass);
  4. stage_solver='gmres' matrix-free gradient on a D=128 Fisher-KPP
     method-of-lines line (J never materialized, fwd or bwd).

Each mode reports the marginal per-gradient wall time (axon-relay rules:
chained reps inside one jit, inputs perturbed per rep, np.asarray to force)
and a same-device FD spot-check of one gradient entry.

Measured numbers are recorded in CLAUDE.md / README once this has been run
on the chip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.events import Event


def marginal(make_loss, grad_fn, x, n_lo=1, n_hi=3):
    """Marginal seconds per gradient evaluation (chained inside one jit)."""
    def chain(z, n):
        def body(i, acc):
            g = grad_fn(z + acc * 1e-6)
            return acc + 1e-12 * g[0, 0] if g.ndim == 2 else acc + 1e-12 * g[0]
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), z.dtype))
    f_lo = jax.jit(lambda z: chain(z, n_lo))
    f_hi = jax.jit(lambda z: chain(z, n_hi))
    np.asarray(f_lo(x)); np.asarray(f_hi(x))

    def t(f):
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter(); np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo)


def fd_check(loss, grad_val, x, idx, eps):
    e = jnp.zeros_like(x).at[idx].set(eps)
    fd = (loss(x + e) - loss(x - e)) / (2 * eps)
    g = grad_val[idx]
    rel = abs(float(g) - float(fd)) / max(abs(float(fd)), 1e-30)
    return float(g), float(fd), rel


def main():
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    rtol = 1e-4 if on_tpu else 1e-8
    atol = 1e-7 if on_tpu else 1e-11
    eps_fd = 1e-3 if on_tpu else 1e-6
    batch = 8192

    # ---- 1. t_eval trajectory fit -------------------------------------
    y0 = jnp.tile(jnp.array([[2.0, 0.0]], dtype), (batch, 1))
    mus = jnp.full((batch,), 1000.0, dtype)
    ts = jnp.array([0.25, 0.5, 0.75, 1.0], dtype)
    opts = Options(rtol=rtol, atol=atol, pivoting=False, compensated=False,
                   min_stages=5, max_stages=5, adjoint_steps=64)

    def loss_teval(z):
        ys = radau_adjoint(vdp_rhs, (0.0, 1.0), z, args=mus, options=opts,
                           jac=vdp_jac, t_eval=ts)
        return jnp.sum(ys ** 2) / batch
    g_fn = jax.grad(loss_teval)
    g = jax.jit(g_fn)(y0)
    gv, fdv, rel = fd_check(jax.jit(loss_teval), g, y0, (0, 0), eps_fd)
    dt = marginal(loss_teval, g_fn, y0)
    print(f"t_eval: {dt*1e3:.1f} ms/grad ({batch/dt:,.0f} traj-grads/s) "
          f"fd rel {rel:.1e}")

    # ---- 2. terminal events -------------------------------------------
    def osc_rhs(t, y, p):
        k, c, _ = p
        return jnp.stack(
            [y[:, 1], -k * y[:, 0] - c * y[:, 1] - 0.1 * y[:, 0] ** 3],
            axis=-1)

    def level_ev(t, y, p):
        return y[:, 0] - p[2]

    pr = (jnp.full((batch,), 3.0, dtype), jnp.full((batch,), 0.25, dtype),
          jnp.full((batch,), -0.8, dtype))
    y0e = jnp.tile(jnp.array([[2.0, 0.0]], dtype), (batch, 1))
    optse = Options(rtol=rtol, atol=atol, pivoting=False,
                    adjoint_steps=128)

    def loss_ev(z):
        ystar, tstar = radau_adjoint(
            osc_rhs, (0.0, 12.0), z, args=pr, options=optse,
            events=Event(level_ev, terminal=True, direction=-1.0))
        return (jnp.sum(ystar[:, 1] ** 2) + jnp.sum(tstar)) / batch
    g_fn = jax.grad(loss_ev)
    g = jax.jit(g_fn)(y0e)
    gv, fdv, rel = fd_check(jax.jit(loss_ev), g, y0e, (0, 0), eps_fd)
    dt = marginal(loss_ev, g_fn, y0e)
    print(f"events: {dt*1e3:.1f} ms/grad ({batch/dt:,.0f} traj-grads/s) "
          f"fd rel {rel:.1e}")

    # ---- 3. index-1 DAE ------------------------------------------------
    def dae_rhs(t, y, k):
        k1, k2, k3 = k
        x1, x2, z = y[:, 0], y[:, 1], y[:, 2]
        return jnp.stack([-k1 * x1 + k3 * x2 * z,
                          k1 * x1 - k2 * x2 ** 2 - k3 * x2 * z,
                          x1 + x2 + z - 1.0], axis=-1)

    mass = jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype))
    ks = (jnp.full((batch,), 0.5, dtype), jnp.full((batch,), 10.0, dtype),
          jnp.full((batch,), 2.0, dtype))
    x0 = jnp.tile(jnp.array([[1.0, 0.2]], dtype), (batch, 1))
    optsd = Options(rtol=rtol, atol=atol, pivoting=False, adjoint_steps=64)

    def loss_dae(xd):
        z0 = 1.0 - xd[:, 0] - xd[:, 1]
        yy0 = jnp.concatenate([xd, z0[:, None]], axis=-1)
        yT = radau_adjoint(dae_rhs, (0.0, 2.0), yy0, args=ks, options=optsd,
                           mass=mass, n_alg=1)
        return jnp.sum(yT ** 2) / batch
    g_fn = jax.grad(loss_dae)
    g = jax.jit(g_fn)(x0)
    gv, fdv, rel = fd_check(jax.jit(loss_dae), g, x0, (0, 0), eps_fd)
    dt = marginal(loss_dae, g_fn, x0)
    print(f"dae:    {dt*1e3:.1f} ms/grad ({batch/dt:,.0f} traj-grads/s) "
          f"fd rel {rel:.1e}")

    # ---- 4. gmres large-D MOL -----------------------------------------
    d, mol_m = 128, 256
    dx = 1.0 / (d + 1)
    xg = np.linspace(dx, 1.0 - dx, d)

    def mol_rhs(t, y, p):
        diff, rate = p
        lap = (jnp.pad(y, ((0, 0), (1, 0)))[:, :-1]
               - 2 * y + jnp.pad(y, ((0, 0), (0, 1)))[:, 1:])
        return diff / dx ** 2 * lap + rate * y * (1.0 - y)

    y0m = jnp.tile(jnp.asarray(np.exp(-100 * (xg - 0.3) ** 2), dtype)[None],
                   (mol_m, 1))
    rates = jnp.full((mol_m, 1), 6.0, dtype)
    optsg = Options(rtol=rtol, atol=atol, stage_solver="gmres",
                    gmres_iters=25, adjoint_steps=64)

    def loss_mol(z):
        yT = radau_adjoint(mol_rhs, (0.0, 0.4), z,
                           args=(jnp.asarray(0.01, dtype), rates),
                           options=optsg)
        return jnp.sum(jnp.asarray(xg, dtype)[None, :] * yT ** 2) / mol_m
    g_fn = jax.grad(loss_mol)
    g = jax.jit(g_fn)(y0m)
    gv, fdv, rel = fd_check(jax.jit(loss_mol), g, y0m, (0, 40), eps_fd)
    dt = marginal(loss_mol, g_fn, y0m)
    print(f"gmres:  {dt*1e3:.1f} ms/grad ({mol_m/dt:,.0f} traj-grads/s) "
          f"fd rel {rel:.1e}")


if __name__ == "__main__":
    main()
