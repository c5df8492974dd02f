"""On-chip second-order + quadrature benchmark (round-3 additions).

Times, at 8192 lanes of stiff VdP (mu=1e3, f32 rtol 1e-4 compensated,
Radau9), per the axon-relay rules (chained iterations inside one jit,
marginal cost between chain lengths, perturbed inputs, np.asarray forcing):

1. forward quadrature overhead: solve_radau(quad=y0^2) vs plain solve
2. integral-cost adjoint: grad of sum(q) + |y(T)|^2 via radau_adjoint(cost=)
3. HVP: radau_hvp (y0, theta) Hessian-vector product
4. SEULEX IND: solve_seulex(tangents=2 dirs) vs plain seulex

Run on the real chip:  cd /root/repo && python - < experiments/hvp_chip.py
(PYTHONPATH=/root/repo breaks axon registration — CLAUDE.md round-3 note.)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.hvp import radau_hvp
from janus_tpu.solve.radau import solve_radau
from janus_tpu.solve.seulex import solve_seulex


def chain_timer(make_fn, x, n_lo=1, n_hi=3):
    """Marginal per-iteration cost of a chained jitted map."""
    f_lo = jax.jit(make_fn(n_lo))
    f_hi = jax.jit(make_fn(n_hi))
    np.asarray(jax.tree_util.tree_leaves(f_lo(x))[0])
    np.asarray(jax.tree_util.tree_leaves(f_hi(x))[0])

    def t(f):
        best = np.inf
        for i in range(3):
            xx = x + 1e-6 * (i + 1)
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f(xx))[0])
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo)


def main():
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    batch = 8192 if on_tpu else 256
    mu, tf = 1000.0, 1.0
    y0 = jnp.tile(jnp.array([[2.0, 0.0]], dtype), (batch, 1))
    mus = jnp.full((batch,), mu, dtype)
    opts = Options(rtol=1e-4 if on_tpu else 1e-6,
                   atol=1e-7 if on_tpu else 1e-9,
                   pivoting=False, compensated=on_tpu,
                   min_stages=5, max_stages=5, adjoint_steps=64)
    lcost = lambda t, y, a: y[:, 0] ** 2                     # noqa: E731

    def plain(n):
        def run(z):
            for _ in range(n):
                z = 0.999 * solve_radau(vdp_rhs, 0.0, tf, z, args=mus,
                                        options=opts, jac=vdp_jac).y
            return z
        return run

    def with_quad(n):
        def run(z):
            for _ in range(n):
                s = solve_radau(vdp_rhs, 0.0, tf, z, args=mus, options=opts,
                                jac=vdp_jac, quad=lcost)
                z = 0.999 * s.y + 1e-9 * s.quad[:, None]
            return z
        return run

    t_plain = chain_timer(plain, y0)
    t_quad = chain_timer(with_quad, y0)
    print(f"plain solve          {t_plain*1e3:8.2f} ms")
    print(f"+quad                {t_quad*1e3:8.2f} ms  "
          f"(overhead {100*(t_quad/t_plain-1):.1f}%)")

    def cost_grad(n):
        def loss(z):
            yT, q = radau_adjoint(vdp_rhs, (0.0, tf), z, args=mus,
                                  options=opts, jac=vdp_jac, cost=lcost)
            return jnp.sum(yT ** 2) + jnp.sum(q)
        g = jax.grad(loss)

        def run(z):
            for _ in range(n):
                z = z - 1e-9 * g(z)
            return z
        return run

    t_adj = chain_timer(cost_grad, y0)
    print(f"cost-adjoint grad    {t_adj*1e3:8.2f} ms  "
          f"({batch/t_adj/1e3:.0f}k traj-grads/s)")

    v_y0 = jnp.ones_like(y0) * 0.1

    def hvp_step(n):
        def one(z):
            (h_y0, _), _ = radau_hvp(
                vdp_rhs, (0.0, tf), z, mus,
                loss=lambda yT, a: jnp.sum(yT ** 2), v_y0=v_y0,
                options=opts)
            return h_y0

        def run(z):
            for _ in range(n):
                z = z - 1e-12 * one(z)
            return z
        return run

    t_hvp = chain_timer(hvp_step, y0)
    print(f"radau_hvp            {t_hvp*1e3:8.2f} ms  "
          f"({batch/t_hvp/1e3:.0f}k traj-HVPs/s, "
          f"{t_hvp/t_adj:.2f}x the first-order grad)")

    sx_opts = Options(rtol=1e-4 if on_tpu else 1e-6,
                      atol=1e-7 if on_tpu else 1e-9, pivoting=False)
    seeds = jnp.stack([jnp.zeros_like(y0).at[:, 0].set(1.0),
                       jnp.zeros_like(y0).at[:, 1].set(1.0)])

    def sx_plain(n):
        def run(z):
            for _ in range(n):
                z = 0.999 * solve_seulex(vdp_rhs, jnp.zeros((batch,), dtype),
                                         jnp.full((batch,), tf, dtype), z,
                                         args=mus, options=sx_opts,
                                         jac=vdp_jac).y
            return z
        return run

    def sx_ind(n):
        def run(z):
            for _ in range(n):
                s = solve_seulex(vdp_rhs, jnp.zeros((batch,), dtype),
                                 jnp.full((batch,), tf, dtype), z, args=mus,
                                 options=sx_opts, jac=vdp_jac, tangents=seeds)
                z = 0.999 * s.y + 1e-9 * s.sens[0]   # consume sens (DCE!)
            return z
        return run

    t_sx = chain_timer(sx_plain, y0)
    t_sxi = chain_timer(sx_ind, y0)
    print(f"seulex plain         {t_sx*1e3:8.2f} ms")
    print(f"seulex +2 IND dirs   {t_sxi*1e3:8.2f} ms  "
          f"({t_sxi/t_sx:.2f}x plain)")


if __name__ == "__main__":
    main()
