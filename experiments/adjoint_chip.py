"""On-chip continuous-adjoint benchmark (VERDICT r2 item 1 'done' criterion).

Compares training-step throughput: reverse-mode gradient of a scalar loss of
the final state through (a) radau_adjoint (continuous adjoint on the adaptive
solver) vs (b) the checkpointed fixed-grid rk4 path (solve/fixed.py) at
matched gradient accuracy, on the stiff VdP problem the framework targets.

Timing per the axon-relay rules (CLAUDE.md): chained iterations inside one
jit, marginal cost between two chain lengths, inputs perturbed per rep,
results forced with np.asarray.

MEASURED (TPU v5e-1, f32, 8192 lanes, rtol 1e-4 compensated, Radau9,
adjoint_steps 64/96; gradients agree with the fixed-grid path to ~1e-8):
- mu=1e3: adjoint 19.5 ms/grad-step (420k traj-grads/s); fixed rk4 is
  still explicit-stable at n=2048 (8.1 ms) -> adjoint 0.4x there.
  RE-MEASURED after cond-gating runtime-dead mesh slots in the backward
  scan (slots k >= max(naccept) skip the factorization/Newton/vjp work
  entirely): 15.3 ms (537k traj-grads/s), 1.27x, grads still 1e-8-equal
  to the fixed-grid path.
- mu=1e4: adjoint 26.2 ms vs fixed n=12288 71.3 ms -> 2.7x.
- mu=1e5: adjoint 41.6 ms vs fixed n=122880 494 ms -> 11.9x.
The fixed grid's cost is linear in stiffness (explicit stability bound
h <~ 2.8/(3 mu)); the adaptive adjoint's is ~logarithmic — it is the only
reverse-mode path that does not degrade as stiffness grows.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.solve.fixed import odeint_fixed


def marginal(fn, x, n_lo=1, n_hi=4):
    f_lo = jax.jit(lambda z: fn(z, n_lo))
    f_hi = jax.jit(lambda z: fn(z, n_hi))
    np.asarray(f_lo(x)); np.asarray(f_hi(x))
    def t(f):
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter(); np.asarray(f(x))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(f_hi) - t(f_lo)) / (n_hi - n_lo)


def main():
    on_tpu = jax.default_backend() == "tpu"
    print("backend:", jax.default_backend())
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    batch = 8192
    mu, tf = 1000.0, 1.0
    y0 = jnp.tile(jnp.array([[2.0, 0.0]], dtype), (batch, 1))
    mus = jnp.full((batch,), mu, dtype)
    opts = Options(rtol=1e-4 if on_tpu else 1e-6, atol=1e-7 if on_tpu else 1e-9,
                   pivoting=False, compensated=on_tpu,
                   min_stages=5, max_stages=5, adjoint_steps=64)

    def loss_adj(z, mm):
        yT = radau_adjoint(vdp_rhs, (0.0, tf), z, args=mm, options=opts,
                           jac=vdp_jac)
        return jnp.sum(yT ** 2) / batch

    def chained_adj(z, n):
        def body(i, carry):
            gy, gm = jax.grad(loss_adj, argnums=(0, 1))(z + carry[:, None] * 1e-9, mus)
            return carry + gy[:, 0] * 1e-20 + gm * 1e-20
        return jax.lax.fori_loop(0, n, body, z[:, 0] * 0)

    t0 = time.time()
    dt_adj = marginal(chained_adj, y0)
    print(f"adjoint grad step: {dt_adj*1e3:.1f} ms  ({batch/dt_adj:.0f} traj-grads/s)"
          f"  [compile+measure {time.time()-t0:.0f}s]")

    # gradient value sanity on chip vs CPU would go here; check finiteness
    gy, gm = jax.jit(jax.grad(loss_adj, argnums=(0, 1)))(y0, mus)
    print("grads finite:", bool(jnp.all(jnp.isfinite(gy))), bool(jnp.all(jnp.isfinite(gm))),
          "gy[0]:", np.asarray(gy[0]), "gm[0]:", float(gm[0]))

    # fixed-grid rk4: explicit stability for VdP mu=1e3 needs h ~< 1.5e-3
    # (lambda ~ -mu*(x^2-1) ~ -3e3) => >= ~2000 steps for t in [0,1], and
    # accuracy at the rtol target needs more; use the smallest stable count
    for n_steps in (2048, 4096):
        def loss_fix(z, mm, _n=n_steps):
            yT = odeint_fixed(vdp_rhs, 0.0, tf, z, n_steps=_n, args=mm)
            return jnp.sum(yT ** 2) / batch

        def chained_fix(z, n, _loss=loss_fix):
            def body(i, carry):
                gy, gm = jax.grad(_loss, argnums=(0, 1))(z + carry[:, None] * 1e-9, mus)
                return carry + gy[:, 0] * 1e-20 + gm * 1e-20
            return jax.lax.fori_loop(0, n, body, z[:, 0] * 0)

        t0 = time.time()
        dt_fix = marginal(chained_fix, y0)
        gyf, gmf = jax.jit(jax.grad(loss_fix, argnums=(0, 1)))(y0, mus)
        err = (np.abs(np.asarray(gyf[0]) - np.asarray(gy[0])).max()
               if bool(jnp.all(jnp.isfinite(gyf))) else np.inf)
        print(f"fixed rk4 n={n_steps}: {dt_fix*1e3:.1f} ms "
              f"({batch/dt_fix:.0f} traj-grads/s), grad-vs-adjoint maxdiff {err:.2e}"
              f"  [{time.time()-t0:.0f}s]")
        print(f"  adjoint speedup vs fixed(n={n_steps}): {dt_fix/dt_adj:.2f}x")


if __name__ == "__main__":
    main()
