"""Chip A/B: the Pallas SoA LU kernels inside the FULL radau solve.

Round 1 measured ops/smalllu_pallas.py at 1.4x the jnp gather-free LU on the
isolated kernel; VERDICT round-3 item 3 asks what that is END-TO-END at the
bench shape (65k stiff VdP mu=1e3, Radau9 f32 rtol 1e-6 compensated, 2 IND
seed directions — bench.py's headline config). Method: swap radau.py's
module-level lu_factor/lu_solve for SoA-layout Pallas wrappers (AoS->SoA
transposes at each call boundary — the honest integration cost) and time the
marginal chained-solve cost both ways.

Run from /root/repo as `python - < experiments/pallas_lu_chip.py`.

MEASURED (TPU v5e-1, 2026-08-19, monkeypatched A/B):
  stock jnp LU:  54.53 ms/solve = 1.20M traj/s (w/ 2 IND dirs), compile 259s
  pallas SoA LU: 42.94 ms/solve = 1.53M traj/s,                 compile   8s
  pallas/stock: 1.27x  — AND the unrolled jnp LU's trace was the compile
  hot spot (259s -> 8s). Verdict: WIRED as Options(pallas_lu=True) (radau
  LU path, pivot-free only); bench.py now runs it on chip. The option path
  is timed below as a third config to validate the production wiring.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import janus_tpu.solve.radau as radau_mod
from janus_tpu.ops.smalllu_pallas import lu_factor_t, lu_solve_t
from janus_tpu.solve import Options
from janus_tpu.models.problems import vdp_rhs, vdp_jac

BATCH = 65536
MU, TF = 1000.0, 1.0

_orig_factor = radau_mod.lu_factor
_orig_solve = radau_mod.lu_solve


def _p_factor(a, pivot=True):
    """[..., D, D] -> packed pivot-free SoA Pallas LU (identity piv)."""
    batch = a.shape[:-2]
    d = a.shape[-1]
    m = int(np.prod(batch))
    a_t = a.reshape(m, d * d).T                       # [D*D, M]
    lu = lu_factor_t(a_t).T.reshape(*batch, d, d)
    piv = jnp.broadcast_to(jnp.arange(d, dtype=jnp.int32), batch + (d,))
    return lu, piv


def _p_solve(lu, piv, b):
    batch = lu.shape[:-2]
    d = lu.shape[-1]
    if b.ndim != lu.ndim - 1:                         # matrix rhs: fall back
        return _orig_solve(lu, piv, b)
    m = int(np.prod(batch))
    x_t = lu_solve_t(lu.reshape(m, d * d).T, b.reshape(m, d).T)
    return x_t.T.reshape(*batch, d)


def run(label, pallas_opt=False):
    y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (BATCH, 1))
    mus = jnp.full((BATCH,), MU, jnp.float32)
    opts = Options(rtol=1e-6, atol=1e-9, pivoting=False, compensated=True,
                   min_stages=5, max_stages=5, pallas_lu=pallas_opt)
    seeds = jnp.stack([jnp.zeros_like(y0).at[:, j].set(1.0)
                       for j in range(2)])

    def chained(y0, mus, n):
        def body(i, carry):
            sol = radau_mod.solve_radau(
                vdp_rhs, 0.0, TF, y0 + carry[:, None] * 1e-9, mus,
                options=opts, jac=vdp_jac, tangents=seeds)
            return sol.y[:, 0] + 1e-30 * (sol.sens[0][:, 0]
                                          + sol.sens[1][:, 0])
        return jax.lax.fori_loop(0, n, body, y0[:, 0])

    f1 = jax.jit(chained, static_argnums=2)
    f6 = jax.jit(chained, static_argnums=2)
    t0 = time.time()
    np.asarray(f1(y0, mus, 1))
    compile_s = time.time() - t0
    np.asarray(f6(y0, mus, 6))
    best = np.inf
    for it in range(3):
        z = y0 + 1e-6 * it
        t0 = time.time(); np.asarray(f1(z, mus, 1)); t1 = time.time() - t0
        t0 = time.time(); np.asarray(f6(z, mus, 6)); t6 = time.time() - t0
        best = min(best, (t6 - t1) / 5)
    print(f"{label}: {best*1e3:.2f} ms/solve = "
          f"{BATCH/best:,.0f} traj/s (w/ 2 IND dirs)  "
          f"compile={compile_s:.0f}s", flush=True)
    return best


def main():
    t_stock = run("stock jnp LU")
    radau_mod.lu_factor = _p_factor
    radau_mod.lu_solve = _p_solve
    try:
        t_pallas = run("pallas SoA LU (patch)")
    finally:
        radau_mod.lu_factor = _orig_factor
        radau_mod.lu_solve = _orig_solve
    print(f"pallas/stock: {t_stock / t_pallas:.3f}x", flush=True)
    t_opt = run("Options(pallas_lu=True)", pallas_opt=True)
    print(f"option/stock: {t_stock / t_opt:.3f}x", flush=True)


if __name__ == "__main__":
    main()
