"""On-chip method matrix: every solver family driven on the real TPU in f32.

For each method: an 8192-lane heterogeneous-mu Van der Pol batch (stiff
families) or the same batch at mu<=10 (explicit families), rtol 1e-4/f32,
reporting per-method success fraction, marginal ms/solve, and throughput.
Documents which parts of the method zoo are production-ready on chip (the
README support matrix covers features; this covers hardware dtype reality).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import numpy as np

import jax
import jax.numpy as jnp

from janus_tpu.models.problems import vdp_rhs, vdp_jac
from janus_tpu.solve import Options, SUCCESS, solve_ivp

M = 8192
RTOL, ATOL = 1e-4, 1e-7

STIFF = ("radau", "radaup", "bdf", "bdf2", "seulex", "rodas", "grk4t")
EXPLICIT = ("dopri5", "dopri853")


def main():
    rng = np.random.RandomState(0)
    mus_stiff = jnp.asarray(10.0 ** rng.uniform(1.0, 3.0, M), jnp.float32)
    mus_soft = jnp.asarray(10.0 ** rng.uniform(-0.5, 1.0, M), jnp.float32)
    y0 = jnp.tile(jnp.array([[2.0, 0.0]], jnp.float32), (M, 1))

    results = {}
    for method in EXPLICIT + STIFF:
        mus = mus_soft if method in EXPLICIT else mus_stiff
        kw = {} if method in EXPLICIT else {"jac": vdp_jac}
        opts = Options(rtol=RTOL, atol=ATOL, pivoting=False)

        def chain(y0, mus, n, method=method, kw=kw, opts=opts):
            def body(i, c):
                s = solve_ivp(vdp_rhs, (0.0, 1.0), y0 + c[:, None] * 1e-9,
                              method=method, args=mus, options=opts, **kw)
                return s.y[:, 0]
            return jax.lax.fori_loop(0, n, body, y0[:, 0])

        try:
            r1 = jax.jit(chain, static_argnums=2)
            r3 = jax.jit(chain, static_argnums=2)
            t0 = time.perf_counter()
            np.asarray(r1(y0, mus, 1))
            compile_s = time.perf_counter() - t0
            np.asarray(r3(y0, mus, 3))

            def t(fn, n):
                best = np.inf
                for _ in range(2):
                    tt = time.perf_counter()
                    np.asarray(fn(y0, mus, n))
                    best = min(best, time.perf_counter() - tt)
                return best

            dt = max((t(r3, 3) - t(r1, 1)) / 2, 1e-9)
            sol = jax.jit(lambda y0, mus, method=method, kw=kw, opts=opts:
                          solve_ivp(vdp_rhs, (0.0, 1.0), y0, method=method,
                                    args=mus, options=opts, **kw).status)(
                y0, mus)
            ok = float(jnp.mean((sol == SUCCESS).astype(jnp.float32)))
            results[method] = {
                "success_fraction": round(ok, 4),
                "ms_per_solve": round(dt * 1e3, 1),
                "traj_per_sec": round(M / dt),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # record, don't die
            results[method] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(method, "->", json.dumps(results[method]), flush=True)

    print(json.dumps({"chip_matrix": results}))


if __name__ == "__main__":
    main()
