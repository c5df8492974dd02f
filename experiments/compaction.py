"""Batch-compaction experiment (VERDICT round-1 item 7 / CLAUDE.md round-2
perf direction).

Hypothesis: on stiffness-heterogeneous batches (Van der Pol with mu spread
over decades) per-lane step counts disperse widely, so the lockstep
while_loop — which runs the FULL batch until the SLOWEST lane finishes —
wastes VPU work on finished lanes. Compaction: run the solve in bounded
segments (Options.max_steps), and between segments pack the still-active
lanes into the smallest power-of-two buffer that holds them, re-entering a
solver compiled for that smaller size.

Design constraints this respects:
- XLA static shapes: one compile per power-of-two size (compile cache makes
  repeats free), host drives the resizing.
- The axon relay adds ~66 ms fixed per host-visible call (CLAUDE.md): every
  timing subtracts a separately measured per-call overhead, and the lockstep
  reference uses the marginal-cost trick from bench.py.
- Restart cost: each segment re-estimates h (initial_step) and re-ramps the
  controller — counted against compaction honestly, because it is intrinsic
  to the scheme.

Prints a JSON summary; the result (either way) is recorded in CLAUDE.md.

RESULT (TPU v5e-1, M=16384, 2026-08): NEGATIVE. Step-count dispersion on
the 3-decade-mu + 16x-horizon batch is only ~1.29x max/median — the adaptive
controller grows h roughly exponentially on smooth stretches, so horizon
heterogeneity does NOT translate into step-count heterogeneity (and the f32
Newton-floor convergence fix removed the stall-retry tail). Lockstep waste
is therefore bounded by ~30%, while SEG-boundary quantization alone costs
~10% (work model 0.91x) and measured wall is 0.76x vs lockstep. Compaction
only becomes interesting for workloads with >=3x dispersion, e.g. batches
where many lanes hit early terminal events.
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
from janus_tpu.solve import Options, SUCCESS, MAX_STEPS
from janus_tpu.solve.radau import solve_radau

M = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
RTOL, ATOL = 1e-6, 1e-9
SEG = 32                  # steps per segment
MIN_SIZE = max(M // 32, 1)  # don't compact further (relay overhead dominates)
MAX_SEGS = 400


def make_batch(dtype):
    """Dispersal-heavy sweep: stiffness mu over 3 decades AND per-lane
    horizons tf over [0.25, 4] (16x) — the realistic parameter-sweep shape
    where lockstep waste is worst (finished lanes idle while long-horizon
    stiff lanes keep stepping)."""
    rng = np.random.RandomState(0)
    mus = 10.0 ** rng.uniform(1.0, 4.0, size=M)   # mu in [1e1, 1e4]
    tfs = 4.0 ** rng.uniform(-1.0, 1.0, size=M)   # tf in [0.25, 4]
    y0 = np.tile([2.0, 0.0], (M, 1))
    return (jnp.asarray(y0, dtype), jnp.asarray(mus, dtype),
            jnp.asarray(tfs, dtype))


def measure_call_overhead():
    """Fixed per-host-call cost of the relay (time of a trivial jit)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    np.asarray(f(x))
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float32 if on_tpu else jnp.float64
    opts_full = Options(rtol=RTOL, atol=ATOL, pivoting=False,
                        compensated=on_tpu)
    y0, mus, tfs = make_batch(dtype)

    # ---- dispersion + lockstep reference --------------------------------
    def full_solve(y0, mus, tfs):
        sol = solve_radau(vdp_rhs, 0.0, tfs, y0, args=mus, options=opts_full,
                          jac=vdp_jac)
        return sol.y, sol.status, sol.stats["nsteps"]

    jfull = jax.jit(full_solve)
    yT, status, nsteps = jfull(y0, mus, tfs)
    nsteps = np.asarray(nsteps)
    ok = float(np.mean(np.asarray(status) == SUCCESS))

    def chained(y0, mus, tfs, n):
        def body(i, c):
            yy, st, _ = full_solve(y0 + c[:, None] * 1e-9, mus, tfs)
            return yy[:, 0]
        return jax.lax.fori_loop(0, n, body, y0[:, 0])

    run1 = jax.jit(chained, static_argnums=3)
    run3 = jax.jit(chained, static_argnums=3)
    np.asarray(run1(y0, mus, tfs, 1)); np.asarray(run3(y0, mus, tfs, 3))

    def best_of(fn, n, reps=2):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(y0, mus, tfs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lockstep = max((best_of(run3, 3) - best_of(run1, 1)) / 2, 1e-9)

    # ---- compaction driver ----------------------------------------------
    overhead = measure_call_overhead()

    seg_cache = {}

    def segment_fn(size):
        if size not in seg_cache:
            o = Options(rtol=RTOL, atol=ATOL, pivoting=False,
                        compensated=on_tpu, max_steps=SEG)

            def seg(t0v, y0v, musv, tfv):
                sol = solve_radau(vdp_rhs, t0v, tfv, y0v, args=musv,
                                  options=o, jac=vdp_jac)
                return sol.t, sol.y, sol.status
            seg_cache[size] = jax.jit(seg)
        return seg_cache[size]

    # device-side repack: gather live lanes to the front and slice to the
    # next size — host transfers of the state between segments would pay the
    # relay's per-buffer upload cost and swamp the device time
    pack_cache = {}

    def pack_fn(size_in, size_out):
        key = (size_in, size_out)
        if key not in pack_cache:
            def pack(stn, tn, yn, mu, tfv, idxv):
                live = stn == MAX_STEPS
                order = jnp.argsort(~live)[:size_out]
                return (tn[order], yn[order], mu[order], tfv[order],
                        idxv[order])
            pack_cache[key] = jax.jit(pack)
        return pack_cache[key]

    # pre-compile every power-of-two size on dummy data, OUTSIDE the timed
    # loop (a warm call with identical inputs must NOT precede the timed
    # call: the axon relay caches repeated identical executions, CLAUDE.md)
    sz = M
    sizes = []
    while sz >= MIN_SIZE and sz >= 1:
        sizes.append(sz)
        sz //= 2
    for sz in sizes:
        fn = segment_fn(sz)
        np.asarray(fn(jnp.full((sz,), 0.011, dtype), y0[:sz] * 1.01,
                      mus[:sz], tfs[:sz])[2])
    for a in sizes:                       # pre-compile repack pairs too
        for b in sizes:
            if b <= a:
                jax.block_until_ready(pack_fn(a, b)(
                    jnp.zeros((a,), jnp.int8), jnp.full((a,), 0.013, dtype),
                    y0[:a] * 1.02, mus[:a], tfs[:a], jnp.arange(a)))

    def run_compaction(compact: bool, jitter: float):
        # per-run input jitter so no segment replays a previously executed
        # program+input pair (axon result cache, CLAUDE.md)
        t = jnp.zeros((M,), dtype)
        y = y0 + jitter
        mu = mus
        tfv = tfs
        idxv = jnp.arange(M)                 # original lane of each slot
        out_status = np.full((M,), -9, np.int8)
        size = M
        t_device = 0.0
        work = 0                             # lane-steps dispatched
        n_calls = 0
        while n_calls < MAX_SEGS:
            fn = segment_fn(size)
            tt0 = time.perf_counter()
            tn, yn, stn = fn(t, y, mu, tfv)
            stn_np = np.asarray(stn)         # forces completion (download)
            t_device += max(time.perf_counter() - tt0 - overhead, 0.0)
            work += size * SEG
            n_calls += 1
            live = stn_np == MAX_STEPS
            finished = ~live
            out_status[np.asarray(idxv)[finished]] = stn_np[finished]
            n_live = int(live.sum())
            if n_live == 0:
                break
            nxt = size
            if compact:
                while nxt // 2 >= max(n_live, MIN_SIZE) and nxt // 2 >= 1:
                    nxt //= 2
            # repack cost is charged to the scheme too
            tt0 = time.perf_counter()
            t, y, mu, tfv, idxv = jax.block_until_ready(
                pack_fn(size, nxt)(stn, tn, yn, mu, tfv, idxv))
            t_device += max(time.perf_counter() - tt0 - overhead, 0.0)
            size = nxt
        return t_device, n_calls, out_status, work

    t_comp, calls_c, st_c, work_c = run_compaction(compact=True, jitter=1e-7)
    t_nocomp, calls_n, st_n, work_n = run_compaction(compact=False,
                                                     jitter=2e-7)
    # hardware-independent work model: lockstep dispatches M lanes for as
    # many loop iterations as the slowest lane's step attempts
    work_lockstep = int(M * np.max(nsteps))

    agree = float(np.mean(st_c == np.asarray(status)))
    result = {
        "experiment": "batch compaction on heterogeneous-mu stiff VdP",
        "backend": jax.default_backend(),
        "batch": M, "segment_steps": SEG, "min_size": MIN_SIZE,
        "nsteps_median": float(np.median(nsteps)),
        "nsteps_p95": float(np.percentile(nsteps, 95)),
        "nsteps_max": float(np.max(nsteps)),
        "dispersion_max_over_median": float(np.max(nsteps)
                                            / max(np.median(nsteps), 1)),
        "lockstep_marginal_s": round(t_lockstep, 4),
        "segmented_compacting_s": round(t_comp, 4),
        "segmented_no_compaction_s": round(t_nocomp, 4),
        "speedup_vs_lockstep": round(t_lockstep / t_comp, 3),
        "speedup_vs_segmented": round(t_nocomp / t_comp, 3),
        "work_lockstep_lane_steps": work_lockstep,
        "work_segmented_lane_steps": work_n,
        "work_compacted_lane_steps": work_c,
        "work_model_speedup": round(work_lockstep / max(work_c, 1), 3),
        "calls_compacting": calls_c,
        "relay_overhead_per_call_s": round(overhead, 4),
        "success_fraction_lockstep": ok,
        "status_agreement": agree,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
