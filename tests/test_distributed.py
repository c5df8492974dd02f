"""Multi-process jax.distributed smoke test (reference MPI role, SURVEY §2.5).

The reference's only multi-process artifact is mpi_petsc_test.py (per-rank
COMM_SELF solves + gather). Equivalent here: two REAL OS processes join a
jax.distributed coordination service on localhost CPU, each integrates its
own shard of a Van der Pol sweep, and a psum-style all-reduce over the
process axis must see both shards. Runs the worker as a subprocess so the
parent's backend/env is untouched; skips (with reason) if this jaxlib build
lacks cross-process CPU collectives.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
from janus_tpu.parallel.distributed import initialize
initialize(coordinator_address=f"localhost:{port}", num_processes=nproc,
           process_id=pid)
assert jax.process_count() == nproc, jax.process_count()

import jax.numpy as jnp
from janus_tpu.solve import Options
from janus_tpu.solve.radau import solve_radau
from janus_tpu.models.problems import vdp_rhs

# per-process shard of the sweep (the reference's per-rank COMM_SELF solve)
mus = jnp.asarray([10.0 * (pid + 1), 20.0 * (pid + 1)])
y0 = jnp.tile(jnp.array([[2.0, 0.0]]), (2, 1))
sol = solve_radau(vdp_rhs, 0.0, 0.5, y0, args=mus,
                  options=Options(rtol=1e-6, atol=1e-9))
ok_local = float(jnp.mean((sol.status == 1).astype(jnp.float32)))

# the gather role: a global all-reduce across processes via a sharded jit
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
devs = jax.devices()
mesh = Mesh(np.asarray(devs).reshape(-1), ("p",))
marks = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("p")),
    np.full((1,), float(2 ** pid) * ok_local), (nproc,))

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(marks))
print(f"RESULT pid={pid} total={t}", flush=True)
assert t == float(2 ** nproc - 1), t   # 1 + 2 (+4 ...): every process seen
"""


def test_two_process_cpu_distributed(tmp_path):
    nproc = 2
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out))

    joined = "\n---\n".join(o for _, o in outs)
    if any(rc != 0 for rc, _ in outs):
        lowered = joined.lower()
        if ("unimplemented" in lowered or "not supported" in lowered
                or "no cross-host" in lowered):
            pytest.skip(f"jaxlib lacks cross-process CPU collectives:\n"
                        f"{joined[-800:]}")
        pytest.fail(joined[-2000:])
    assert all("RESULT" in o for _, o in outs), joined[-2000:]


WORKER_GRAD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
from janus_tpu.parallel.distributed import initialize
initialize(coordinator_address=f"localhost:{port}", num_processes=nproc,
           process_id=pid)

import jax.numpy as jnp
from janus_tpu.solve import Options
from janus_tpu.solve.adjoint import radau_adjoint
from janus_tpu.models.problems import vdp_rhs

# the multi-host TRAINING collective: each process owns a shard of the
# trajectory batch, computes reverse-mode gradients of its local loss
# through the continuous adjoint, and the shared-parameter gradient is the
# cross-process all-reduce of the shard gradients
y0 = jnp.asarray([[2.0, 0.0], [1.5 + 0.3 * pid, 0.2]])

def local_loss(k):
    yT = radau_adjoint(vdp_rhs, (0.0, 0.5), y0, args=jnp.full((2,), k),
                       options=Options(rtol=1e-8, atol=1e-11))
    return jnp.sum(yT ** 2)

g_local = float(jax.grad(local_loss)(30.0))

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("p",))
shard = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("p")), np.full((1,), g_local), (nproc,))

@jax.jit
def allreduce(x):
    return jnp.sum(x)

g_total = float(allreduce(shard))
print(f"GRAD pid={pid} local={g_local!r} total={g_total!r}", flush=True)
"""


def test_two_process_adjoint_gradient_allreduce(tmp_path):
    """Data-parallel reverse-mode training step across two OS processes:
    the all-reduced shared-parameter gradient must equal the sum of the
    shards' local adjoint gradients, identically on every process."""
    import re

    nproc = 2
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker_grad.py"
    script.write_text(WORKER_GRAD)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(nproc), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed grad workers timed out")
        outs.append((p.returncode, out))

    joined = "\n---\n".join(o for _, o in outs)
    if any(rc != 0 for rc, _ in outs):
        lowered = joined.lower()
        if ("unimplemented" in lowered or "not supported" in lowered
                or "no cross-host" in lowered):
            pytest.skip(f"jaxlib lacks cross-process CPU collectives:\n"
                        f"{joined[-800:]}")
        pytest.fail(joined[-2000:])

    locals_, totals = {}, []
    for _, o in outs:
        mm = re.search(r"GRAD pid=(\d+) local=([\d.eE+-]+) "
                       r"total=([\d.eE+-]+)", o)
        assert mm, o[-1000:]
        locals_[int(mm.group(1))] = float(mm.group(2))
        totals.append(float(mm.group(3)))
    assert len(locals_) == nproc
    expected = sum(locals_.values())
    for t in totals:
        np.testing.assert_allclose(t, expected, rtol=1e-12)
