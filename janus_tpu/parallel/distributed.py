"""Multi-host initialization (the reference's MPI role, SURVEY §2.5).

The reference's distribution is mpi4py/PETSc per-rank solves + gather
(examples/python/mpi_petsc_test.py). TPU-native: ``jax.distributed`` across
hosts; the batch mesh then spans all chips and collectives ride ICI within a
slice and DCN across slices. On a single host this is a no-op.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX if configured (env-driven on TPU pods)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def global_batch_mesh(axis: str = "data"):
    """1-D mesh over every addressable device in the job."""
    from janus_tpu.parallel.mesh import make_mesh
    return make_mesh(axes=(axis,))
