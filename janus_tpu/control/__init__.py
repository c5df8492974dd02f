"""Outer nonlinear layer: shooting, pseudo-transient continuation, homotopy,
augmented Lagrangian — the reference's L3 (SURVEY §2.3).

The reference implements these as problem-specific example scripts driven by
scipy/PETSc with finite-difference Jacobians and process pools
(examples/python/vdp_pmp_transient_multishoot.py:16-787, vdp_sssc.py:16-40,
examples/cpp/multi_shooting_petsc.cpp:44-180). Here they are generic batched
algorithms: every solver runs M problem instances in lockstep, Jacobians come
from forward-mode AD through the (jvp-differentiable) adaptive solvers, and
segment integrations in multiple shooting fold into the batch axis.
"""

from janus_tpu.control.newton import newton_solve, NewtonResult
from janus_tpu.control.krylov import newton_krylov
from janus_tpu.control.anderson import anderson_solve
from janus_tpu.control.precond import (
    block_jacobi_precond,
    tridiag_precond,
    tridiag_solve,
    probe_colored_jacobian,
)
from janus_tpu.control.psitc import psitc, PsitcResult
from janus_tpu.control.homotopy import homotopy, HomotopyResult
from janus_tpu.control.auglag import augmented_lagrangian, AugLagResult
from janus_tpu.control.shooting import (
    single_shooting,
    multiple_shooting_residual,
)
from janus_tpu.control.optimize import newton_cg, cg_steihaug, OptimizeResult
from janus_tpu.control.implicit import implicit_root

__all__ = [
    "implicit_root",
    "newton_solve", "NewtonResult",
    "newton_krylov", "anderson_solve",
    "block_jacobi_precond", "tridiag_precond", "tridiag_solve",
    "probe_colored_jacobian",
    "psitc", "PsitcResult",
    "homotopy", "HomotopyResult",
    "augmented_lagrangian", "AugLagResult",
    "single_shooting", "multiple_shooting_residual",
    "newton_cg", "cg_steihaug", "OptimizeResult",
]
