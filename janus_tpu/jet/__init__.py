"""Batched dual-number ("jet") arithmetic — the TensorDual/TensorMatDual role.

The reference keeps dual arithmetic in an external C++ library (janus-tensor-dual,
included at reference src/cpp/radaute.hpp:16 and imported at
src/python/seulexted.py:4-5) with a hand-written rule per op. Here a Jet is a JAX
pytree {r: primal, d: stacked tangents with a LEADING sensitivity axis N}; common
ops have hand-written tangent rules and everything else lifts generically through
``jax.linearize`` — so every JAX op is automatically jet-capable.
"""

from janus_tpu.jet.core import (
    Jet,
    jet,
    const,
    seed_identity,
    lift,
    where,
    concatenate,
    stack,
    einsum,
    matmul,
    sum as jsum,
    max_dual,
    min_dual,
    jvp_call,
)

__all__ = [
    "Jet",
    "jet",
    "const",
    "seed_identity",
    "lift",
    "where",
    "concatenate",
    "stack",
    "einsum",
    "matmul",
    "jsum",
    "max_dual",
    "min_dual",
    "jvp_call",
]
