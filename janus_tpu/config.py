"""Global configuration helpers.

The reference achieves its accuracy targets in float64 (RelTol down to 1e-13 in
examples, e.g. reference examples/cpp/radauted_hamiltonian_example.cpp:84-104).
On TPU the MXU is f32-native; we keep solvers dtype-polymorphic (they work in the
dtype of y0) and let users opt into x64 for tight-tolerance work.
"""

import jax


def enable_x64(on: bool = True) -> None:
    """Enable float64 globally (needed for rtol below ~1e-8)."""
    jax.config.update("jax_enable_x64", on)


def default_dtype():
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
