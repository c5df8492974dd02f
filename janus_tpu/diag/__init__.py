"""Diagnostics: per-trajectory statistics and per-step playback logs.

The reference returns StatsTe (counter struct, radaute.hpp:98-108) and DynTe —
per-step logs of h, error, Newton counts "for playback and debugging …
useful for integration with Deep Neural Networks" (radaute.hpp:109-131,
radaute_impl.hpp:588-594). Here stats are always-on int32 counters in
Solution.stats; step playback is opt-in via Options(record_steps=K) and comes
back as Solution-adjacent pytree ``dyn`` with fixed-capacity ring buffers
(lockstep write, NaN-padded like the reference)."""

from janus_tpu.diag.record import init_dyn, record_step, DYN_FIELDS
from janus_tpu.diag.profile import (
    trace,
    annotate,
    scope,
    device_memory_stats,
    marginal_seconds,
)

__all__ = ["init_dyn", "record_step", "DYN_FIELDS",
           "trace", "annotate", "scope", "device_memory_stats",
           "marginal_seconds"]
