"""Compute ops: XLA reference implementations + Pallas TPU kernels.

Every op has an XLA (pure jnp) implementation that serves as the semantic
reference, and — where profitable — a Pallas kernel tuned for the packed
many-small-graphs layout.  Dispatch is by explicit function choice at the
model layer; numerics are verified against each other in tests.
"""

from gcnbmp_tpu.ops.aggregate import edge_type_aggregate
from gcnbmp_tpu.ops.circular import circular_correlation

__all__ = ["edge_type_aggregate", "circular_correlation"]
