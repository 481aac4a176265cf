"""Batched and sharded execution: vmap batches, mesh-sharded huge problems."""

from teaserpp_tpu.parallel.batch import pad_problems, solve_batch, solve_batch_sharded
from teaserpp_tpu.parallel.sharded import (
    trim_adjacency_dense,
    solve_large_sharded,
    LargeSolveResult,
)

__all__ = [
    "pad_problems",
    "solve_batch",
    "solve_batch_sharded",
    "trim_adjacency_dense",
    "solve_large_sharded",
    "LargeSolveResult",
]
