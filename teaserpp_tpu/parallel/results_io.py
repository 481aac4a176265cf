"""Persistence for batched registration sweeps.

The reference never serializes solver state (solves are sub-second,
SURVEY.md §5); the batched TPU workloads this framework targets (thousands
of scan-to-map registrations) do want their results dumped/reloaded, so the
batched ``PipelineSolution`` pytree round-trips through one npz file.
"""

from __future__ import annotations

import numpy as np

from teaserpp_tpu.solvers.pipeline import PipelineSolution

_FIELDS = PipelineSolution._fields


def save_batch_results(path: str, solution: PipelineSolution) -> None:
    """Write a (possibly batched) PipelineSolution to ``path`` (npz)."""
    np.savez_compressed(
        path, **{f: np.asarray(getattr(solution, f)) for f in _FIELDS}
    )


def load_batch_results(path: str) -> PipelineSolution:
    """Read a PipelineSolution previously saved with :func:`save_batch_results`."""
    with np.load(path) as data:
        return PipelineSolution(**{f: data[f] for f in _FIELDS})
