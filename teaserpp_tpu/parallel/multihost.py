"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md §2.5: no MPI/NCCL anywhere); this
framework scales across hosts with ``jax.distributed`` + a global device
mesh: the ``batch`` axis spans hosts over DCN (independent registrations,
zero cross-host traffic) while the ``pairs`` axis stays within a host's ICI
domain so the O(N^2) row-sharded collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process env)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    pairs_per_host: Optional[int] = None,
    axis_names: Tuple[str, str] = ("batch", "pairs"),
) -> Mesh:
    """Global 2-D mesh: ``pairs`` within each host's local devices (ICI),
    ``batch`` across the remaining device/host dimension (DCN-friendly)."""
    devices = np.array(jax.devices())
    n = len(devices)
    local = jax.local_device_count()
    if pairs_per_host is None:
        pairs_per_host = local
    pairs_per_host = min(pairs_per_host, local)
    assert n % pairs_per_host == 0
    return Mesh(devices.reshape(n // pairs_per_host, pairs_per_host), axis_names)
