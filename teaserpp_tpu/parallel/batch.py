"""Batched registration: thousands of independent problems per device program.

The reference solves one problem per process (OpenMP inside one solve); the
TPU-native organizing principle is the opposite — ``vmap`` the whole
fixed-shape pipeline over a problem batch and shard the batch axis across a
``jax.sharding.Mesh`` (SLAM scan-to-map frontend style, SURVEY.md §2.5).
Variable-size problems are padded to a common N with validity masks.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from teaserpp_tpu.params import RobustRegistrationSolverParams
from teaserpp_tpu.solvers.pipeline import PipelineSolution, register_pair


def pad_problems(
    src_list: Sequence[np.ndarray],
    dst_list: Sequence[np.ndarray],
    n_pad: Optional[int] = None,
    multiple: int = 64,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a list of (3, n_i) problems to a common size.

    Returns (src (B, 3, N), dst (B, 3, N), valid (B, N)).
    """
    assert len(src_list) == len(dst_list)
    sizes = [s.shape[1] for s in src_list]
    if n_pad is None:
        n_pad = max(sizes)
        n_pad = ((n_pad + multiple - 1) // multiple) * multiple
    b = len(src_list)
    src = np.zeros((b, 3, n_pad))
    dst = np.zeros((b, 3, n_pad))
    valid = np.zeros((b, n_pad), bool)
    for i, (s, d) in enumerate(zip(src_list, dst_list)):
        n = s.shape[1]
        assert n <= n_pad
        src[i, :, :n] = s
        dst[i, :, :n] = d
        valid[i, :n] = True
    return src, dst, valid


@functools.partial(jax.jit, static_argnames=("params", "use_matmul_norms"))
def solve_batch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    valid: Optional[jnp.ndarray] = None,
    use_matmul_norms: bool = False,
) -> PipelineSolution:
    """Jitted vmapped solve of a (B, 3, N) problem batch.

    Inlier selection must be a device mode (NONE / KCORE_HEU / PMC_HEU).
    """
    fn = lambda s, d, v: register_pair(
        s, d, params, valid=v, use_matmul_norms=use_matmul_norms
    )
    if valid is None:
        return jax.vmap(lambda s, d: fn(s, d, None))(src, dst)
    return jax.vmap(fn)(src, dst, valid)


def solve_batch_sharded(
    src,
    dst,
    params: RobustRegistrationSolverParams,
    mesh: Mesh,
    valid=None,
    batch_axis: str = "batch",
    use_matmul_norms: bool = False,
) -> PipelineSolution:
    """Batch solve with the batch axis sharded across mesh devices.

    Data-parallel scaling path: each device solves its shard of independent
    problems; no cross-device communication is needed, so throughput scales
    linearly over ICI and DCN alike.
    """
    sharding = NamedSharding(mesh, P(batch_axis))
    src = jax.device_put(jnp.asarray(src), sharding)
    dst = jax.device_put(jnp.asarray(dst), sharding)
    if valid is not None:
        valid = jax.device_put(jnp.asarray(valid), sharding)
    return solve_batch(src, dst, params, valid, use_matmul_norms)
