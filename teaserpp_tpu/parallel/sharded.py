"""Sharded single-problem registration: the O(N^2) consistency structure
distributed over a device mesh.

This is the framework's analog of context/model parallelism (SURVEY.md §2.5,
§5): for a 100K-correspondence problem the N x N pair grid (TRIM tests,
adjacency, k-core degrees) no longer fits one chip, so its *row* dimension is
sharded over the mesh's ``pairs`` axis. Points (3 x N) are tiny and stay
replicated; XLA turns the row-blocked distance einsum into local matmuls and
inserts psum/all-reduce collectives for the global reductions (degree sums,
min-degree, argmax) exactly where the sharding annotations demand — the
scaling-book recipe, no hand-written collectives needed.

Pipeline for a huge known-scale problem:
  1. dense TRIM adjacency, rows sharded over ``pairs``       [O(N^2) compute]
  2. k-core peeling on the sharded adjacency                 [matvec rounds]
  3. top-K core vertices -> gather a small dense subgraph    [all-gather]
  4. greedy clique on the replicated subgraph
  5. chain-TIM GNC rotation + TLS translation over the clique mask
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from teaserpp_tpu.params import RobustRegistrationSolverParams
from teaserpp_tpu.solvers.pipeline import (
    PipelineSolution,
    rotation_translation_stage,
)
from teaserpp_tpu.clique.kcore import (
    core_numbers,
    max_core_from_bits,
    pack_bits_u32,
)
from teaserpp_tpu.clique.heuristic import heuristic_max_clique
from teaserpp_tpu.ops.tims import trim_adjacency_bits


# Re-exported from ops.tims (shared with the fused pipeline); kept here for
# API stability — this is the row-shardable building block: with the output
# constrained to P('pairs', None), XLA computes each row block locally from
# the replicated point sets.
from teaserpp_tpu.ops.tims import trim_adjacency_dense  # noqa: E402,F401


class LargeSolveResult(NamedTuple):
    solution: PipelineSolution
    max_core: jnp.ndarray
    clique_size: jnp.ndarray


def _large_registration_impl(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    params: RobustRegistrationSolverParams,
    subgraph_size: int,
    pairs_sharding,
    blocked_threshold: int = 16384,
) -> LargeSolveResult:
    n = src.shape[-1]
    if n > blocked_threshold:
        # Huge N: row-blocked adjacency emitted straight into the packed
        # bitset — the dense path's two N^2 f32 distance fields (20 GB at
        # N=50K) never exist. Columns (lane dim) shard over ``pairs``.
        # Only the TOP core is needed for candidate selection, so the
        # level-by-level peel (one pass per degeneracy level, ~600 at
        # N=100K) is replaced by the binary-search max-core (~40x fewer
        # bitset passes); ranking falls back to degree for the tail slots.
        adj_bits = _adjacency_bits_fast(src, dst, params, pairs_sharding)
        if pairs_sharding is not None:
            adj_bits = jax.lax.with_sharding_constraint(adj_bits, pairs_sharding)
        top_mask, max_core = max_core_from_bits(adj_bits, n)
        act_bits = pack_bits_u32(jnp.ones((n,), bool))
        deg0 = jnp.sum(
            jax.lax.population_count(adj_bits & act_bits[:, None]), axis=-2
        ).astype(jnp.int32)
        score = jnp.where(top_mask, deg0 + n, deg0)
    else:
        adj = trim_adjacency_dense(src, dst, params.noise_bound, params.cbar2)
        if pairs_sharding is not None:
            adj = jax.lax.with_sharding_constraint(adj, pairs_sharding)
        core = core_numbers(adj)  # sharded rounds + all-reduce min/max
        max_core = jnp.max(core)
        score = core

    # Reduce to the densest subgraph: top-`subgraph_size` vertices by core
    # number always contain the maximum clique when subgraph_size > max_core
    # (every max-clique vertex has core >= clique_size - 1 >= all vertices
    # outside the top cores at that threshold). We take a generous static cap.
    m = min(subgraph_size, n)
    _, top_idx = jax.lax.top_k(score, m)
    # Re-derive the subgraph adjacency from the gathered POINTS rather than
    # gathering an (m, m) block out of the big matrix: identical by
    # construction (same TRIM formula on the same coordinates), and it lets
    # XLA free the O(N^2) adjacency right after the bit-packing — at N=50K
    # that plus the packed-only peel keeps the program under HBM.
    sub_adj = trim_adjacency_dense(
        src[..., :, top_idx], dst[..., :, top_idx], params.noise_bound, params.cbar2
    )
    heu = heuristic_max_clique(sub_adj, num_seeds=params.max_clique_heuristic_seeds)

    clique_mask = jnp.zeros((n,), bool).at[top_idx].set(heu.mask)
    scale = jnp.asarray(1.0, src.dtype)
    sol = rotation_translation_stage(src, dst, scale, clique_mask, params)
    return LargeSolveResult(
        solution=sol, max_core=max_core, clique_size=jnp.sum(clique_mask)
    )


@functools.partial(
    jax.jit,
    static_argnames=("params", "subgraph_size", "pairs_sharding", "blocked_threshold"),
)
def _large_registration_jit(
    src, dst, params, subgraph_size, pairs_sharding, blocked_threshold=16384
):
    return _large_registration_impl(
        src, dst, params, subgraph_size, pairs_sharding, blocked_threshold
    )


def _adjacency_bits_fast(src, dst, params, pairs_sharding):
    """Row-packed TRIM bitset, picking the fastest single-chip builder.

    The fused Pallas stripe kernel beats the ``lax.map`` XLA path by ~1.25x
    at N=100K on a v5e chip (scripts/tune_adj_pallas.py) but is a
    single-device kernel: the SPMD partitioner cannot split a ``pallas_call``
    along the sharded column axis, so any multi-device (``pairs_sharding``)
    run and every non-TPU backend stays on the XLA path.
    """
    n = src.shape[-1]
    if pairs_sharding is None and n >= 65536 and jax.default_backend() in (
        "tpu", "axon",
    ):
        import math

        from teaserpp_tpu.ops.pallas_kernels import trim_adjacency_bits_pallas

        beta = 2.0 * params.noise_bound * math.sqrt(params.cbar2)
        return trim_adjacency_bits_pallas(
            src.astype(jnp.float32), dst.astype(jnp.float32), beta
        )
    return trim_adjacency_bits(src, dst, params.noise_bound, params.cbar2)


@functools.partial(
    jax.jit, static_argnames=("params", "pairs_sharding")
)
def _kcore_prune_jit(src, dst, params, k, pairs_sharding):
    """(lb-1)-core survivor mask of the TRIM graph, bitset path, sharded."""
    from teaserpp_tpu.clique.kcore import kcore_mask_from_bits

    n = src.shape[-1]
    adj_bits = _adjacency_bits_fast(src, dst, params, pairs_sharding)
    if pairs_sharding is not None:
        adj_bits = jax.lax.with_sharding_constraint(adj_bits, pairs_sharding)
    return kcore_mask_from_bits(adj_bits, n, k)


@functools.partial(jax.jit, static_argnames=("params",))
def _sub_adjacency_bits_jit(src_sel, dst_sel, params):
    return trim_adjacency_bits(src_sel, dst_sel, params.noise_bound, params.cbar2)


def _unpack_bits_rows(bits, n: int):
    """Host unpack of the (W, N) uint32 row-packed layout -> (N, N) bool."""
    import numpy as np

    b = np.asarray(bits)  # (W, N)
    bytes_ = b.view(np.uint8).reshape(b.shape[0], b.shape[1], 4)
    # little-endian words: byte order within a word is LSB-first
    rows = np.unpackbits(
        bytes_, axis=-1, bitorder="little"
    )  # (W, N, 32)
    rows = np.moveaxis(rows, -1, 1).reshape(b.shape[0] * 32, b.shape[1])
    return rows[:n].astype(bool)


def solve_large_exact(
    src,
    dst,
    params: RobustRegistrationSolverParams,
    mesh: Optional[Mesh] = None,
    pairs_axis: str = "pairs",
    time_limit: float = 3600.0,
    num_threads: int = 0,
) -> LargeSolveResult:
    """Known-scale registration with a PROVABLY exact maximum clique at huge N.

    The reference's PMC_EXACT tops out at its dense ``adj_limit`` = 20000
    vertices (graph.cc:114-121, sparse ``search`` beyond); this path is exact
    at any N the chip can build the TRIM bitset for:

      1. heuristic device solve -> genuine clique of size ``lb`` (lower bound);
      2. device (lb-1)-core fixpoint on the bitset adjacency — every vertex
         of a maximum clique has core >= clique_size - 1 >= lb - 1, so the
         survivors provably contain every maximum clique;
      3. host exact branch-and-bound on the (small) survivor subgraph, dense
         bitset or sparse CSR depending on survivor count;
      4. device rotation/translation stages over the exact clique mask.

    Returns a LargeSolveResult whose clique_mask is the exact maximum clique.
    """
    import numpy as np

    from teaserpp_tpu.clique import exact as _exact

    sharding = None
    if mesh is not None:
        sharding = NamedSharding(mesh, P(pairs_axis, None))
        replicated = NamedSharding(mesh, P())
        src = jax.device_put(jnp.asarray(src), replicated)
        dst = jax.device_put(jnp.asarray(dst), replicated)
    else:
        src = jnp.asarray(src)
        dst = jnp.asarray(dst)

    n = src.shape[-1]
    # 1. heuristic lower bound (greedy clique is a genuine clique)
    heu_res = _large_registration_jit(src, dst, params, 2048, sharding)
    lb = int(heu_res.clique_size)

    # 2. provably safe pruning to the (lb-1)-core
    survivors = np.asarray(
        _kcore_prune_jit(src, dst, params, jnp.asarray(lb - 1, jnp.int32), sharding)
    )
    idx = np.nonzero(survivors)[0]
    m = len(idx)
    if m == 0:
        return heu_res

    # 3. exact search on the survivor subgraph (adjacency re-derived from the
    # gathered points on device, fetched as packed bits: m^2/8 bytes)
    idx_j = jnp.asarray(idx, jnp.int32)
    sub_bits = _sub_adjacency_bits_jit(
        src[..., :, idx_j], dst[..., :, idx_j], params
    )
    sub_adj = _unpack_bits_rows(sub_bits, m)
    if m < 20000:  # reference PMC adj_limit (graph.cc:43)
        clique_local, timed_out = _exact.exact_max_clique(
            sub_adj, time_limit=time_limit, num_threads=num_threads
        )
    else:
        indptr, indices = _exact.adjacency_to_csr(sub_adj)
        clique_local, timed_out = _exact.exact_max_clique_sparse(
            indptr, indices, m, time_limit=time_limit, num_threads=num_threads
        )
    del timed_out  # best-so-far degradation, PMC semantics
    clique_idx = idx[np.asarray(clique_local, dtype=np.int64)]
    clique_mask = np.zeros(n, bool)
    clique_mask[clique_idx] = True

    # 4. rotation/translation over the exact clique
    sol = _rt_stage_jit(src, dst, jnp.asarray(clique_mask), params)
    return LargeSolveResult(
        solution=sol,
        max_core=heu_res.max_core,
        clique_size=jnp.asarray(int(clique_mask.sum()), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("params",))
def _rt_stage_jit(src, dst, clique_mask, params):
    scale = jnp.asarray(1.0, src.dtype)
    return rotation_translation_stage(src, dst, scale, clique_mask, params)


def solve_large_sharded(
    src,
    dst,
    params: RobustRegistrationSolverParams,
    mesh: Mesh,
    pairs_axis: str = "pairs",
    subgraph_size: int = 2048,
    blocked_threshold: int = 16384,
) -> LargeSolveResult:
    """Known-scale registration with the O(N^2) structure sharded over ``mesh``.

    ``src``/``dst`` are (3, N) with N typically 10K-100K; the adjacency and
    k-core stages run row-sharded over the ``pairs_axis`` devices.

    ``subgraph_size`` caps the clique candidate set: when the true inlier set
    is larger (e.g. 5000 inliers at N=50K), the clique is truncated to the
    top ``subgraph_size`` core vertices — GNC only needs a clean subset, so
    accuracy is unaffected (measured 0.000 deg at N=50K), but raise it if the
    full inlier list itself is wanted.
    """
    sharding = NamedSharding(mesh, P(pairs_axis, None))
    replicated = NamedSharding(mesh, P())
    src = jax.device_put(jnp.asarray(src), replicated)
    dst = jax.device_put(jnp.asarray(dst), replicated)
    return _large_registration_jit(
        src, dst, params, subgraph_size, sharding, blocked_threshold
    )
