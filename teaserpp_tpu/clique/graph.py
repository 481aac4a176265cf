"""Host-side graph API and the max-clique solver facade.

``Graph`` mirrors the reference's adjacency-list container (graph.h:29-207)
for API familiarity; ``MaxCliqueSolver`` mirrors the facade of graph.cc:12-125
— mode dispatch, k-core upper bound, heuristic lower bound, optional exact
search, and the lb==ub shortcut — but routes to our device kernels
(kcore/heuristic) and our native C++ branch-and-bound (exact) instead of PMC.

``adjacency_from_pair_mask`` is the device-side bridge from the scale stage:
it scatters the K-vector TIM inlier mask into a dense symmetric (N, N) bool
adjacency (reference equivalent: the edge-insert loop at registration.cc:614-619).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu.params import CliqueSolverMode, MaxCliqueSolverParams
from teaserpp_tpu.ops.tims import upper_tri_indices
from teaserpp_tpu.clique import exact as _exact
from teaserpp_tpu.clique.heuristic import heuristic_max_clique
from teaserpp_tpu.clique.kcore import core_numbers


def adjacency_from_pair_mask(pair_mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Scatter a K = n(n-1)/2 upper-triangle pair mask into (n, n) bool adjacency."""
    i_idx, j_idx = upper_tri_indices(n)
    adj = jnp.zeros((n, n), bool).at[i_idx, j_idx].set(pair_mask)
    return adj | adj.T


class Graph:
    """Undirected graph over measurement indices (reference graph.h:29-207).

    Backed by a dense numpy bool adjacency; the reference used
    vector<vector<int>> adjacency lists, but every consumer here ultimately
    wants the dense matrix (device kernels, bitset packing), so dense is the
    native representation and the list API is a view.
    """

    def __init__(self, adj: Optional[np.ndarray] = None):
        if adj is None:
            self._adj = np.zeros((0, 0), dtype=bool)
        else:
            adj = np.asarray(adj, dtype=bool)
            assert adj.ndim == 2 and adj.shape[0] == adj.shape[1]
            self._adj = adj.copy()
            np.fill_diagonal(self._adj, False)

    def populateVertices(self, num_vertices: int) -> None:
        """Resize to ``num_vertices`` vertices (reference graph.h:67)."""
        n_old = self._adj.shape[0]
        if num_vertices <= n_old:
            self._adj = self._adj[:num_vertices, :num_vertices].copy()
            return
        grown = np.zeros((num_vertices, num_vertices), dtype=bool)
        grown[:n_old, :n_old] = self._adj
        self._adj = grown

    def numVertices(self) -> int:
        return self._adj.shape[0]

    def numEdges(self) -> int:
        return int(self._adj.sum()) // 2

    def addVertex(self, v: int) -> None:
        if v >= self.numVertices():
            self.populateVertices(v + 1)

    def addEdge(self, u: int, v: int) -> None:
        self._adj[u, v] = True
        self._adj[v, u] = True

    def removeEdge(self, u: int, v: int) -> None:
        self._adj[u, v] = False
        self._adj[v, u] = False

    def hasEdge(self, u: int, v: int) -> bool:
        return bool(self._adj[u, v])

    def hasVertex(self, v: int) -> bool:
        return 0 <= v < self.numVertices()

    def getVertices(self) -> List[int]:
        return list(range(self.numVertices()))

    def getEdges(self, v: int) -> List[int]:
        return np.nonzero(self._adj[v])[0].tolist()

    def getAdjMatrix(self) -> np.ndarray:
        """Dense adjacency matrix export (reference graph.h:158)."""
        return self._adj.copy()

    @classmethod
    def from_edges(cls, num_vertices: int, edges: Sequence) -> "Graph":
        g = cls()
        g.populateVertices(num_vertices)
        for u, v in edges:
            g.addEdge(u, v)
        return g


class MaxCliqueSolver:
    """Max-clique facade (reference graph.cc:12-125 / graph.h:212-290)."""

    CLIQUE_SOLVER_MODE = CliqueSolverMode  # reference-style nested enum alias

    def __init__(self, params: Optional[MaxCliqueSolverParams] = None):
        self.params = params or MaxCliqueSolverParams()

    def findMaxClique(self, graph: Graph) -> List[int]:
        adj = graph.getAdjMatrix()
        n = adj.shape[0]
        if n == 0:
            return []
        mode = self.params.solver_mode

        if mode == CliqueSolverMode.PMC_EXACT:
            # The native branch-and-bound computes its own k-core bounds and
            # greedy lower bound internally (the reference runs PMC's
            # compute_cores + pmc_heu first, graph.cc:58-91; ours fuses them).
            clique, _timed_out = _exact.exact_max_clique(
                adj,
                time_limit=self.params.time_limit,
                num_threads=self.params.num_threads,
            )
            return sorted(clique)

        adj_dev = jnp.asarray(adj)
        if mode == CliqueSolverMode.KCORE_HEU:
            core = np.asarray(core_numbers(adj_dev))
            max_core = int(core.max()) if n else 0
            # KCORE_HEU short-circuit: if the max core is a large enough
            # fraction of the vertex count, return the top k-core
            # (reference graph.cc:66-81).
            if (
                self.params.kcore_heuristic_threshold != 1
                and max_core > self.params.kcore_heuristic_threshold * n
            ):
                return [int(v) for v in np.nonzero(core >= max_core)[0]]

        # Heuristic answer (reference graph.cc:89-91).
        heu = heuristic_max_clique(
            adj_dev, num_seeds=self.params.heuristic_num_seeds
        )
        return [int(v) for v in np.nonzero(np.asarray(heu.mask))[0]]
