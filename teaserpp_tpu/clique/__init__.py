"""Consistency-graph and maximum-clique inlier selection.

TPU-native replacements for reference graph.{h,cc} + the external PMC library:

  * dense boolean adjacency built on device from the scale-inlier pair mask;
  * core numbers via vectorized batch peeling (MXU matvec per round);
  * heuristic max clique via parallel greedy expansion from many seeds;
  * exact max clique via our own native C++ branch-and-bound with greedy
    coloring bounds (clique/native/maxclique.cc), reached through ctypes.
"""

from teaserpp_tpu.clique.graph import Graph, MaxCliqueSolver, adjacency_from_pair_mask
from teaserpp_tpu.clique.kcore import core_numbers, max_kcore_mask
from teaserpp_tpu.clique.heuristic import heuristic_max_clique
from teaserpp_tpu.clique.exact import exact_max_clique

__all__ = [
    "Graph",
    "MaxCliqueSolver",
    "adjacency_from_pair_mask",
    "core_numbers",
    "max_kcore_mask",
    "heuristic_max_clique",
    "exact_max_clique",
]
