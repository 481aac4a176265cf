"""Heuristic maximum clique via parallel greedy expansion, fully on device.

Our analog of PMC's heuristic finder (reference graph.cc:89-91): the
reference greedily expands from high-core vertices with one CPU thread per
seed; here ``num_seeds`` expansions run as one vmapped while_loop, each step
choosing the candidate with the highest core number (one masked argmax per
step), and the largest resulting clique wins. Seeds are the ``num_seeds``
highest-core vertices, so at high outlier rates (sparse TRIM graphs with a
dominant true-inlier clique) this recovers the same clique the reference's
heuristic finds.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from teaserpp_tpu.clique.kcore import core_numbers


class HeuristicCliqueResult(NamedTuple):
    mask: jnp.ndarray  # (N,) bool membership of the best clique found
    size: jnp.ndarray  # scalar int32
    max_core: jnp.ndarray  # scalar int32 (clique upper bound is max_core + 1)
    core: jnp.ndarray  # (N,) int32 core numbers (reused by callers)


def _greedy_from_seed(
    seed: jnp.ndarray,
    adj: jnp.ndarray,
    score: jnp.ndarray,
    skip: jnp.ndarray,
):
    """Grow one clique greedily from ``seed`` by repeated best-candidate picks.

    ``skip`` (scalar bool) empties the initial candidate set so the while_loop
    terminates immediately — under vmap this is how a problem whose k-core
    shortcut already decided the answer avoids paying for the serial greedy
    expansion of its batch neighbors (reference graph.cc:66-81 returns early
    on the host; a traced program cannot, but a zero-trip loop is just as
    cheap when every lane skips).
    """
    n = adj.shape[-1]
    member0 = jnp.zeros((n,), bool).at[seed].set(True)
    cand0 = adj[seed] & jnp.logical_not(skip)

    def cond(state):
        member, cand = state
        del member
        return jnp.any(cand)

    def body(state):
        member, cand = state
        neg = jnp.asarray(-1, jnp.int32)
        pick = jnp.argmax(jnp.where(cand, score, neg))
        member = member.at[pick].set(True)
        cand = cand & adj[pick]
        return member, cand

    member, _ = jax.lax.while_loop(cond, body, (member0, cand0))
    return member


def heuristic_max_clique(
    adj: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    num_seeds: int = 64,
    skip: Optional[jnp.ndarray] = None,
    core: Optional[jnp.ndarray] = None,
) -> HeuristicCliqueResult:
    """Best clique over ``num_seeds`` parallel greedy expansions.

    Args:
      adj: (N, N) bool symmetric adjacency, zero diagonal.
      valid: optional (N,) vertex validity mask (padding support).
      num_seeds: number of high-core seed vertices to expand from.
      skip: optional scalar bool — when True the greedy loops run zero
        iterations and the result mask is meaningless (the caller's k-core
        shortcut supplies the answer; see ``device_clique_from_adjacency``).
      core: optional precomputed core numbers (avoids a second k-core peel
        when the caller already ran one).
    """
    n = adj.shape[-1]
    if valid is not None:
        vcol = jnp.asarray(valid).astype(bool)
        adj = adj & vcol[None, :] & vcol[:, None]
    if core is None:
        core = core_numbers(adj, valid)
    max_core = jnp.max(core)
    num_seeds = min(num_seeds, n)
    if skip is None:
        skip = jnp.zeros((), bool)

    # Seeds: the num_seeds highest-core vertices (ties broken by index).
    seeds = jnp.argsort(-core, stable=True)[:num_seeds].astype(jnp.int32)
    members = jax.vmap(_greedy_from_seed, in_axes=(0, None, None, None))(
        seeds, adj, core, skip
    )
    sizes = jnp.sum(members, axis=-1).astype(jnp.int32)
    best = jnp.argmax(sizes)
    mask = members[best]
    if valid is not None:
        mask = mask & valid
    return HeuristicCliqueResult(
        mask=mask, size=sizes[best], max_core=max_core, core=core
    )
