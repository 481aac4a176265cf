"""Determinism guarantees (the framework's analog of race detection).

The reference relies on by-construction thread safety (SURVEY.md §5); here
the guarantee is jit purity: identical inputs must produce bitwise-identical
outputs across repeated executions, and the host solver must be repeatable.
"""

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu import (
    RobustRegistrationSolver,
    RobustRegistrationSolverParams,
    InlierSelectionMode,
)
from teaserpp_tpu.solvers.pipeline import register_pair_jit
from conftest import make_registration_problem


PARAMS = RobustRegistrationSolverParams(
    noise_bound=0.01,
    estimate_scaling=False,
    inlier_selection_mode=InlierSelectionMode.PMC_HEU,
    max_clique_heuristic_seeds=16,
)


def test_pipeline_bitwise_deterministic(rng):
    src, dst, *_ = make_registration_problem(rng, n=128, outlier_ratio=0.7)
    s = jnp.asarray(src)
    d = jnp.asarray(dst)
    a = register_pair_jit(s, d, PARAMS)
    b = register_pair_jit(s, d, PARAMS)
    for fa, fb in zip(a, b):
        assert np.array_equal(np.asarray(fa), np.asarray(fb)), "nondeterministic output"


def test_host_solver_repeatable(rng):
    src, dst, *_ = make_registration_problem(rng, n=80, outlier_ratio=0.5)
    params = PARAMS.replace(inlier_selection_mode=InlierSelectionMode.PMC_EXACT)
    s1 = RobustRegistrationSolver(params).solve(src, dst)
    s2 = RobustRegistrationSolver(params).solve(src, dst)
    assert np.array_equal(s1.rotation, s2.rotation)
    assert np.array_equal(s1.translation, s2.translation)
    assert s1.scale == s2.scale


def test_stage_timings_collected(rng):
    src, dst, *_ = make_registration_problem(rng, n=60, outlier_ratio=0.4)
    solver = RobustRegistrationSolver(
        PARAMS.replace(inlier_selection_mode=InlierSelectionMode.PMC_EXACT)
    )
    solver.solve(src, dst)
    timings = solver.getStageTimings()
    assert set(timings) == {"scale", "clique", "rotation_translation"}
    assert all(v >= 0 for v in timings.values())
