"""Batched and sharded execution tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from teaserpp_tpu.params import (
    InlierSelectionMode,
    RobustRegistrationSolverParams,
)
from teaserpp_tpu.parallel import (
    pad_problems,
    solve_batch,
    solve_batch_sharded,
    solve_large_sharded,
    trim_adjacency_dense,
)
from teaserpp_tpu.solvers.pipeline import register_pair, scale_stage
from teaserpp_tpu.clique.graph import adjacency_from_pair_mask
from teaserpp_tpu.utils.metrics import angular_error, translation_error

from conftest import make_registration_problem


PARAMS = RobustRegistrationSolverParams(
    noise_bound=0.01,
    estimate_scaling=False,
    inlier_selection_mode=InlierSelectionMode.PMC_HEU,
    max_clique_heuristic_seeds=16,
)


def _make_batch(rng, b, n, outlier_ratio=0.6):
    srcs, dsts, rs, ts = [], [], [], []
    for _ in range(b):
        src, dst, s, r, t, _ = make_registration_problem(
            rng, n=n, outlier_ratio=outlier_ratio
        )
        srcs.append(src)
        dsts.append(dst)
        rs.append(r)
        ts.append(t)
    return np.stack(srcs), np.stack(dsts), rs, ts


def test_solve_batch_matches_single(rng):
    src, dst, rs, ts = _make_batch(rng, 4, 96)
    out = solve_batch(jnp.asarray(src), jnp.asarray(dst), PARAMS)
    for i in range(4):
        single = register_pair(jnp.asarray(src[i]), jnp.asarray(dst[i]), PARAMS)
        assert np.allclose(
            np.asarray(out.rotation[i]), np.asarray(single.rotation), atol=1e-8
        )
        assert np.allclose(
            np.asarray(out.translation[i]), np.asarray(single.translation), atol=1e-8
        )
        assert angular_error(np.asarray(out.rotation[i]), rs[i]) < 0.01
        assert translation_error(np.asarray(out.translation[i]), ts[i]) < 0.02


def test_solve_batch_sharded_matches_unsharded(rng):
    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("batch", "pairs"))
    src, dst, _, _ = _make_batch(rng, 8, 64)
    plain = solve_batch(jnp.asarray(src), jnp.asarray(dst), PARAMS)
    sharded = solve_batch_sharded(src, dst, PARAMS, mesh, batch_axis="batch")
    assert np.allclose(
        np.asarray(plain.rotation), np.asarray(sharded.rotation), atol=1e-10
    )
    assert np.allclose(
        np.asarray(plain.translation), np.asarray(sharded.translation), atol=1e-10
    )


def test_pad_problems_with_mixed_sizes(rng):
    sizes = [50, 70, 64]
    problems = [
        make_registration_problem(rng, n=n, outlier_ratio=0.4) for n in sizes
    ]
    src, dst, valid = pad_problems(
        [p[0] for p in problems], [p[1] for p in problems]
    )
    assert src.shape == dst.shape == (3, 3, 128)
    assert valid.sum() == sum(sizes)
    out = solve_batch(jnp.asarray(src), jnp.asarray(dst), PARAMS, jnp.asarray(valid))
    for i, (s, d, sc, r, t, _) in enumerate(problems):
        assert angular_error(np.asarray(out.rotation[i]), r) < 0.01
        assert translation_error(np.asarray(out.translation[i]), t) < 0.02


def test_trim_adjacency_matches_pair_mask_scatter(rng):
    src, dst, s, r, t, _ = make_registration_problem(rng, n=60, outlier_ratio=0.5)
    sc = scale_stage(jnp.asarray(src), jnp.asarray(dst), PARAMS)
    adj_scatter = np.asarray(adjacency_from_pair_mask(sc.pair_mask, 60))
    adj_dense = np.asarray(
        trim_adjacency_dense(jnp.asarray(src), jnp.asarray(dst), PARAMS.noise_bound)
    )
    assert np.array_equal(adj_scatter, adj_dense)


def test_solve_large_sharded_recovers_transform(rng):
    devices = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devices, ("batch", "pairs"))
    src, dst, s, r, t, _ = make_registration_problem(rng, n=256, outlier_ratio=0.8)
    res = solve_large_sharded(
        src, dst, PARAMS, mesh, pairs_axis="pairs", subgraph_size=128
    )
    assert bool(res.solution.valid)
    assert angular_error(np.asarray(res.solution.rotation), r) < 0.01
    assert translation_error(np.asarray(res.solution.translation), t) < 0.02
    # the recovered clique should be (close to) the true inlier count
    assert int(res.clique_size) >= 0.3 * 256 * 0.2


def test_full_pipeline_sharded_end_to_end(rng):
    """The ENTIRE pipeline multi-device on the 8-device virtual mesh:
    grid-hash FPFH descriptors (query blocks sharded), exact-NN matcher,
    row-sharded robust solve — the e2e composition the TPU bench runs,
    here as a mesh integration test (each piece is also pinned
    individually; this pins that they compose)."""
    from teaserpp_tpu.features import FPFHEstimation, Matcher

    m = 48  # 2304-point wavy surface (grid path forced; auto needs 8192)
    xs, ys = np.meshgrid(np.linspace(-1, 1, m), np.linspace(-1, 1, m))
    zs = 0.3 * np.sin(2.5 * xs) * np.cos(1.5 * ys) + 0.1 * np.sin(5 * xs * ys)
    src_pts = np.stack([xs.ravel(), ys.ravel(), zs.ravel() + 3.0], axis=1)
    src_pts = src_pts + rng.normal(scale=0.002, size=src_pts.shape)
    angle = 0.2
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    kx = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    r = np.eye(3) + np.sin(angle) * kx + (1 - np.cos(angle)) * (kx @ kx)
    t = np.array([0.3, -0.2, 0.15])
    dst_pts = src_pts @ r.T + t

    feat_mesh = Mesh(np.array(jax.devices()), ("blocks",))
    fp = FPFHEstimation(neighbor_mode="grid", mesh=feat_mesh)
    sd = fp.computeFPFHFeatures(src_pts, 0.25, 0.4)
    dd = fp.computeFPFHFeatures(dst_pts, 0.25, 0.4)
    corr = Matcher().calculateCorrespondences(
        src_pts, dst_pts, sd, dd, False, True, False, 0.0
    )
    assert len(corr) > 500
    ci = np.asarray([c[0] for c in corr])
    cj = np.asarray([c[1] for c in corr])

    solve_mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 8),
                      ("batch", "pairs"))
    res = solve_large_sharded(
        np.ascontiguousarray(src_pts[ci].T.astype(np.float32)),
        np.ascontiguousarray(dst_pts[cj].T.astype(np.float32)),
        PARAMS,
        solve_mesh,
        pairs_axis="pairs",
        subgraph_size=256,
    )
    assert bool(res.solution.valid)
    assert angular_error(np.asarray(res.solution.rotation), r) < 0.02
    assert translation_error(np.asarray(res.solution.translation), t) < 0.02


def test_graft_entry_and_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (3, 3)
    g.dryrun_multichip(8)


def test_large_sharded_blocked_bits_path_on_mesh(rng):
    """The row-blocked bitset pipeline (huge-N path) under an 8-device mesh:
    must match the dense path's solution on the same problem."""
    import jax
    from jax.sharding import Mesh
    from teaserpp_tpu.parallel.sharded import solve_large_sharded

    n = 512
    src, dst, s, r_true, t_true, _ = make_registration_problem(
        rng, n=n, outlier_ratio=0.8, noise=0.005
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.01,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )
    mesh = Mesh(np.array(jax.devices()), ("pairs",))
    dense = solve_large_sharded(src, dst, params, mesh, subgraph_size=256)
    blocked = solve_large_sharded(
        src, dst, params, mesh, subgraph_size=256, blocked_threshold=64
    )
    assert int(blocked.max_core) == int(dense.max_core)
    np.testing.assert_allclose(
        np.asarray(blocked.solution.rotation),
        np.asarray(dense.solution.rotation),
        atol=1e-5,
    )
    cos = (np.trace(r_true.T @ np.asarray(blocked.solution.rotation, np.float64)) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5


def test_solve_large_exact_recovers_exact_inlier_clique(rng):
    """solve_large_exact: heuristic LB -> (lb-1)-core prune -> host exact
    B&B -> exact clique mask. On a planted problem the exact maximum clique
    IS the true inlier set (all inliers are mutually TRIM-consistent and
    dominate any outlier clique)."""
    from teaserpp_tpu.parallel.sharded import solve_large_exact

    n = 512
    src, dst, s, r_true, t_true, _ = make_registration_problem(
        rng, n=n, outlier_ratio=0.85, noise=0.0005
    )
    params = RobustRegistrationSolverParams(
        noise_bound=0.002,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )
    mesh = Mesh(np.array(jax.devices()), ("pairs",))
    res = solve_large_exact(src, dst, params, mesh, num_threads=2)
    assert bool(res.solution.valid)
    assert angular_error(np.asarray(res.solution.rotation), r_true) < 0.05
    assert translation_error(np.asarray(res.solution.translation), t_true) < 0.01
    # exact clique must be at least the heuristic's (it is provably maximum)
    heu = solve_large_sharded(src, dst, params, mesh, subgraph_size=256)
    assert int(res.clique_size) >= int(heu.clique_size)
