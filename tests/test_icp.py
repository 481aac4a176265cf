"""ICP refinement tests (capability of reference example
teaser_python_fpfh_icp/example.py:67-72, open3d point-to-point ICP)."""

import numpy as np
import jax
import jax.numpy as jnp

from teaserpp_tpu.solvers.icp import icp_point_to_point
from tests.conftest import random_rotation


def _small_rotation(rng, angle):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)


def test_icp_converges_from_perturbed_init(rng):
    n = 400
    src = rng.uniform(-1, 1, size=(3, n))
    r_true = random_rotation(rng)
    t_true = np.array([0.2, -0.4, 0.1])
    dst = r_true @ src + t_true[:, None]

    r0 = _small_rotation(rng, 0.05) @ r_true
    t0 = t_true + 0.02

    res = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(dst), 0.5, r_init=jnp.asarray(r0),
        t_init=jnp.asarray(t0), max_iterations=50,
    )
    r_est = np.asarray(res.rotation)
    cos = (np.trace(r_true.T @ r_est) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.01
    assert np.linalg.norm(np.asarray(res.translation) - t_true) < 1e-3
    assert float(res.rmse) < 1e-3
    assert float(res.fitness) > 0.99


def test_icp_partial_overlap_and_padding(rng):
    """Different cloud sizes, padded + masked; outlier-free overlap refines."""
    n_src, n_dst, pad = 200, 350, 32
    src = rng.uniform(-1, 1, size=(3, n_src))
    r_true = random_rotation(rng)
    t_true = np.array([-0.1, 0.3, 0.2])
    extra = rng.uniform(2.5, 3.5, size=(3, n_dst - n_src))  # far clutter
    dst = np.concatenate([r_true @ src + t_true[:, None], extra], axis=1)

    src_p = np.concatenate([src, np.zeros((3, pad))], axis=1)
    sv = np.concatenate([np.ones(n_src, bool), np.zeros(pad, bool)])
    dst_p = np.concatenate([dst, np.zeros((3, pad))], axis=1)
    dv = np.concatenate([np.ones(n_dst, bool), np.zeros(pad, bool)])

    r0 = _small_rotation(rng, 0.04) @ r_true
    res = icp_point_to_point(
        jnp.asarray(src_p), jnp.asarray(dst_p), 0.3,
        r_init=jnp.asarray(r0), t_init=jnp.asarray(t_true),
        max_iterations=50, src_valid=jnp.asarray(sv), dst_valid=jnp.asarray(dv),
    )
    r_est = np.asarray(res.rotation)
    cos = (np.trace(r_true.T @ r_est) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.05
    assert np.linalg.norm(np.asarray(res.translation) - t_true) < 2e-3


def test_icp_jits_and_vmaps(rng):
    batch, n = 4, 128
    srcs = rng.uniform(-1, 1, size=(batch, 3, n))
    rs, ts, dsts = [], [], []
    for b in range(batch):
        r = random_rotation(rng)
        t = rng.normal(size=3) * 0.1
        rs.append(r)
        ts.append(t)
        dsts.append(r @ srcs[b] + t[:, None])
    dsts = np.stack(dsts)

    r0s = np.stack([_small_rotation(rng, 0.05) @ r for r in rs])
    t0s = np.stack(ts) + 0.01

    fn = jax.jit(
        jax.vmap(
            lambda s, d, r0, t0: icp_point_to_point(
                s, d, 1.0, r_init=r0, t_init=t0, max_iterations=30
            )
        )
    )
    res = fn(jnp.asarray(srcs), jnp.asarray(dsts), jnp.asarray(r0s), jnp.asarray(t0s))
    for b in range(batch):
        r_est = np.asarray(res.rotation[b])
        cos = (np.trace(rs[b].T @ r_est) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.1
        assert np.linalg.norm(np.asarray(res.translation[b]) - ts[b]) < 0.01
