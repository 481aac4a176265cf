"""I/O round trips (io-test.cc analog) and utility helper parity (utils-test.cc)."""

import os

import numpy as np
import pytest

from teaserpp_tpu.io.ply import PLYReader, PLYWriter, read_ply, write_ply
from teaserpp_tpu.io.pcd import read_pcd
from teaserpp_tpu.utils.geometry import PointCloud, PointXYZ
from teaserpp_tpu.utils.helpers import (
    find_nonzero,
    mask_vector,
    random_sample,
    remove_column,
    remove_row,
)

from conftest import REFERENCE_DATA


def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.normal(size=(123, 3))
    cloud = PointCloud(pts)
    path = str(tmp_path / "c.ply")
    assert write_ply(path, cloud, binary=True) == 0
    loaded = read_ply(path)
    assert np.allclose(loaded.points, pts, atol=1e-6)  # float32 storage


def test_ply_roundtrip_ascii(tmp_path, rng):
    pts = rng.normal(size=(37, 3))
    path = str(tmp_path / "c.ply")
    assert write_ply(path, PointCloud(pts), binary=False) == 0
    loaded = read_ply(path)
    assert np.allclose(loaded.points, pts, atol=1e-5)


def test_ply_reader_writer_facades(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    path = str(tmp_path / "c.ply")
    assert PLYWriter().write(path, PointCloud(pts)) == 0
    out = PointCloud()
    assert PLYReader().read(path, out) == 0
    assert np.allclose(out.points, pts, atol=1e-6)
    assert PLYReader().read(str(tmp_path / "missing.ply"), out) == -1


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="no reference data")
def test_read_reference_plys():
    for name, n in [("canstick.ply", 2101), ("cube.ply", None)]:
        cloud = read_ply(os.path.join(REFERENCE_DATA, name))
        assert len(cloud) > 0
        if n:
            assert len(cloud) == n
    bunny = read_ply("/root/reference/examples/example_data/bun_zipper_res3.ply")
    assert len(bunny) == 1889


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DATA), reason="no reference data")
def test_read_reference_pcd():
    cloud = read_pcd(os.path.join(REFERENCE_DATA, "bunny.pcd"))
    assert len(cloud) == 397


def test_point_cloud_container():
    c = PointCloud()
    assert c.empty() and len(c) == 0
    c.push_back(PointXYZ(1, 2, 3))
    c.push_back((4, 5, 6))
    assert c.size() == 2
    assert tuple(c.at(0)) == (1.0, 2.0, 3.0)
    assert np.allclose(c.as_matrix(), [[1, 4], [2, 5], [3, 6]])
    pts = [tuple(p) for p in c]
    assert pts == [(1, 2, 3), (4, 5, 6)]
    c.clear()
    assert c.empty()


def test_helper_parity(rng):
    m = np.arange(12).reshape(3, 4).astype(float)
    assert remove_row(m, 1).tolist() == [[0, 1, 2, 3], [8, 9, 10, 11]]
    assert remove_row(m, 7) is m  # out of range: no-op
    assert remove_column(m, 0).shape == (3, 3)
    assert remove_column(m, 9) is m
    assert find_nonzero([0, 1, 0, 1, 1]) == [1, 3, 4]
    assert mask_vector([True, False, True], ["a", "b", "c"]) == ["a", "c"]
    sample = random_sample(list(range(100)), 10, rng)
    assert len(sample) == len(set(sample)) == 10


def test_diagnostics_macros_analog(caplog):
    """Reference macros.h logging analog: levels + throttling."""
    import logging
    from teaserpp_tpu.utils import diagnostics as diag

    with caplog.at_level(logging.INFO, logger="teaserpp_tpu"):
        diag.info_msg("hello")
        for _ in range(5):
            diag.info_msg_throttle("beat", skip=2, key="t1")
    infos = [r.message for r in caplog.records if r.levelno == logging.INFO]
    assert infos.count("hello") == 1
    assert infos.count("beat") == 3  # calls 0, 2, 4

    with caplog.at_level(logging.ERROR, logger="teaserpp_tpu"):
        diag.debug_error_msg("boom")
    assert any(r.message == "boom" for r in caplog.records)
