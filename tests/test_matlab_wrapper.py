"""MATLAB front-end contract test.

matlab/teaser_solve.m shells out to ``python -m teaserpp_tpu.cli`` with a
fixed flag set and parses the JSON line the CLI prints. No MATLAB runtime
exists in CI, so this harness emulates the wrapper's exact round-trip: it
writes the same binary-little-endian PLY layout the .m writer emits, builds
the same argv the sprintf in teaser_solve.m produces, and checks the JSON
contract fields the .m consumes (scale / rotation / translation /
time_taken) plus solution accuracy.
"""

import json
import struct

import numpy as np

from teaserpp_tpu import cli
from tests.conftest import random_rotation


def _write_ply_matlab_style(path, pts):
    """Byte-for-byte the PLY layout of teaser_solve.m's write_ply helper."""
    n = pts.shape[1]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        # MATLAB fwrite(fid, single(pts), 'single') streams column-major =
        # point-by-point xyz, which is exactly the PLY vertex record order.
        f.write(struct.pack(f"<{3 * n}f", *pts.T.reshape(-1).tolist()))


def _matlab_argv(src_path, dst_path, **opts):
    """The argv teaser_solve.m's sprintf constructs (defaults of the .m)."""
    rot_algs = ["GNC_TLS", "FGR", "QUATRO"]
    sel_modes = ["PMC_EXACT", "PMC_HEU", "KCORE_HEU", "NONE"]
    o = dict(
        Cbar2=1.0,
        NoiseBound=0.03,
        EstimateScaling=True,
        RotationEstimationAlgorithm=0,
        RotationGNCFactor=1.4,
        RotationMaxIterations=100,
        RotationCostThreshold=0.005,
        InlierSelectionAlgorithm=0,
        KCoreHeuThreshold=0.5,
    )
    o.update(opts)
    argv = [
        "--src", str(src_path),
        "--dst", str(dst_path),
        "--noise-bound", repr(o["NoiseBound"]),
        "--cbar2", repr(o["Cbar2"]),
        "--rotation-estimation-algorithm", rot_algs[o["RotationEstimationAlgorithm"]],
        "--rotation-gnc-factor", repr(o["RotationGNCFactor"]),
        "--rotation-max-iterations", str(o["RotationMaxIterations"]),
        "--rotation-cost-threshold", repr(o["RotationCostThreshold"]),
        "--inlier-selection-mode", sel_modes[o["InlierSelectionAlgorithm"]],
        "--kcore-heuristic-threshold", repr(o["KCoreHeuThreshold"]),
    ]
    if o["EstimateScaling"]:
        argv.append("--estimate-scaling")
    return argv


def test_matlab_wrapper_roundtrip(tmp_path, rng, capsys):
    n = 60
    src = rng.uniform(-1, 1, size=(3, n))
    r_true = random_rotation(rng)
    t_true = np.array([0.3, -0.1, 0.25])
    s_true = 1.7
    dst = s_true * r_true @ src + t_true[:, None]
    out_idx = rng.choice(n, size=12, replace=False)
    dst[:, out_idx] = rng.uniform(-4, 4, size=(3, 12))

    src_path = tmp_path / "src.ply"
    dst_path = tmp_path / "dst.ply"
    _write_ply_matlab_style(src_path, src)
    _write_ply_matlab_style(dst_path, dst)

    rc = cli.main(_matlab_argv(src_path, dst_path, NoiseBound=0.01))
    assert rc == 0
    # last non-empty stdout line is the JSON object, as the .m assumes
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    result = json.loads(lines[-1])

    for key in ("scale", "rotation", "translation", "time_taken", "valid"):
        assert key in result
    assert result["valid"]
    r_est = np.array(result["rotation"])
    assert abs(result["scale"] - s_true) < 0.05
    cos = (np.trace(r_true.T @ r_est) - 1.0) / 2.0
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 1.0
    assert np.linalg.norm(np.array(result["translation"]) - t_true) < 0.05
    assert result["time_taken"] > 0
