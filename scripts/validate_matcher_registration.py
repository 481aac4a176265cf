"""Registration-level validation of the exact-NN matcher (VERDICT r1 #10).

The golden matcher case (reference matcher-test.cc:41-78) matches a 1000-pt
object into a 60,865-pt scene; our exact NN overlaps FLANN's approximate
golden matches ~77%. This script converts that caveat into a proven
equivalence: feed BOTH correspondence sets through the robust solver and
assert the two recovered poses agree.

Also times the full front-end (FPFH -> match) and a synthetic
100K x 100K descriptor matching run (VERDICT #4 done-gate: matcher stage
< 0.5 s at 100K points).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_matcher_registration.py
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from teaserpp_tpu.features import FPFHEstimation, Matcher
from teaserpp_tpu.io.ply import read_ply
from teaserpp_tpu.params import InlierSelectionMode, RobustRegistrationSolverParams
from teaserpp_tpu.solvers.registration import RobustRegistrationSolver
from teaserpp_tpu.utils.geometry import PointCloud
from teaserpp_tpu.utils.metrics import angular_error

REFERENCE_DATA = "/root/reference/test/teaser/data"

print("backend:", jax.devices(), flush=True)

obj = read_ply(os.path.join(REFERENCE_DATA, "matcher-test-object-1.ply"))
scene = read_ply(os.path.join(REFERENCE_DATA, "matcher-test-scene-1.ply"))
obj_pts = np.asarray(obj.points)
scene_pts = np.asarray(scene.points)
print(f"object {obj_pts.shape}, scene {scene_pts.shape}", flush=True)

fp = FPFHEstimation(chunk_size=2048)
t0 = time.time()
od = np.asarray(fp.computeFPFHFeatures(obj, 0.02, 0.04))
sd = np.asarray(fp.computeFPFHFeatures(scene, 0.02, 0.04))
t1 = time.time()
print(f"FPFH (both clouds): {t1 - t0:.2f}s", flush=True)

t0 = time.time()
corr_ours = Matcher().calculateCorrespondences(
    obj, scene, od, sd, False, True, False, 0.95
)
t1 = time.time()
print(f"matcher: {t1 - t0:.2f}s, {len(corr_ours)} correspondences", flush=True)

ref = np.loadtxt(
    os.path.join(REFERENCE_DATA, "matcher-test-matches-1.csv"),
    delimiter=",", dtype=int,
) - 1  # MATLAB 1-indexed
corr_ref = [tuple(r) for r in ref]
overlap = len(set(corr_ref) & set(corr_ours)) / len(corr_ref)
print(f"overlap with FLANN golden: {overlap:.1%}", flush=True)

# Solve registration from both correspondence sets. The object is NOT an
# identity-placed crop of the scene (its nearest-scene-point distance is a
# uniform ~0.30 m) and no ground-truth pose ships with the fixture — the
# reference's own test only diffs the raw FLANN output (matcher-test.cc:
# 75-79), which an exact-NN matcher cannot and should not reproduce
# bit-for-bit. The task-level arbiter: transform the object by each
# recovered pose and measure nearest-neighbor alignment to the scene; the
# exact-NN correspondences must register at least as well as FLANN's.
params = RobustRegistrationSolverParams(
    noise_bound=0.01,
    estimate_scaling=False,
    inlier_selection_mode=InlierSelectionMode.PMC_EXACT,
)
sol_ref = RobustRegistrationSolver(params).solve(
    PointCloud(obj_pts), PointCloud(scene_pts), corr_ref
)
sol_ours = RobustRegistrationSolver(params).solve(
    PointCloud(obj_pts), PointCloud(scene_pts), corr_ours
)
rot_diff_deg = np.degrees(angular_error(sol_ours.rotation, sol_ref.rotation))
trans_diff = np.linalg.norm(sol_ours.translation - sol_ref.translation)
print(f"pose difference ours-vs-golden: rot {rot_diff_deg:.4f} deg, "
      f"trans {trans_diff:.5f} m "
      f"(valid: ours={sol_ours.valid} ref={sol_ref.valid})", flush=True)
assert sol_ours.valid and sol_ref.valid


def alignment_nn_dist(sol):
    moved = np.asarray(sol.rotation) @ obj_pts.T + np.asarray(
        sol.translation
    ).reshape(3, 1)
    moved = moved.T  # (No, 3)
    mins = []
    for i in range(0, len(moved), 200):
        d = np.linalg.norm(
            moved[i : i + 200, None, :] - scene_pts[None, :, :], axis=-1
        )
        mins.append(d.min(axis=1))
    mins = np.concatenate(mins)
    return float(np.median(mins)), float(mins.mean())


med_ours, mean_ours = alignment_nn_dist(sol_ours)
med_ref, mean_ref = alignment_nn_dist(sol_ref)
print(f"object->scene NN alignment  ours: median {med_ours:.5f} m, "
      f"mean {mean_ours:.5f} m", flush=True)
print(f"object->scene NN alignment  FLANN golden: median {med_ref:.5f} m, "
      f"mean {mean_ref:.5f} m", flush=True)
assert med_ours <= med_ref * 1.05 + 1e-4, (
    "exact-NN correspondences register WORSE than the FLANN golden set"
)
# loose pose sanity bounds alongside the NN-alignment arbiter (ADVICE r2):
# NN alignment alone could accept a grossly wrong pose that parks the object
# on other dense scene geometry; the two valid solutions here differ by a
# few degrees (shallow single-view geometry), never tens.
assert rot_diff_deg < 10.0, f"pose rotation diverged: {rot_diff_deg:.2f} deg"
assert trans_diff < 0.1, f"pose translation diverged: {trans_diff:.4f} m"
print("REGISTRATION-LEVEL MATCHER EQUIVALENCE: OK "
      f"(ours {med_ours:.5f} m vs golden {med_ref:.5f} m median NN)", flush=True)

# --- synthetic 100K matcher timing (warm) ---------------------------------
rng = np.random.default_rng(0)
nq = 100_000
d = 33
base = rng.random((nq, d)).astype(np.float32) * 100
pert = base + rng.standard_normal((nq, d)).astype(np.float32) * 0.5
pts = rng.random((nq, 3))
m = Matcher()
# warm-up (compile)
_ = m.calculateCorrespondences(pts[:4096], pts[:4096], base[:4096], pert[:4096],
                               False, True, False, 0.0)
t0 = time.time()
corr = m.calculateCorrespondences(pts, pts, base, pert, False, True, False, 0.0)
t1 = time.time()
frac_id = np.mean([i == j for i, j in corr[:5000]])
print(f"100K x 100K matcher: {t1 - t0:.2f}s, {len(corr)} matches, "
      f"identity frac {frac_id:.2%}", flush=True)
