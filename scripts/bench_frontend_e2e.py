"""Full front-end end-to-end benchmark (VERDICT r2 #9).

Two workloads, per-stage wall time each (the BASELINE.md "3DMatch /
3DSmoothNet scenes" analog within single-chip limits):

  A. Real 60K scene pair: the golden matcher fixture's 60,865-pt scene
     registered against a rigidly transformed, noise-perturbed copy —
     FPFH descriptors -> exact-NN matcher (cross-check) -> robust solve
     (device clique) -> optional DRS certification of the rotation.
  B. Synthetic 100K pair: random cloud + known SE(3), same pipeline.

Timing protocol: everything jitted warms once (compile), then the timed
pass fetches a scalar to host per stage (honest through the relay).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_frontend_e2e.py [certify]
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
# CPU backend available alongside the TPU: the certify stage's subproblem
# GNC re-solve is host-side problem prep
jax.config.update("jax_platforms", "axon,cpu")

import jax.numpy as jnp

from teaserpp_tpu.features import FPFHEstimation, Matcher
from teaserpp_tpu.io.ply import read_ply
from teaserpp_tpu.params import InlierSelectionMode, RobustRegistrationSolverParams
from teaserpp_tpu.parallel import solve_large_sharded
from jax.sharding import Mesh
from teaserpp_tpu.utils.metrics import rotation_error_deg, translation_error

REFERENCE_DATA = "/root/reference/test/teaser/data"
DO_CERTIFY = "certify" in sys.argv

print("backend:", jax.devices(), flush=True)


def rigid_copy(pts, rng, noise=0.005):
    """Transformed + perturbed copy of (N, 3) points, returns (copy, R, t)."""
    q, r_ = np.linalg.qr(rng.standard_normal((3, 3)))
    q *= np.sign(np.diag(r_))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    t = rng.uniform(-1, 1, 3)
    dst = pts @ q.T + t + rng.normal(scale=noise / 3, size=pts.shape)
    return dst, q, t


def run_pipeline(name, src_pts, dst_pts, r_true, t_true, nb, fpfh_radii):
    """src/dst: (N, 3) numpy. Prints per-stage wall times."""
    n = len(src_pts)
    fp = FPFHEstimation(chunk_size=2048)

    # --- stage 1: descriptors (both clouds)
    t0 = time.time()
    sd = np.asarray(fp.computeFPFHFeatures(src_pts, *fpfh_radii))
    dd = np.asarray(fp.computeFPFHFeatures(dst_pts, *fpfh_radii))
    t_desc = time.time() - t0

    # --- stage 2: matcher (mutual NN + cross-check)
    t0 = time.time()
    corr = Matcher().calculateCorrespondences(
        src_pts, dst_pts, sd, dd, False, True, False, 0.95
    )
    t_match = time.time() - t0
    ci = np.asarray([c[0] for c in corr])
    cj = np.asarray([c[1] for c in corr])
    src_c = np.ascontiguousarray(src_pts[ci].T)
    dst_c = np.ascontiguousarray(dst_pts[cj].T)
    k = len(corr)

    # --- stage 3: robust solve (device clique path; K can exceed 10K)
    params = RobustRegistrationSolverParams(
        noise_bound=nb,
        estimate_scaling=False,
        inlier_selection_mode=InlierSelectionMode.KCORE_HEU,
        kcore_heuristic_threshold=0.0,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(1, -1), ("batch", "pairs"))
    res = solve_large_sharded(
        src_c.astype(np.float32), dst_c.astype(np.float32), params, mesh
    )
    jax.block_until_ready(res)  # compile
    t0 = time.time()
    res = solve_large_sharded(
        src_c.astype(np.float32), dst_c.astype(np.float32), params, mesh
    )
    _ = float(np.asarray(jnp.sum(res.solution.rotation)))
    t_solve = time.time() - t0
    sol = res.solution

    rot_err = rotation_error_deg(np.asarray(sol.rotation, np.float64), r_true)
    trn_err = translation_error(np.asarray(sol.translation, np.float64), t_true)

    line = (f"{name}: N={n} corr={k} | desc {t_desc:.2f}s | match {t_match:.2f}s "
            f"| solve {t_solve:.3f}s | rot {rot_err:.4f} deg trans {trn_err:.5f} m "
            f"| clique {int(res.clique_size)}")

    # --- stage 4 (optional): certify the rotation on the clique TIMs
    if DO_CERTIFY:
        from teaserpp_tpu.certification.drs import DRSCertifier
        from teaserpp_tpu.params import DRSCertifierParams, EigSolverType

        mask = np.asarray(sol.clique_mask)
        idx = np.nonzero(mask)[0]
        if len(idx) > 300:  # certification cost is O(N^2)-O(N^3) in TIMs
            idx = idx[np.linspace(0, len(idx) - 1, 300).astype(int)]
        sel_s = src_c[:, idx]
        sel_d = dst_c[:, idx]
        # chain TIMs over the selected clique members
        v1 = np.diff(np.concatenate([sel_s, sel_s[:, :1]], axis=1), axis=1)
        v2 = np.diff(np.concatenate([sel_d, sel_d[:, :1]], axis=1), axis=1)
        # Certification of a derived subproblem must be self-consistent:
        # (R, theta) must be the TLS stationary pair OF THE CERTIFIED TIM
        # SET, so the rotation is re-solved by GNC on exactly these chain
        # TIMs with the certification bound (the pipeline rotation was
        # estimated on the FULL clique chain; its optimum differs on a
        # 300-TIM subsample and an inconsistent pair is rightly refused).
        # The bound sits at ~2.5x the median residual — the balanced
        # regime of the at-scale gnc rows. NOTE an honest structural
        # finding (reproduced on CPU, PERFORMANCE.md "Front-end e2e"):
        # when the subproblem has NO TLS outliers, the primal cost mu =
        # sum(residual^2) lacks the nb^2-per-outlier terms that dominate
        # it in the gnc-row regime, the RELATIVE gap threshold tightens by
        # orders of magnitude, and DRS needs thousands of iterations on an
        # essentially-clean instance — a property of the QUASAR gap
        # definition (reference certification.cc:192-231 divides by mu),
        # not of this implementation. The stage reports whatever the
        # budget achieves.
        resid = np.linalg.norm(
            v2 - np.asarray(sol.rotation, np.float64) @ v1, axis=0
        )
        cert_nb = float(2.5 * np.median(resid))
        from teaserpp_tpu.certification.drs import certify_checkpointed
        from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

        with jax.default_device(jax.devices("cpu")[0]):
            rot_sub = solve_rotation_gnc_tls(
                jnp.asarray(v1), jnp.asarray(v2), cert_nb
            )
            theta = np.where(np.asarray(rot_sub.inliers), 1.0, -1.0)
            r_sub = np.asarray(rot_sub.rotation)

        params_cert = DRSCertifierParams(
            noise_bound=cert_nb,
            eig_decomposition_solver=EigSolverType.ITERATIVE,
            iterations_per_dispatch=25,
        )
        t0 = time.time()
        cres = certify_checkpointed(r_sub, v1, v2, theta, params_cert, rounds=4)
        t_cert = time.time() - t0
        line += (f" | certify {t_cert:.1f}s optimal={cres.is_optimal} "
                 f"gap={cres.best_suboptimality:.2e}")
    print(line, flush=True)


rng = np.random.default_rng(11)

# A. real 60K scene
scene = read_ply(os.path.join(REFERENCE_DATA, "matcher-test-scene-1.ply"))
pts = np.asarray(scene.points)
dst, r_true, t_true = rigid_copy(pts, rng)
run_pipeline("scene60k", pts, dst, r_true, t_true, nb=0.01,
             fpfh_radii=(0.02, 0.04))

# B. synthetic 100K pair
pts = rng.uniform(-1, 1, (100_000, 3))
dst, r_true, t_true = rigid_copy(pts, rng, noise=0.003)
run_pipeline("synth100k", pts, dst, r_true, t_true, nb=0.01,
             fpfh_radii=(0.05, 0.10))
