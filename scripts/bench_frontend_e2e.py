"""Full front-end end-to-end benchmark (VERDICT r2 #9, r4 #1).

Two workloads, per-stage wall time each (the BASELINE.md "3DMatch /
3DSmoothNet scenes" analog within single-chip limits):

  A. Real 60K scene pair: the golden matcher fixture's 60,865-pt scene
     registered against a rigidly transformed, noise-perturbed copy —
     FPFH descriptors -> exact-NN matcher (cross-check) -> robust solve
     (device clique) -> optional DRS certification of the rotation.
  B. Synthetic 100K pair: random cloud + known SE(3), same pipeline.

Timing protocol: everything jitted warms once (compile), then the timed
pass fetches a scalar to host per stage (honest through the relay).

Certification is TWO-PHASE because its dtype regime differs from the
pipeline's: DRS needs f64 (f32 stalls at suboptimality ~1e2 — the r4 run
made exactly that mistake, VERDICT r4 Weak #1) while the solve/descriptor
stages are f32, and jax_enable_x64 is a process-global flag. Phase 1
(``certify`` argv) runs the f32 pipeline and SAVES the rotation-stage
problem — the chain TIMs over the max-clique, outliers included (the
regime where the QUASAR relative gap is meaningful; a post-hoc clean
subsample collapses mu and needs thousands of iterations, see
PERFORMANCE.md "Front-end e2e") — to an npz. Phase 2 (``certify-saved``
argv) is a separate x64 process: GNC re-solve of the certified subset in
f64 on CPU (stationarity of (R, theta) on exactly the certified TIMs),
then resumable chunked DRS certification on the chip.

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_frontend_e2e.py certify
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_frontend_e2e.py certify-saved
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
if "certify-saved" in sys.argv:
    # phase 2 is the f64 certification process (see module docstring)
    jax.config.update("jax_enable_x64", True)

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
    from teaserpp_tpu.features import build_neighbor_plans
    from teaserpp_tpu.features.fpfh import compute_fpfh_pruned
    from teaserpp_tpu.features.normals import estimate_normals_pruned

    n = len(src_pts)

    # --- stage 1: descriptors (both clouds), device-resident end-to-end
    # (functional grid API: descriptors stay on device for the matcher —
    # the facade's numpy return would round-trip 2 x 13 MB via the relay)
    def descriptors(pts):
        plans = build_neighbor_plans(pts, fpfh_radii)
        pts_d = jnp.asarray(pts, jnp.float32)
        nres = estimate_normals_pruned(pts_d, fpfh_radii[0], plans[0])
        return compute_fpfh_pruned(pts_d, nres.normals, fpfh_radii[1], plans[1])

    t0 = time.time()
    sd = descriptors(src_pts)
    dd = descriptors(dst_pts)
    # honest through the relay: scalar fetch, not block_until_ready
    _ = float(np.asarray(jnp.sum(sd) + jnp.sum(dd)))
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

    # --- stage 4 (optional): save the ROTATION-STAGE problem for phase 2.
    # The certified object is the problem the rotation solver actually
    # faced: chain TIMs over the max-clique, rotation-stage noise bound
    # (2*nb/s, registration.cc:697-704), TLS outliers INCLUDED. The f64
    # certification itself runs in a separate x64 process (phase 2).
    if DO_CERTIFY:
        mask = np.asarray(sol.clique_mask)
        idx = np.nonzero(mask)[0]
        sel_s = src_c[:, idx].astype(np.float64)
        sel_d = dst_c[:, idx].astype(np.float64)
        # chain TIMs over ALL clique members (ring, registration.cc:657-680)
        v1 = np.diff(np.concatenate([sel_s, sel_s[:, :1]], axis=1), axis=1)
        v2 = np.diff(np.concatenate([sel_d, sel_d[:, :1]], axis=1), axis=1)
        path = f"/root/repo/.e2e_cert_{name}.npz"
        np.savez(path, v1=v1, v2=v2, nb_rot=2.0 * nb,
                 r_pipeline=np.asarray(sol.rotation, np.float64))
        line += f" | rotation-stage problem saved ({v1.shape[1]} TIMs) -> {path}"
    print(line, flush=True)


# --- phase 2: f64 certification of the saved rotation-stage problems ----
# Certified TIM count. 150 -> npm = 604, inside the reference's own
# certification envelope (its random tests run N=100-400). The first r5
# attempt used 300 (npm=1204): tractable per-iteration (~1 s warm) but the
# front-end-derived instance is badly conditioned — chain TIMs of real
# scene geometry have wildly varying norms — and the DRS gap was still at
# 0.063 after 2000 iterations at rank 256 (contracting ~0.1%/iter, ~4000
# more to go). Halving N makes each iteration ~8x cheaper and shortens the
# trajectory, keeping the fragile tunneled worker's exposure low; all TLS
# outliers are kept, so the certified problem stays the outlier-bearing
# rotation-stage object.
NCERT = 150


def certify_saved(name):
    path = f"/root/repo/.e2e_cert_{name}.npz"
    if not os.path.exists(path):
        print(f"{name}: no saved problem at {path} (run phase 1 first)",
              flush=True)
        return
    from teaserpp_tpu.certification.drs import certify_checkpointed
    from teaserpp_tpu.params import DRSCertifierParams, EigSolverType
    from teaserpp_tpu.solvers.rotation import solve_rotation_gnc_tls

    with np.load(path) as z:
        v1f, v2f, nb_rot = z["v1"], z["v2"], float(z["nb_rot"])
    cpu = jax.devices("cpu")[0]
    # theta over the FULL chain: which TIMs are TLS outliers at the
    # rotation-stage bound
    with jax.default_device(cpu):
        rot_full = solve_rotation_gnc_tls(
            jnp.asarray(v1f), jnp.asarray(v2f), nb_rot
        )
        th_full = np.asarray(rot_full.inliers)
    out_idx = np.nonzero(~th_full)[0]
    in_idx = np.nonzero(th_full)[0]
    # certified subset: ALL outlier TIMs (they keep mu in the balanced
    # regime — the whole point of certifying the rotation-stage problem,
    # VERDICT r4 #1) + evenly-spaced inliers up to NCERT
    keep_out = out_idx[: NCERT // 2]
    n_in = min(NCERT - len(keep_out), len(in_idx))
    keep_in = in_idx[np.linspace(0, len(in_idx) - 1, n_in).astype(int)]
    sel = np.sort(np.concatenate([keep_in, keep_out]))
    v1, v2 = v1f[:, sel], v2f[:, sel]
    # stationarity: (R, theta) must be the GNC-TLS pair OF THE CERTIFIED
    # TIM SET (the full-chain optimum differs on a subsample)
    with jax.default_device(cpu):
        rot_sub = solve_rotation_gnc_tls(jnp.asarray(v1), jnp.asarray(v2), nb_rot)
        theta = np.where(np.asarray(rot_sub.inliers), 1.0, -1.0)
        r_sub = np.asarray(rot_sub.rotation)
    n_out = int((theta < 0).sum())
    print(f"{name}: chain {v1f.shape[1]} TIMs ({len(out_idx)} TLS outliers) "
          f"-> certify {len(sel)} TIMs ({n_out} outliers), nb_rot={nb_rot}",
          flush=True)
    # Rank guidance (PERFORMANCE.md "Certification at scale"): >= 2x the
    # expected negative-eigenvalue count. The r5 NCERT=300 probe measured
    # 117 negatives at npm=1204 (~npm/10) via an offline eigh of the
    # stalled rank-128 checkpoint — the r4 starved regime again — so at
    # npm=604 expect ~60 and start at 128; certify_checkpointed
    # self-escalates if that still saturates.
    params_cert = DRSCertifierParams(
        noise_bound=nb_rot,
        eig_decomposition_solver=EigSolverType.ITERATIVE,
        iterations_per_dispatch=25,
        psd_projection_rank=128,
        max_iterations=200,
    )
    ck = f"/root/repo/.e2e_cert_{name}_ck.npz"
    t0 = time.time()
    cres = certify_checkpointed(
        r_sub, v1, v2, theta, params_cert, checkpoint_path=ck,
        checkpoint_every=2, rounds=20, verbose=True,
    )
    t_cert = time.time() - t0
    print(f"{name}: certify {t_cert:.1f}s optimal={cres.is_optimal} "
          f"(Cholesky-proven) gap={cres.best_suboptimality:.2e} "
          f"iters={len(cres.suboptimality_traj)} sat={cres.rank_saturated}",
          flush=True)


if "certify-saved" in sys.argv:
    assert jax.config.jax_enable_x64, "phase 2 must run in x64"
    certify_saved("scene60k")
    certify_saved("synth100k")
    sys.exit(0)


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
