"""Worker process for the 2-process ``jax.distributed`` test.

Spawned by tests/test_distributed.py. Each worker owns 4 virtual CPU
devices; the two workers form one 8-device global mesh through the
coordination service, exactly the multi-host topology of
``parallel/multihost.py`` (batch axis across processes = DCN analog).

The reference has no distributed execution at all (SURVEY.md §2.5); this
validates the framework's multi-host path end to end: global mesh
construction, per-process array shard creation, a sharded batched solve,
and shard-level equality with a single-process solve of the same problems.
"""

import os
import sys

# Drop any inherited device-count flag (conftest pins 8 for in-process
# tests) and claim 4 local virtual devices for this worker.
_flags = [
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main() -> None:
    coordinator, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from teaserpp_tpu.parallel.multihost import initialize_distributed, make_mesh

    initialize_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.process_index() == pid
    ndev = len(jax.devices())
    assert ndev == 4 * nprocs, ndev
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from teaserpp_tpu.parallel.batch import solve_batch
    from teaserpp_tpu.params import RobustRegistrationSolverParams

    # Deterministic global problem set — both workers generate the same data.
    rng = np.random.default_rng(42)
    batch, n = 8, 48
    src = rng.random((batch, 3, n))
    rots = []
    for _ in range(batch):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rots.append(q)
    dst = np.einsum("bij,bjn->bin", np.asarray(rots), src)
    dst += rng.random((batch, 3, 1)) + rng.standard_normal(dst.shape) * 0.001
    out_mask = rng.random((batch, n)) < 0.5
    dst = np.where(out_mask[:, None, :], rng.random(dst.shape) * 3, dst)

    params = RobustRegistrationSolverParams(
        noise_bound=0.005, estimate_scaling=False
    )

    mesh = make_mesh(pairs_per_host=1)  # (8, 1): batch spans both processes
    assert mesh.devices.shape == (8, 1)
    sharding = NamedSharding(mesh, P("batch"))
    src_g = jax.make_array_from_callback(src.shape, sharding, lambda i: src[i])
    dst_g = jax.make_array_from_callback(dst.shape, sharding, lambda i: dst[i])
    sol = solve_batch(src_g, dst_g, params)

    # Single-process reference on this worker's default device.
    ref = solve_batch(jnp.asarray(src), jnp.asarray(dst), params)
    ref_rot = np.asarray(ref.rotation)
    ref_tr = np.asarray(ref.translation)
    ref_valid = np.asarray(ref.valid)

    checked = 0
    for shard in sol.rotation.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_rot[sl], rtol=1e-7, atol=1e-9
        )
        checked += 1
    for shard in sol.translation.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(
            np.asarray(shard.data), ref_tr[sl], rtol=1e-7, atol=1e-9
        )
    for shard in sol.valid.addressable_shards:
        sl = shard.index[0]
        assert np.array_equal(np.asarray(shard.data), ref_valid[sl])
    assert checked == 4, checked  # 4 local devices -> 4 local shards
    assert ref_valid.all()
    print(f"proc {pid} OK ({checked} shards checked)", flush=True)


if __name__ == "__main__":
    main()
