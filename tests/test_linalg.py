"""Unit tests for ops.linalg (reference linalg-test.cc tier-1 analog)."""

import numpy as np
import jax.numpy as jnp

from teaserpp_tpu.ops import hatmap, vector_kron, get_nearest_psd


def test_hatmap_cross_product(rng):
    u = rng.normal(size=3)
    v = rng.normal(size=3)
    h = np.asarray(hatmap(u))
    assert np.allclose(h, -h.T)
    assert np.allclose(h @ v, np.cross(u, v))


def test_hatmap_known_values():
    h = np.asarray(hatmap(jnp.array([1.0, 2.0, 3.0])))
    expected = np.array([[0, -3, 2], [3, 0, -1], [-2, 1, 0]], dtype=np.float64)
    assert np.array_equal(h, expected)


def test_vector_kron_matches_numpy(rng):
    a = rng.normal(size=4)
    b = rng.normal(size=7)
    assert np.allclose(np.asarray(vector_kron(a, b)), np.kron(a, b))


def test_nearest_psd_of_psd_is_identity_map(rng):
    a = rng.normal(size=(6, 6))
    psd = a @ a.T
    out = np.asarray(get_nearest_psd(psd))
    assert np.allclose(out, psd, atol=1e-8)


def test_nearest_psd_clamps_negative_eigenvalues(rng):
    a = rng.normal(size=(5, 5))
    sym = (a + a.T) / 2
    out = np.asarray(get_nearest_psd(sym))
    w = np.linalg.eigvalsh(out)
    assert w.min() >= -1e-10
    # optimal Frobenius projection: residual equals the negative spectrum mass
    w_in, v_in = np.linalg.eigh(sym)
    expected = v_in @ np.diag(np.clip(w_in, 0, None)) @ v_in.T
    assert np.allclose(out, expected, atol=1e-8)


def test_nearest_psd_batched(rng):
    a = rng.normal(size=(4, 5, 5))
    out = np.asarray(get_nearest_psd(a))
    for k in range(4):
        single = np.asarray(get_nearest_psd(a[k]))
        assert np.allclose(out[k], single, atol=1e-10)
