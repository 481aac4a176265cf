"""Pallas kernel tests (interpret mode on the CPU test host).

The real-TPU agreement/performance check lives in the bench flow; here the
kernel runs under the Pallas interpreter and must match the XLA reference
path bit-for-bit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from teaserpp_tpu.parallel.sharded import trim_adjacency_dense


def test_trim_adjacency_pallas_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu
    from teaserpp_tpu.ops import pallas_kernels as pk

    n = 300
    src = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    dst = (src + rng.normal(scale=0.002, size=(3, n))).astype(np.float32)
    out_idx = rng.choice(n, size=200, replace=False)
    dst[:, out_idx] += rng.uniform(1, 4, size=(3, 200))
    noise_bound = 0.005
    beta = 2 * noise_bound

    with pltpu.force_tpu_interpret_mode():
        adj_p = np.asarray(
            pk.trim_adjacency_pallas(
                jnp.asarray(src), jnp.asarray(dst), beta, tile=128
            )
        ).astype(bool)
    adj_x = np.asarray(
        trim_adjacency_dense(jnp.asarray(src), jnp.asarray(dst), noise_bound)
    )
    assert adj_p.shape == adj_x.shape
    assert (adj_p == adj_x).mean() > 0.9999  # identical modulo fp boundary ties
    assert not adj_p.diagonal().any()


@pytest.mark.parametrize("rows,cols", [(64, 128), (96, 128), (64, 96)])
def test_trim_adjacency_bits_pallas_interpret_word_parity(rng, rows, cols):
    """The load-bearing huge-N bits kernel matches `trim_adjacency_bits`
    word-for-word under the Pallas interpreter (ADVICE r2: the N>=65536
    production dispatch was only checked by a manual on-TPU script).
    The non-divisible (rows, cols) combos also pin the lcm grid padding."""
    from jax.experimental.pallas import tpu as pltpu
    from teaserpp_tpu.ops import pallas_kernels as pk
    from teaserpp_tpu.ops.tims import trim_adjacency_bits

    n = 150
    src = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    dst = (src + rng.normal(scale=0.002, size=(3, n))).astype(np.float32)
    out_idx = rng.choice(n, size=90, replace=False)
    dst[:, out_idx] += rng.uniform(1, 4, size=(3, 90))
    noise_bound = 0.005
    beta = 2 * noise_bound

    with pltpu.force_tpu_interpret_mode():
        bits_p = np.asarray(
            pk.trim_adjacency_bits_pallas(
                jnp.asarray(src), jnp.asarray(dst), beta, rows=rows, cols=cols
            )
        )
    bits_x = np.asarray(
        trim_adjacency_bits(jnp.asarray(src), jnp.asarray(dst), noise_bound)
    )
    assert bits_p.shape == bits_x.shape
    assert np.array_equal(bits_p, bits_x)  # word-level, bit-identical


@pytest.mark.parametrize("rows,cols", [(64, 128), (64, 96)])
def test_trim_degrees_pallas_interpret_matches_bits_popcount(rng, rows, cols):
    """The fused predicate-into-degree kernel (VERDICT r4 #8 measurement
    vehicle) must equal the popcount row-sums of the bits path exactly —
    same sqrt-free predicate, same diagonal/padding masking."""
    from jax.experimental.pallas import tpu as pltpu
    from teaserpp_tpu.ops import pallas_kernels as pk
    from teaserpp_tpu.ops.tims import trim_adjacency_bits

    n = 150
    src = rng.uniform(-1, 1, (3, n)).astype(np.float32)
    dst = (src + rng.normal(scale=0.002, size=(3, n))).astype(np.float32)
    out_idx = rng.choice(n, size=90, replace=False)
    dst[:, out_idx] += rng.uniform(1, 4, size=(3, 90))
    noise_bound = 0.005
    beta = 2 * noise_bound

    with pltpu.force_tpu_interpret_mode():
        deg_p = np.asarray(
            pk.trim_degrees_pallas(
                jnp.asarray(src), jnp.asarray(dst), beta, rows=rows, cols=cols
            )
        )
    bits = np.asarray(
        trim_adjacency_bits(jnp.asarray(src), jnp.asarray(dst), noise_bound)
    )
    # unpack words -> per-row degree sums (bit b of word [w, j] = adj[32w+b, j])
    adj = np.zeros((bits.shape[0] * 32, n), bool)
    for b in range(32):
        adj[b::32][: bits.shape[0]] = (bits >> b) & 1
    deg_ref = adj[:n].sum(axis=1)
    assert np.array_equal(deg_p, deg_ref)
