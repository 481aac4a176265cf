"""Adaptive-voting scalar truncated-least-squares estimation.

This is the single primitive behind the scale and translation solvers
(capability parity with reference registration.cc:21-204, ``ScalarTLSEstimator``).

TPU-first reformulation: the reference sweeps 2N sorted interval endpoints
with sequential running sums (registration.cc:58-75). Here the sweep is a
sort + gather + prefix-sum pipeline — every running quantity in the
reference's loop is the prefix sum of a per-event signed delta, so the whole
estimator is O(K log K) data-independent vector code that jits, vmaps over
batches, and has no host control flow.

Event model: measurement ``i`` opens its consensus interval at ``x_i - r_i``
(delta +1) and closes it at ``x_i + r_i`` (delta -1). After sorting all 2N
events by position, the state *after* event ``k`` gives candidate estimate
``x_hat_k = (sum of w_i x_i over the open set) / (sum of w_i)`` with
``w_i = 1/r_i^2``, and cost ``sum_{open}(x_i - x_hat_k)^2 + sum_{closed} r_i``
— identical quantities to the reference's recurrence.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp


class ScalarTLSResult(NamedTuple):
    estimate: jnp.ndarray  # (...,) TLS estimate
    inliers: jnp.ndarray  # (..., N) bool consensus mask at the estimate
    cost: jnp.ndarray  # (...,) cost at the selected consensus set


def scalar_tls(
    x: jnp.ndarray,
    ranges: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> ScalarTLSResult:
    """Truncated-least-squares estimate of a scalar from interval measurements.

    Args:
      x: (..., N) measurements.
      ranges: (..., N) per-measurement half-interval (inlier iff
        ``|x_i - estimate| <= ranges_i``).
      valid: optional (..., N) bool mask; False entries are ignored entirely
        (our padding mechanism for fixed-shape pipelines; the reference
        has no equivalent because it resizes dynamically).

    Returns:
      ScalarTLSResult(estimate, inliers, cost). Matches reference
      registration.cc:21-88 on fully-valid inputs.
    """
    x = jnp.asarray(x)
    ranges = jnp.asarray(ranges)
    dtype = jnp.result_type(x.dtype, ranges.dtype)
    x = x.astype(dtype)
    ranges = ranges.astype(dtype)
    n = x.shape[-1]

    if valid is None:
        vmask = jnp.ones(x.shape, dtype=dtype)
    else:
        vmask = jnp.asarray(valid).astype(dtype)

    w = vmask / jnp.where(vmask > 0, ranges * ranges, jnp.ones_like(ranges))

    # Event positions: left (open) endpoints then right (close) endpoints.
    vals = jnp.concatenate([x - ranges, x + ranges], axis=-1)  # (..., 2N)
    sign = jnp.concatenate(
        [jnp.ones((n,), dtype), -jnp.ones((n,), dtype)], axis=-1
    )  # (2N,)

    def ev(q):  # tile a per-measurement quantity onto the 2N events
        return jnp.concatenate([q, q], axis=-1)

    # Per-event signed deltas of each running sum in reference
    # registration.cc:63-68. Invalid measurements contribute nothing.
    vm2 = ev(vmask)
    d_card = sign * vm2
    d_w = sign * ev(w)
    d_xw = sign * ev(w * x)
    d_rng = -sign * ev(ranges * vmask)
    d_sx = sign * ev(x * vmask)
    d_sx2 = sign * ev(x * x * vmask)

    # One multi-operand sort carries every event stream through the
    # permutation — on TPU this replaces an argsort plus six random-access
    # gathers (the gathers dominate the sweep's cost there).
    _, d_card, d_w, d_xw, d_rng, d_sx, d_sx2 = jax.lax.sort(
        (vals, d_card, d_w, d_xw, d_rng, d_sx, d_sx2),
        dimension=vals.ndim - 1,
        num_keys=1,
        is_stable=False,
    )

    def pfx(d):
        return jnp.cumsum(d, axis=-1)

    card = pfx(d_card)
    cum_w = pfx(d_w)
    cum_xw = pfx(d_xw)
    sum_ranges = jnp.sum(ranges * vmask, axis=-1, keepdims=True)
    outlier_pen = sum_ranges + pfx(d_rng)
    cum_sx = pfx(d_sx)
    cum_sx2 = pfx(d_sx2)

    have_consensus = card > 0.5
    safe_w = jnp.where(have_consensus, cum_w, jnp.ones_like(cum_w))
    x_hat = cum_xw / safe_w
    residual = card * x_hat * x_hat + cum_sx2 - 2.0 * cum_sx * x_hat
    cost = residual + outlier_pen
    inf = jnp.asarray(jnp.inf, dtype)
    cost = jnp.where(have_consensus, cost, inf)

    min_idx = jnp.argmin(cost, axis=-1)
    estimate = jnp.take_along_axis(x_hat, min_idx[..., None], axis=-1)[..., 0]
    best_cost = jnp.take_along_axis(cost, min_idx[..., None], axis=-1)[..., 0]

    inliers = (jnp.abs(x - estimate[..., None]) <= ranges) & (vmask > 0)
    return ScalarTLSResult(estimate=estimate, inliers=inliers, cost=best_cost)


def scalar_tls_fixed_range(
    x: jnp.ndarray,
    beta: Union[float, jnp.ndarray],
    valid: Optional[jnp.ndarray] = None,
) -> ScalarTLSResult:
    """:func:`scalar_tls` specialized to a single shared half-interval.

    When every measurement has the same range ``beta`` (the translation
    solver's case — reference registration.cc:452: one ``beta`` for all rows),
    the constant weight ``1/beta^2`` cancels out of the consensus mean and the
    outlier penalty collapses to ``beta * (#excluded)``, so only three event
    streams remain (count, sum x, sum x^2). They are carried *through* one
    multi-operand ``lax.sort`` instead of the argsort + six gathers of the
    general path — on TPU random-access gathers are the dominant cost of the
    sweep, making this ~2.5x cheaper end to end.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    beta = jnp.asarray(beta, dtype)
    n = x.shape[-1]

    if valid is None:
        vmask = jnp.ones(x.shape, dtype=dtype)
    else:
        vmask = jnp.asarray(valid).astype(dtype)

    b = jnp.broadcast_to(beta, x.shape)
    vals = jnp.concatenate([x - b, x + b], axis=-1)  # (..., 2N)
    sign = jnp.concatenate([vmask, -vmask], axis=-1)
    sx = sign * jnp.concatenate([x, x], axis=-1)
    sx2 = sx * jnp.concatenate([x, x], axis=-1)

    vals, sign_s, sx_s, sx2_s = jax.lax.sort(
        (vals, sign, sx, sx2), dimension=-1, num_keys=1, is_stable=False
    )
    card = jnp.cumsum(sign_s, axis=-1)
    cum_sx = jnp.cumsum(sx_s, axis=-1)
    cum_sx2 = jnp.cumsum(sx2_s, axis=-1)
    nv = jnp.sum(vmask, axis=-1, keepdims=True)

    have_consensus = card > 0.5
    safe_card = jnp.where(have_consensus, card, jnp.ones_like(card))
    x_hat = cum_sx / safe_card
    residual = cum_sx2 - cum_sx * x_hat  # = card x_hat^2 + sum x^2 - 2 x_hat sum x
    cost = residual + beta * (nv - card)
    inf = jnp.asarray(jnp.inf, dtype)
    cost = jnp.where(have_consensus, cost, inf)

    min_idx = jnp.argmin(cost, axis=-1)
    estimate = jnp.take_along_axis(x_hat, min_idx[..., None], axis=-1)[..., 0]
    best_cost = jnp.take_along_axis(cost, min_idx[..., None], axis=-1)[..., 0]

    inliers = (jnp.abs(x - estimate[..., None]) <= b) & (vmask > 0)
    return ScalarTLSResult(estimate=estimate, inliers=inliers, cost=best_cost)
