"""Global layer-sparsity allocation from Block-Influence scores.

TPU-native equivalent of the reference allocator
(reference: src/compression_utils.py:79-124 `allocate_global_sparsity`):
per-layer sparsity = ``L * ratio * softmax(-bi / smoothing)`` followed by
an iterative clamp-at-max-and-redistribute loop, returning *keep ratios*
``1 - sparsity``. The loop is a `lax.while_loop` so the whole allocator
is a single compiled XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["allocate_keep_ratios"]


@partial(jax.jit, static_argnames=("invert",))
def _allocate(s: jax.Array, ratio, smoothing, max_sparsity, invert: bool):
    if invert:
        # CKA-style scores: higher score => more compression
        # (reference: src/compression_utils.py:97-98).
        s = -s
    n_layers = s.shape[0]
    weights = jax.nn.softmax(-s / smoothing)
    sparsities = weights * (n_layers * ratio)

    # Convergence tolerance + iteration cap. NOTE: the reference's loop
    # (src/compression_utils.py:110-122) is non-terminating in floating
    # point for sharp-softmax configs — once every high-weight layer sits
    # at the cap, the residual excess circulates among them forever
    # (empirically reproduced with the reference formula in torch for its
    # own tuned Qwen3 hyperparameters, see tests/test_allocation.py). We
    # implement the intended fixed point: same clamp/redistribute update,
    # but convergence is declared once the overshoot is at rounding level,
    # with a hard cap as backstop, and the result is clipped to the cap.
    tol = 64.0 * jnp.finfo(sparsities.dtype).eps * jnp.maximum(max_sparsity, 1.0)
    max_iters = 10_000

    def cond(state):
        sp, it = state
        return jnp.any(sp > max_sparsity + tol) & (it < max_iters)

    def body(state):
        sp, it = state
        clamped = sp > max_sparsity
        excess = jnp.sum(jnp.where(clamped, sp - max_sparsity, 0.0))
        sp = jnp.where(clamped, max_sparsity, sp)
        free_w = jnp.where(clamped, 0.0, weights)
        denom = jnp.sum(free_w)
        # Redistribute proportionally among non-capped layers
        # (reference: src/compression_utils.py:110-122). If every layer is
        # capped the excess is dropped, matching the reference's
        # `if free.any()` guard.
        sp = jnp.where(denom > 0.0, sp + excess * free_w / jnp.maximum(denom, 1e-30), sp)
        return sp, it + 1

    sparsities, _ = jax.lax.while_loop(cond, body, (sparsities, jnp.asarray(0)))
    sparsities = jnp.minimum(sparsities, max_sparsity)
    return 1.0 - sparsities, jnp.max(sparsities)


def allocate_keep_ratios(
    bi_scores: Sequence[float] | jax.Array,
    compression_ratio: float,
    smoothing: float = 0.015,
    max_sparsity: float = 0.8,
    invert: bool = False,
    dtype=None,
):
    """Allocate per-layer keep ratios from BI scores.

    Returns ``(keep_ratios [L], max_layer_sparsity scalar)`` as host
    floats, mirroring the reference's return of ``(1 - sparsities)`` and
    its `max_layer_sparsity` metric (src/compression_utils.py:106-124).
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # Cast on the numpy side and fetch the result in ONE transfer: eager
    # jnp casts and per-element float(keep[i]) each compile a tiny
    # program — per-call AOT round trips on remote backends.
    npdt = np.dtype(dtype)
    keep, max_sp = _allocate(
        np.asarray(bi_scores, dtype=npdt),
        npdt.type(compression_ratio),
        npdt.type(smoothing),
        npdt.type(max_sparsity),
        invert,
    )
    return [float(x) for x in np.asarray(keep)], float(max_sp)
