"""Type-I MLP decomposition — Nyström / ridge-leverage column selection.

TPU-native equivalent of the reference MLP solver
(reference: src/compression/compress_mlp.py). Given the Gram matrix ``C``
of the MLP intermediate activations (post-activation input to the down
projection), keep the ``rank`` columns with the smallest ridge-leverage
inverse-diagonal, slice the up/gate rows, and re-solve the down
projection in closed form:

    W_d' = (C_SS + eps*I)^-1 C_{S,:} W_d^T        (the Nyström reconstruction)

Weight layout convention: HF/torch ``[out_features, in_features]`` row-major,
matching the reference's saved factors so factor-level parity is testable.

Design note (TPU-first): the selection indices are data-dependent but the
*rank* is static per layer, so each stage is a fixed-shape XLA program.
For layer-batched execution on a mesh, `nystrom_mlp_padded` computes the
factorisation at a uniform padded rank with identity block-padding — the
padded solve is exactly block-diagonal, so the true factors are recovered
by slicing (no approximation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from modegpt_tpu.ops.psd import ridge_inverse_diag, cholesky_solve_ridged

__all__ = ["nystrom_scores", "nystrom_select", "nystrom_mlp", "nystrom_mlp_padded",
           "nystrom_select_padded", "nystrom_factor_padded"]

NYSTROM_SOLVE_RIDGE = 1e-6  # reference: src/compression/compress_mlp.py:56


class MLPFactors(NamedTuple):
    """Compressed MLP factors in HF weight layout.

    up:   [rank, d_model]
    gate: [rank, d_model] or None (OPT has no gate)
    down: [d_model, rank]
    idx:  [rank] sorted kept-column indices into the intermediate dim
    """

    up: jax.Array
    gate: Optional[jax.Array]
    down: jax.Array
    idx: jax.Array


def nystrom_scores(C: jax.Array, ridge: float) -> jax.Array:
    """Ridge-leverage inverse-diagonal scores; smaller = keep."""
    return ridge_inverse_diag(C, ridge)


@partial(jax.jit, static_argnames=("rank",))
def nystrom_select(scores: jax.Array, rank: int) -> jax.Array:
    """Bottom-`rank` score indices, sorted ascending.

    (reference: src/compression/compress_mlp.py:45-47 — topk smallest,
    then sorted.)
    """
    _, idx = jax.lax.top_k(-scores, rank)
    return jnp.sort(idx)


@partial(jax.jit, static_argnames=("rank",))
def _nystrom_factor(
    C: jax.Array,
    W_u: jax.Array,
    W_g: Optional[jax.Array],
    W_d: jax.Array,
    idx: jax.Array,
    rank: int,
):
    up = W_u[idx, :]
    gate = None if W_g is None else W_g[idx, :]
    C_SS = C[idx][:, idx]
    cross = C[idx, :] @ W_d.T  # [rank, d_model]
    down_T = cholesky_solve_ridged(C_SS, cross, NYSTROM_SOLVE_RIDGE)  # [rank, d_model]
    return up, gate, down_T.T


def nystrom_mlp(
    C: jax.Array,
    W_u: jax.Array,
    W_g: Optional[jax.Array],
    W_d: jax.Array,
    keep_ratio: float,
    ridge: float,
    rank: Optional[int] = None,
) -> MLPFactors:
    """Full Type-I solve for one layer.

    Args:
      C:   [D_int, D_int] activation Gram (normalised by token count).
      W_u: [D_int, d_model] up (fc1) weight.
      W_g: [D_int, d_model] gate weight, or None.
      W_d: [d_model, D_int] down (fc2) weight.
      keep_ratio: fraction of intermediate columns to keep.
      ridge: ridge-leverage lambda (config.nystrom_ridge).
      rank: explicit kept-column count, overriding keep_ratio.
    """
    d_int = C.shape[0]
    if rank is None:
        rank = max(1, int(d_int * keep_ratio))  # reference: compress_mlp.py:37
    scores = nystrom_scores(C, ridge)
    idx = nystrom_select(scores, rank)
    up, gate, down = _nystrom_factor(C, W_u, W_g, W_d, idx, rank)
    return MLPFactors(up=up, gate=gate, down=down, idx=idx)


@partial(jax.jit, static_argnames=("pad_rank",))
def nystrom_mlp_padded(
    C: jax.Array,
    W_u: jax.Array,
    W_g: jax.Array,
    W_d: jax.Array,
    rank: jax.Array,
    pad_rank: int,
    ridge: jax.Array,
):
    """Uniform-shape Type-I solve for layer-batched / mesh execution.

    ``rank`` may be a traced scalar; all shapes depend only on the static
    ``pad_rank >= rank``. The padded index set beyond ``rank`` is made
    inert by replacing its rows/columns of ``C_SS`` with the identity and
    zeroing its cross terms — the linear system becomes block-diagonal,
    so entries ``< rank`` of the solution equal the exact unpadded solve.

    Returns (up, gate, down, idx, valid_mask) where rows/cols >= rank are
    zeroed and must be sliced off by the host before persisting.
    """
    idx, valid = nystrom_select_padded(C, rank, pad_rank, ridge)
    up, gate, down = nystrom_factor_padded(C, W_u, W_g, W_d, idx, valid)
    return up, gate, down, idx, valid


@partial(jax.jit, static_argnames=("pad_rank",))
def nystrom_select_padded(C: jax.Array, rank: jax.Array, pad_rank: int, ridge: jax.Array):
    """Phase 1 of the padded solve: ridge-leverage scores + the ordered
    padded index set. Split out so memory-tight callers can retire the
    Cholesky-inverse workspace (the score computation's ~2x[D,D] live
    set) before the factor phase allocates its gathers."""
    scores = ridge_inverse_diag(C, ridge)
    # Push invalid (beyond-rank) picks to the end by masking scores.
    _, idx_full = jax.lax.top_k(-scores, pad_rank)
    pos = jnp.arange(pad_rank, dtype=jnp.int32)
    valid = pos < rank
    # Sort only the valid prefix ascending; invalid entries sort to the end.
    sort_keys = jnp.where(valid, idx_full, C.shape[0] + pos)
    order = jnp.argsort(sort_keys)
    idx = idx_full[order]
    valid = pos < rank  # after reorder the valid picks occupy the prefix
    return idx, valid


@jax.jit
def nystrom_factor_padded(C, W_u, W_g, W_d, idx, valid):
    """Phase 2 of the padded solve: slice + Nyström down re-solve."""
    pad_rank = idx.shape[0]
    up = jnp.where(valid[:, None], W_u[idx, :], 0.0)
    gate = jnp.where(valid[:, None], W_g[idx, :], 0.0)

    C_SS = C[idx][:, idx]
    eye = jnp.eye(pad_rank, dtype=C.dtype)
    keep2d = valid[:, None] & valid[None, :]
    C_SS = jnp.where(keep2d, C_SS, eye)
    cross = jnp.where(valid[:, None], C[idx, :] @ W_d.T, 0.0)
    down_T = cholesky_solve_ridged(C_SS, cross, NYSTROM_SOLVE_RIDGE)
    down = jnp.where(valid[:, None], down_T, 0.0).T
    return up, gate, down
