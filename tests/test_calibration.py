"""Calibration-engine coverage beyond the pipeline tests: windowed
calibration over MoE and mixed dense/MoE stacks, and the gram-precision
knob (round-3 additions; the dense windowed path is covered by
tests/test_pipeline.py::test_windowed_calibration_matches_plain).

Reference mapping: the windowed path is the TPU answer to the
reference's layers_per_step chunking (src/run_modegpt.py:107) for
models whose weights fill device memory; the reference has no MoE and
no precision knob (its Grams are f64 accumulations of f32 matmuls,
src/adapters/LlamaAdapter.py:110-113).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.calib.engine import calibrate, calibrate_window
from modegpt_tpu.models.init import init_params
from modegpt_tpu.models.spec import ModelSpec


def _moe_spec(n_layers=3, moe_layers=(), shared=False, d_int=48, dense_d_int=96):
    gate_ranks = tuple(
        d_int if (not moe_layers or l in moe_layers) else dense_d_int
        for l in range(n_layers)
    )
    return ModelSpec(
        arch="qwen2_moe" if shared else "mixtral",
        vocab_size=128, d_model=64, n_layers=n_layers, n_heads=4, n_kv_heads=2,
        head_dim=16, d_int=d_int, max_position_embeddings=128, act="silu",
        norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64,) * n_layers, k_ranks=(32,) * n_layers,
        v_ranks=(32,) * n_layers, o_ranks=(64,) * n_layers,
        gate_ranks=gate_ranks,
        n_experts=4, experts_per_tok=2, moe_layers=tuple(moe_layers),
        shared_d_int=40 if shared else 0, shared_expert_gate=shared,
    )


def _assert_calib_equal(got, ref, layers, rtol=2e-5, atol=1e-6):
    assert sorted(got.cov_mlp) == sorted(layers)
    for l in layers:
        for field in ("cov_mlp", "cov_q", "cov_k", "cov_x"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, field)[l]),
                np.asarray(getattr(ref, field)[l]),
                rtol=rtol, atol=atol, err_msg=f"{field} layer {l}",
            )
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=rtol)


def test_window_moe_matches_calibrate(rng):
    """All-MoE stack with qwen2_moe shared experts: the windowed path's
    per-expert [E, D, D] and shared [Ds, Ds] tap slots must match plain
    calibrate at every window position (round 2 raised on MoE)."""
    import jax

    spec = _moe_spec(n_layers=3, shared=True)
    params = init_params(spec, jax.random.key(0))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1, 2], accumulate="host")

    for start in (0, 2):
        got = calibrate_window(spec, params, batches, start, width=2)
        layers = [l for l in (start, start + 1) if l < spec.n_layers]
        _assert_calib_equal(got, ref, layers)
        for l in layers:
            assert got.cov_mlp[l].shape == (spec.n_experts, spec.d_int, spec.d_int)
            np.testing.assert_allclose(
                np.asarray(got.cov_shared[l]), np.asarray(ref.cov_shared[l]),
                rtol=2e-5, atol=1e-6,
            )


def test_window_mixed_dense_moe(rng):
    """qwen3_moe-style mixed stack (dense layer 0/2, MoE layer 1): both
    tap kinds ride the same window, each layer filling only its own
    slot kind."""
    import jax

    spec = _moe_spec(n_layers=3, moe_layers=(1,))
    params = init_params(spec, jax.random.key(1))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0], accumulate="host")
    ref1 = calibrate(spec, params, batches, [1], accumulate="host")
    ref.cov_mlp.update(ref1.cov_mlp)
    ref.cov_q.update(ref1.cov_q)
    ref.cov_k.update(ref1.cov_k)
    ref.cov_x.update(ref1.cov_x)

    got = calibrate_window(spec, params, batches, 0, width=2)
    _assert_calib_equal(got, ref, [0, 1])
    assert got.cov_mlp[0].shape == (96, 96)  # dense layer keeps its own width
    assert got.cov_mlp[1].shape == (spec.n_experts, spec.d_int, spec.d_int)


def test_gram_precision_bf16_bounded(rng):
    """gram_precision='bf16' (single-pass MXU, f32 accumulate) must stay
    within bf16-rounding distance of the 'highest' oracle — this is the
    documented deviation bound for the speed knob."""
    import jax

    from modegpt_tpu.models.forward import _gram

    x = jnp.asarray(rng.standard_normal((512, 96)), jnp.float32)
    hi = np.asarray(_gram(x, "highest"), np.float64)
    lo = np.asarray(_gram(x, "bf16"), np.float64)
    md = np.asarray(_gram(x, "high"), np.float64)
    scale = np.linalg.norm(hi)
    # bf16 inputs carry ~2^-8 relative rounding; the Gram is a sum of
    # products so errors average out — 1% Frobenius is a loose ceiling
    # (measured ~2e-3 on this shape).
    assert np.linalg.norm(lo - hi) / scale < 1e-2
    assert np.linalg.norm(md - hi) / scale < 1e-3


def test_gram_precision_factor_deviation(rng, make_psd):
    """End-to-end knob evidence: Type-I factors solved from a bf16-pass
    Gram stay close to factors from the highest-precision Gram (the
    check backing the config.gram_precision docstring)."""
    import jax

    from modegpt_tpu.models.forward import _gram
    from modegpt_tpu.ops.mlp import nystrom_mlp

    n, d = 96, 32
    X = jnp.asarray(rng.standard_normal((1024, n)), jnp.float32)
    W_u = jnp.asarray(rng.standard_normal((n, d)) * 0.1, jnp.float32)
    W_d = jnp.asarray(rng.standard_normal((d, n)) * 0.1, jnp.float32)
    C_hi = _gram(X, "highest") / X.shape[0]
    C_lo = _gram(X, "bf16") / X.shape[0]
    f_hi = nystrom_mlp(C_hi, W_u, None, W_d, 0.7, 1e-2)
    f_lo = nystrom_mlp(C_lo, W_u, None, W_d, 0.7, 1e-2)
    # Column selection is discrete: require >= 90% index agreement, and
    # closeness of the re-solved down factor on the common columns.
    common = np.intersect1d(np.asarray(f_hi.idx), np.asarray(f_lo.idx))
    assert common.size >= int(0.9 * np.asarray(f_hi.idx).size)
    pos_hi = {int(c): i for i, c in enumerate(np.asarray(f_hi.idx))}
    pos_lo = {int(c): i for i, c in enumerate(np.asarray(f_lo.idx))}
    rows_hi = np.asarray(f_hi.down)[:, [pos_hi[int(c)] for c in common]]
    rows_lo = np.asarray(f_lo.down)[:, [pos_lo[int(c)] for c in common]]
    rel = np.linalg.norm(rows_hi - rows_lo) / max(np.linalg.norm(rows_hi), 1e-12)
    assert rel < 0.05


def test_calibrate_gram_precision_plumbs_through(rng):
    """calibrate(gram_precision='bf16') must flow to the tap einsums —
    detectable as a small, nonzero deviation from the default."""
    import jax

    spec = _moe_spec(n_layers=2, moe_layers=(), d_int=48)
    params = init_params(spec, jax.random.key(2))
    batches = load_calibration_batches(None, "synthetic", 2, 2, 32, vocab_size=128)
    hi = calibrate(spec, params, batches, [0], accumulate="host")
    lo = calibrate(spec, params, batches, [0], accumulate="host", gram_precision="bf16")
    a = np.asarray(hi.cov_x[0])
    b = np.asarray(lo.cov_x[0])
    assert not np.array_equal(a, b)
    assert np.linalg.norm(a - b) / np.linalg.norm(a) < 1e-2
