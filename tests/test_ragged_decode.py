"""Ragged flash-decoding kernel: numerics vs a dense reference (incl.
sliding windows, logit softcap, int8 KV), the padded decode step, and
the serving batcher (Pallas interpret mode on CPU; on TPU the kernel's
clamped block maps skip cache reads outside each slot's live window)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modegpt_tpu.kernels.ragged_decode import ragged_gqa_decode


def _dense_ref(q, k, v, counts, window=0, softcap=None,
               k_scale=None, v_scale=None):
    B, H, Rv = q.shape[0], q.shape[1], v.shape[-1]
    G = H // k.shape[1]
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    if k_scale is not None:
        k = k * np.asarray(k_scale, np.float64)[..., None]
        v = v * np.asarray(v_scale, np.float64)[..., None]
    out = np.zeros((B, H, Rv), np.float32)
    for b in range(B):
        lo = max(0, int(counts[b]) - window) if window > 0 else 0
        for h in range(H):
            kh = h // G
            s = np.asarray(q[b, h], np.float64) @ k[b, kh].T
            if softcap is not None:
                s = softcap * np.tanh(s / softcap)
            s[int(counts[b]):] = -np.inf
            s[:lo] = -np.inf
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ v[b, kh]
    return out


@pytest.mark.parametrize(
    "B,H,Hk,T,Rq,Rv,bt",
    [
        (4, 8, 2, 512, 40, 44, 128),   # GQA, compressed non-aligned ranks
        (3, 4, 4, 300, 64, 64, 256),   # MHA, T not a block multiple
        (2, 6, 3, 128, 88, 32, 128),   # single block, Rq != Rv
    ],
)
def test_ragged_kernel_matches_dense(rng, B, H, Hk, T, Rq, Rv, bt):
    q = jnp.asarray(rng.standard_normal((B, H, Rq)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, Rq)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, Rv)), jnp.float32)
    counts = np.r_[1, rng.integers(2, T, size=(B - 2,)), T].astype(np.int32)
    got = np.asarray(ragged_gqa_decode(q, k, v, jnp.asarray(counts), block_t=bt))
    np.testing.assert_allclose(got, _dense_ref(q, k, v, counts),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("window", [1, 7, 100, 512, 4096])
def test_ragged_kernel_sliding_window(rng, window):
    """Window clamps BOTH block-range ends: only [cnt-window, cnt) is
    attended, incl. windows smaller/larger than a block and than cnt."""
    B, H, Hk, T = 3, 4, 2, 512
    q = jnp.asarray(rng.standard_normal((B, H, 48)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, 48)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, 48)), jnp.float32)
    counts = np.asarray([1, 300, 512], np.int32)
    got = np.asarray(ragged_gqa_decode(
        q, k, v, jnp.asarray(counts), window=window, block_t=128))
    np.testing.assert_allclose(
        got, _dense_ref(q, k, v, counts, window=window), rtol=1e-5, atol=1e-5)


def test_ragged_kernel_window_zero_is_full(rng):
    B, H, Hk, T = 2, 4, 2, 256
    q = jnp.asarray(rng.standard_normal((B, H, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, 32)), jnp.float32)
    counts = jnp.asarray([100, 256], jnp.int32)
    full = ragged_gqa_decode(q, k, v, counts)
    w0 = ragged_gqa_decode(q, k, v, counts, window=0)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(w0))


def test_ragged_kernel_softcap(rng):
    B, H, Hk, T = 2, 4, 2, 384
    q = jnp.asarray(rng.standard_normal((B, H, 32)) * 4, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, 32)) * 4, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, 32)), jnp.float32)
    counts = np.asarray([5, 300], np.int32)
    got = np.asarray(ragged_gqa_decode(
        q, k, v, jnp.asarray(counts), softcap=50.0, block_t=128))
    np.testing.assert_allclose(
        got, _dense_ref(q, k, v, counts, softcap=50.0), rtol=1e-5, atol=1e-5)


def test_ragged_kernel_int8_cache(rng):
    """int8 codes + per-position scales: the kernel's
    score-column/probability-row scale folding must equal dequantising
    the cache up front (f32: both orders are exact to reduction order)."""
    B, H, Hk, T, R = 3, 8, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, R)), jnp.float32)
    codes_k = rng.integers(-127, 128, size=(B, Hk, T, R)).astype(np.int8)
    codes_v = rng.integers(-127, 128, size=(B, Hk, T, R)).astype(np.int8)
    ksc = (rng.random((B, Hk, T)) * 0.05 + 1e-3).astype(np.float32)
    vsc = (rng.random((B, Hk, T)) * 0.05 + 1e-3).astype(np.float32)
    counts = np.asarray([2, 317, 512], np.int32)
    got = np.asarray(ragged_gqa_decode(
        q, jnp.asarray(codes_k), jnp.asarray(codes_v), jnp.asarray(counts),
        k_scale=jnp.asarray(ksc), v_scale=jnp.asarray(vsc), block_t=128))
    ref = _dense_ref(q, codes_k, codes_v, counts, k_scale=ksc, v_scale=vsc)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # int8 + window + softcap compose
    got = np.asarray(ragged_gqa_decode(
        q, jnp.asarray(codes_k), jnp.asarray(codes_v), jnp.asarray(counts),
        k_scale=jnp.asarray(ksc), v_scale=jnp.asarray(vsc),
        window=130, softcap=30.0, block_t=128))
    ref = _dense_ref(q, codes_k, codes_v, counts, window=130, softcap=30.0,
                     k_scale=ksc, v_scale=vsc)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="k_scale"):
        ragged_gqa_decode(q, jnp.asarray(codes_k), jnp.asarray(codes_v),
                          jnp.asarray(counts), k_scale=jnp.asarray(ksc))


def test_ragged_kernel_ignores_garbage_past_count(rng):
    """Positions >= counts[b] must not influence the output — overwrite
    them with huge garbage and compare against the clean cache."""
    B, H, Hk, T, R = 2, 4, 2, 256, 48
    q = jnp.asarray(rng.standard_normal((B, H, R)), jnp.float32)
    k = rng.standard_normal((B, Hk, T, R)).astype(np.float32)
    v = rng.standard_normal((B, Hk, T, R)).astype(np.float32)
    counts = np.asarray([7, 200], np.int32)
    clean = np.asarray(ragged_gqa_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(counts)))
    for b in range(B):
        k[b, :, counts[b]:] = 1e9
        v[b, :, counts[b]:] = -1e9
    dirty = np.asarray(ragged_gqa_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(counts)))
    np.testing.assert_array_equal(clean, dirty)


# ---------------------------------------------------------------------------
# multi-position queries (ragged_gqa_attend): prefill chunks / speculative
# verify — query s at absolute position pos[b]+s attends t <= pos[b]+s
# ---------------------------------------------------------------------------

from modegpt_tpu.kernels.ragged_decode import ragged_gqa_attend  # noqa: E402


def _dense_ref_multi(q, k, v, pos, window=0, softcap=None,
                     k_scale=None, v_scale=None):
    B, H, S = q.shape[0], q.shape[1], q.shape[2]
    Rv = v.shape[-1]
    G = H // k.shape[1]
    k = np.asarray(k, np.float64)
    v = np.asarray(v, np.float64)
    if k_scale is not None:
        k = k * np.asarray(k_scale, np.float64)[..., None]
        v = v * np.asarray(v_scale, np.float64)[..., None]
    out = np.zeros((B, H, S, Rv), np.float32)
    for b in range(B):
        for s_ix in range(S):
            limit = int(pos[b]) + s_ix
            lo = max(0, limit + 1 - window) if window > 0 else 0
            for h in range(H):
                kh = h // G
                sc = np.asarray(q[b, h, s_ix], np.float64) @ k[b, kh].T
                if softcap is not None:
                    sc = softcap * np.tanh(sc / softcap)
                sc[limit + 1:] = -np.inf
                sc[:lo] = -np.inf
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[b, h, s_ix] = p @ v[b, kh]
    return out


@pytest.mark.parametrize("S,window,softcap", [
    (4, 0, None),        # plain causal chunk
    (8, 100, None),      # sliding window crossing block edges
    (3, 0, 40.0),        # softcap
])
def test_ragged_attend_multi_matches_dense(rng, S, window, softcap):
    B, H, Hk, T, R = 3, 4, 2, 512, 48
    q = jnp.asarray(rng.standard_normal((B, H, S, R)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, R)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, R)), jnp.float32)
    pos = np.asarray([0, 200, T - S], np.int32)  # incl. first chunk + pool edge
    got = np.asarray(ragged_gqa_attend(
        q, k, v, jnp.asarray(pos), window=window or None,
        softcap=softcap, block_t=128))
    ref = _dense_ref_multi(q, k, v, pos, window=window, softcap=softcap)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ragged_attend_multi_int8(rng):
    """Multi-position + int8 codes: scale folding matches up-front
    dequantisation."""
    B, H, Hk, T, R, S = 2, 8, 2, 384, 64, 5
    q = jnp.asarray(rng.standard_normal((B, H, S, R)), jnp.float32)
    ck = rng.integers(-127, 128, size=(B, Hk, T, R)).astype(np.int8)
    cv = rng.integers(-127, 128, size=(B, Hk, T, R)).astype(np.int8)
    ksc = (rng.random((B, Hk, T)) * 0.05 + 1e-3).astype(np.float32)
    vsc = (rng.random((B, Hk, T)) * 0.05 + 1e-3).astype(np.float32)
    pos = np.asarray([3, 250], np.int32)
    got = np.asarray(ragged_gqa_attend(
        q, jnp.asarray(ck), jnp.asarray(cv), jnp.asarray(pos),
        k_scale=jnp.asarray(ksc), v_scale=jnp.asarray(vsc), block_t=128))
    ref = _dense_ref_multi(q, ck, cv, pos, k_scale=ksc, v_scale=vsc)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ragged_attend_s1_equals_decode(rng):
    """The decode wrapper is exactly attend at S=1, pos=counts-1."""
    B, H, Hk, T, R = 2, 4, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((B, H, R)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, R)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, R)), jnp.float32)
    counts = jnp.asarray([9, 201], jnp.int32)
    a = ragged_gqa_decode(q, k, v, counts)
    b = ragged_gqa_attend(q[:, :, None, :], k, v, counts - 1)[:, :, 0, :]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import params_from_hf_model  # noqa: E402
from modegpt_tpu.models.padded import (  # noqa: E402
    _model_step_padded,
    init_cache_padded,
    pad_to_uniform,
)
from modegpt_tpu.models.serving import ContinuousBatcher, init_serve_state  # noqa: E402


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_gemma2(seed=0):
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        max_position_embeddings=128, sliding_window=8,
        query_pre_attn_scalar=32, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    torch.manual_seed(seed)
    return transformers.Gemma2ForCausalLM(cfg).eval()


def test_padded_step_ragged_matches_xla(rng):
    """One ragged decode step through the full padded stack: logits with
    decode_attn='ragged' match the masked XLA contraction (CPU f32;
    reduction-order tolerance only)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    B, max_len = 3, 64
    ck, cv, _ = init_cache_padded(pm, B, max_len)
    lengths = jnp.asarray([5, 17, 1], jnp.int32)
    # write unique junk into the caches so ragged masking is observable
    ck = ck + jnp.asarray(rng.standard_normal(ck.shape), ck.dtype) * 0.3
    cv = cv + jnp.asarray(rng.standard_normal(cv.shape), cv.dtype) * 0.3
    tokens = jnp.asarray(rng.integers(1, 100, size=(B, 1)), jnp.int32)

    lx, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="xla",
    )
    lr, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="ragged",
    )
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lx),
                               rtol=2e-5, atol=2e-5)


def test_padded_step_ragged_gemma2_windows_softcap(rng):
    """gemma2's alternating sliding/full layers (traced per-layer window
    through the scan) + attention softcap through the ragged kernel:
    logits match the XLA path at lengths beyond the window."""
    spec, params = params_from_hf_model(_tiny_gemma2())
    assert spec.mixed_windows and spec.attn_logit_softcap == 50.0
    pm = pad_to_uniform(spec, params)
    B, max_len = 3, 64
    ck, cv, _ = init_cache_padded(pm, B, max_len)
    lengths = jnp.asarray([3, 21, 50], jnp.int32)  # 21, 50 > window 8
    ck = ck + jnp.asarray(rng.standard_normal(ck.shape), ck.dtype) * 0.3
    cv = cv + jnp.asarray(rng.standard_normal(cv.shape), cv.dtype) * 0.3
    tokens = jnp.asarray(rng.integers(1, 100, size=(B, 1)), jnp.int32)

    lx, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="xla",
    )
    lr, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="ragged",
    )
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lx),
                               rtol=2e-5, atol=2e-5)


def test_padded_step_ragged_int8_matches_xla(rng):
    """int8 KV through the ragged kernel (codes to the MXU, scales
    folded) vs the XLA dequant-slab path: same quantisation, same
    logits up to matmul-order effects."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    B, max_len = 3, 64
    st = init_serve_state(pm, B, max_len, kv_dtype="int8")
    ck, cv = st.cache_k, st.cache_v
    ks, vs = st.scales
    # junk codes + plausible scales so ragged masking is observable
    ck = ck + jnp.asarray(rng.integers(-40, 40, size=ck.shape), ck.dtype)
    cv = cv + jnp.asarray(rng.integers(-40, 40, size=cv.shape), cv.dtype)
    ks = ks + jnp.asarray(rng.random(ks.shape) * 0.02, ks.dtype)
    vs = vs + jnp.asarray(rng.random(vs.shape) * 0.02, vs.dtype)
    lengths = jnp.asarray([5, 17, 1], jnp.int32)
    tokens = jnp.asarray(rng.integers(1, 100, size=(B, 1)), jnp.int32)

    lx, _, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, cache_scales=(ks.copy(), vs.copy()),
        decode_attn="xla",
    )
    lr, _, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, cache_scales=(ks.copy(), vs.copy()),
        decode_attn="ragged",
    )
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)


def test_padded_step_ragged_multi_position(rng):
    """A multi-token chunk (prefill/verify shape) through the padded
    stack: ragged logits match the masked XLA contraction at every
    position."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    B, S, max_len = 3, 4, 64
    ck, cv, _ = init_cache_padded(pm, B, max_len)
    lengths = jnp.asarray([0, 17, 33], jnp.int32)  # incl. a first chunk
    ck = ck + jnp.asarray(rng.standard_normal(ck.shape), ck.dtype) * 0.3
    cv = cv + jnp.asarray(rng.standard_normal(cv.shape), cv.dtype) * 0.3
    tokens = jnp.asarray(rng.integers(1, 100, size=(B, S)), jnp.int32)

    lx, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="xla",
    )
    lr, _, _, _ = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, tokens,
        ck.copy(), cv.copy(), lengths, decode_attn="ragged",
    )
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lx),
                               rtol=2e-5, atol=2e-5)


def test_batcher_ragged_batched_prefill_and_spec(rng):
    """decode_attn='ragged' through the multi-position serving paths —
    batched prefill chunks and prompt-lookup speculative verify — must
    reproduce the xla batcher's greedy streams."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (5, 21, 9)]

    for kw in (
        dict(prefill_exec="batched"),
        dict(spec_decode="prompt_lookup", n_draft=3),
    ):
        bx = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                               eos_token_id=127, **kw)
        rids = [bx.submit(p, max_new_tokens=6) for p in prompts]
        ref_out = bx.run()
        ref = [ref_out[r] for r in rids]

        br = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                               eos_token_id=127, decode_attn="ragged", **kw)
        rids = [br.submit(p, max_new_tokens=6) for p in prompts]
        got_out = br.run()
        for a, r in zip(ref, rids):
            assert got_out[r] == a, f"diverged under {kw}"


def test_batcher_ragged_decode_serves(rng):
    """End-to-end serving with decode_attn='ragged' (interpret mode):
    mixed prompt lengths, slot reuse — outputs match the xla batcher's
    logits path token-for-token on this well-separated tiny model."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (3, 9, 5)]

    bx = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127)
    ref = {}
    for i, p in enumerate(prompts):
        rid = bx.submit(p, max_new_tokens=6)
        ref[i] = bx.run()[rid]

    br = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, decode_attn="ragged")
    rids = [br.submit(p, max_new_tokens=6) for p in prompts]
    done = br.run()
    for i, rid in enumerate(rids):
        assert done[rid] == ref[i]

    with pytest.raises(ValueError, match="decode_attn"):
        ContinuousBatcher(pm, slots=1, max_len=32, prefill_bucket=8,
                          decode_attn="nope")


def test_batcher_ragged_int8_serves(rng):
    """kv_dtype='int8' + decode_attn='ragged': token-for-token with the
    int8 xla batcher (same quantisation; this tiny model's greedy
    stream is robust to matmul-order wiggle)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (4, 11)]

    bx = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, kv_dtype="int8")
    ref = [bx.submit(p, max_new_tokens=5) for p in prompts]
    ref_out = bx.run()

    br = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, kv_dtype="int8",
                           decode_attn="ragged")
    rids = [br.submit(p, max_new_tokens=5) for p in prompts]
    done = br.run()
    for rr, rg in zip(ref, rids):
        assert done[rg] == ref_out[rr]


# ---------------------------------------------------------------------------
# tensor-parallel ragged decode: the Pallas kernel is opaque to GSPMD, so
# under a TP mesh _layer_padded wraps it in shard_map over "model" (heads
# are attention-local -> per-head math is UNCHANGED by the head sharding,
# so TP output must equal single-device ragged output exactly on CPU f32)
# ---------------------------------------------------------------------------


def _tp_mesh(data=2, model=2):
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < data * model:
        pytest.skip(f"needs {data * model} devices")
    return Mesh(np.asarray(devs[: data * model]).reshape(data, model),
                ("data", "model"))


def _run_batcher(pm, prompts, rng_unused=None, **kw):
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=127, **kw)
    rids = [b.submit(p, max_new_tokens=6) for p in prompts]
    out = b.run()
    return [out[r] for r in rids]


def test_batcher_tp_ragged_matches_single_device(rng):
    """TP-mesh ragged decode (shard_map over 'model') must emit exactly
    the single-device ragged batcher's tokens — head sharding does not
    change any head's reduction order."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (5, 9, 3)]
    ref = _run_batcher(pm, prompts, decode_attn="ragged")
    got = _run_batcher(pm, prompts, decode_attn="ragged", mesh=_tp_mesh())
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_batcher_tp_ragged_int8_and_fused(rng):
    """int8 KV (scale operands through the shard_map) + fused multi-step
    decode under the TP mesh, vs the single-device int8 ragged batcher."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (4, 11)]
    ref = _run_batcher(pm, prompts, decode_attn="ragged", kv_dtype="int8")
    got = _run_batcher(pm, prompts, decode_attn="ragged", kv_dtype="int8",
                       mesh=_tp_mesh(), steps_per_dispatch=3)
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_batcher_tp_ragged_gemma2_traced_window(rng):
    """gemma2's per-layer traced window rides the shard_map as a scalar
    operand (mixed sliding/full layers + softcap under TP)."""
    spec, params = params_from_hf_model(_tiny_gemma2())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (5, 13)]
    ref = _run_batcher(pm, prompts, decode_attn="ragged")
    got = _run_batcher(pm, prompts, decode_attn="ragged", mesh=_tp_mesh())
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_decode_attn_auto_hybrid(rng):
    """decode_attn='auto' resolves per DISPATCH TYPE from the hardware
    captures: on TPU, ragged for the multi-position prefill/mixed
    programs (won both measured load regimes), and xla for PURE decode
    at every pool size — the r04 controlled sweep
    (bench_results/r04/decode_sweep, 4k..131k pool rows) showed the xla
    full-pool contraction winning pure decode everywhere, overriding
    the confounded r03 16x1024 load-pair inference. Off-TPU auto is
    all-xla (the interpret-mode kernel is for tests). The forced
    hybrid must stream the same greedy tokens as the all-xla batcher
    through batched prefill, mixed rounds and pure decode."""
    from modegpt_tpu.models.serving import resolve_auto_decode_attn

    # the measured regimes pin the policy (r04 sweep: xla pure decode
    # at every pool; ragged prefill stands)
    assert resolve_auto_decode_attn(16, 1024, on_tpu=True) == ("xla", "ragged")
    assert resolve_auto_decode_attn(64, 2048, on_tpu=True) == ("xla", "ragged")
    assert resolve_auto_decode_attn(16, 1024, on_tpu=False) == ("xla", "xla")

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 100, size=(p,)).astype(np.int32)
               for p in (5, 21, 9, 13)]

    ba = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, prefill_exec="batched")
    # this suite runs on CPU: auto resolves to all-xla
    assert (ba.decode_attn, ba.prefill_attn) == ("xla", "xla")
    rids = [ba.submit(p, max_new_tokens=6) for p in prompts]
    out = ba.run()
    ref = [out[r] for r in rids]

    # explicit backends still force every dispatch
    bf = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, decode_attn="ragged")
    assert (bf.decode_attn, bf.prefill_attn) == ("ragged", "ragged")

    bh = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, prefill_exec="batched")
    bh.prefill_attn = "ragged"  # what auto picks on a TPU backend
    rids = [bh.submit(p, max_new_tokens=6) for p in prompts]
    got = bh.run()
    for a, r in zip(ref, rids):
        assert got[r] == a
