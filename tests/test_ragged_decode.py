"""Ragged flash-decoding kernel: numerics vs a dense reference, the
padded decode step, and the serving batcher (Pallas interpret mode on
CPU; on TPU the kernel's clamped block maps skip cache reads past each
slot's length)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modegpt_tpu.kernels.ragged_decode import ragged_gqa_decode


def _dense_ref(q, k, v, counts):
    B, H, Rv = q.shape[0], q.shape[1], v.shape[-1]
    G = H // k.shape[1]
    out = np.zeros((B, H, Rv), np.float32)
    for b in range(B):
        for h in range(H):
            kh = h // G
            s = np.asarray(q[b, h], np.float64) @ np.asarray(k[b, kh], np.float64).T
            s[int(counts[b]):] = -np.inf
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ np.asarray(v[b, kh], np.float64)
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


torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import params_from_hf_model  # noqa: E402
from modegpt_tpu.models.padded import (  # noqa: E402
    _model_step_padded,
    init_cache_padded,
    pad_to_uniform,
)
from modegpt_tpu.models.serving import ContinuousBatcher  # noqa: E402


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


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
