"""Artifact-contract interop: our exports loaded by the REFERENCE's Rebuilds.

The reference's compressed-checkpoint contract is an HF directory whose
config carries per-layer rank lists + ``mask_path`` and whose weights are
consumed by the vendored Rebuild modeling files
(``/root/reference/src/patchers/{LlamaRebuild,DenseQwenRebuild,OPTRebuild}.py``,
wired via auto_map at model_utils.py:94-126). These tests close the loop
the round-1 review flagged: compress a tiny model with OUR pipeline,
export with ``hf_export.export_to_hf``, then instantiate the reference's
own Rebuild class from the exported config, load the exported state dict
strictly, and assert logit parity with our forward.

CPU patch: LlamaRebuild.py:449 torch.loads the rotary masks with
map_location="cuda"; we wrap torch.load to force CPU (same spirit as the
golden tests' d1/d2 patches).

Skipped automatically when the reference tree is not mounted.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.hf_export import export_to_hf

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference tree not mounted"
)


@pytest.fixture(autouse=True)
def _cpu_torch_load(monkeypatch):
    """Force map_location=cpu for every torch.load (LlamaRebuild.py:449)."""
    orig = torch.load

    def cpu_load(*args, **kwargs):
        kwargs["map_location"] = "cpu"
        return orig(*args, **kwargs)

    monkeypatch.setattr(torch, "load", cpu_load)


def _rebuild_module(name):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return importlib.import_module(f"src.patchers.{name}")


def _compress_and_export(spec, params, tmp_path, seq_len=48):
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=seq_len, compression_ratio=0.3, sparsity_smoothing=0.5,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    out = export_to_hf(cspec, cparams, str(tmp_path / "export"), tokenizer_source="src")
    return cspec, cparams, out


def _load_rebuild(cls, out_dir):
    """Instantiate a reference Rebuild class from an exported directory and
    strictly load the exported weights into it."""
    from safetensors.torch import load_file

    cfg = transformers.AutoConfig.from_pretrained(out_dir)
    cfg._attn_implementation = "eager"
    model = cls(cfg)
    sd = load_file(os.path.join(out_dir, "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert unexpected == [], f"export carries keys the Rebuild rejects: {unexpected}"
    assert missing == [], f"Rebuild expects keys the export lacks: {missing}"
    return model.eval()


def _assert_logit_parity(cspec, cparams, model, rng, vocab):
    ids = rng.integers(0, vocab, size=(2, 16)).astype(np.int32)
    ours, _ = forward(cspec, cparams, jnp.asarray(ids))
    with torch.no_grad():
        theirs = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_llama_export_loads_via_reference_rebuild(tmp_path, rng):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,  # MHA: LlamaRebuild's tested path
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    cspec, cparams, out = _compress_and_export(spec, params, tmp_path)
    assert any(r < spec.q_ranks[l] for l, r in enumerate(cspec.q_ranks))

    LR = _rebuild_module("LlamaRebuild")
    model = _load_rebuild(LR.LlamaForCausalLM, out)
    # the Rebuild actually consumed the masks from config.mask_path
    assert model.model.layers[0].self_attn.layer_rotary_mask is not None
    _assert_logit_parity(cspec, cparams, model, rng, 128)


def test_qwen3_export_loads_via_reference_rebuild(tmp_path, rng):
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    spec, params = params_from_hf_model(transformers.Qwen3ForCausalLM(cfg).eval())
    cspec, cparams, out = _compress_and_export(spec, params, tmp_path)

    QR = _rebuild_module("DenseQwenRebuild")
    model = _load_rebuild(QR.Qwen3ForCausalLM, out)
    assert model.model.layers[0].self_attn.layer_rotary_mask is not None
    _assert_logit_parity(cspec, cparams, model, rng, 128)


def test_opt_export_loads_via_reference_rebuild(tmp_path, rng):
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=64, ffn_dim=176, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=64, enable_bias=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    spec, params = params_from_hf_model(transformers.OPTForCausalLM(cfg).eval())
    cspec, cparams, out = _compress_and_export(spec, params, tmp_path)

    # OPTRebuild.py:126-127 reads qk_ranks/vo_ranks — the export must emit
    # them alongside q_ranks/... (the reference's own writers never did).
    import json

    cfg_json = json.load(open(os.path.join(out, "config.json")))
    assert cfg_json["qk_ranks"] == list(cspec.q_ranks)
    assert cfg_json["vo_ranks"] == list(cspec.v_ranks)

    OR = _rebuild_module("OPTRebuild")
    model = _load_rebuild(OR.OPTForCausalLM, out)
    _assert_logit_parity(cspec, cparams, model, rng, 128)
