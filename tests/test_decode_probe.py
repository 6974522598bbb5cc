"""decode_attn='auto' measured resolution (models/decode_probe.py):
the startup A/B probe runs the real fused decode program per backend,
persists a per-environment record, and later starts resolve from the
record without re-timing. The swept constant policy remains the
fallback (VERDICT r4 weak-6)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import params_from_hf_model
from modegpt_tpu.models.decode_probe import (
    _probe_key,
    probe_decode_attn,
    resolve_decode_attn_measured,
)
from modegpt_tpu.models.padded import pad_to_uniform


def _tiny_pm(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    return pad_to_uniform(spec, params)


def test_probe_times_both_backends():
    """The probe runs the real fused decode program under each backend
    and reports per-step medians + a winner (CPU: the ragged kernel
    runs in interpret mode, so only validity is asserted, not which
    side wins)."""
    pm = _tiny_pm()
    out = probe_decode_attn(pm, slots=2, max_len=64, steps=4, reps=2)
    assert out["winner"] in ("xla", "ragged")
    assert out["xla_ms"] > 0 and out["ragged_ms"] > 0
    assert out["winner"] == (
        "ragged" if out["ragged_ms"] < out["xla_ms"] else "xla"
    )


def test_record_roundtrip_and_policy_optout(tmp_path, monkeypatch):
    """First resolve probes and persists; the second resolves purely
    from the record (a probe would blow up via the monkeypatch);
    MODEGPT_DECODE_AUTO=policy disables measurement entirely."""
    rec_path = tmp_path / "decode_auto.json"
    monkeypatch.setenv("MODEGPT_DECODE_AUTO_RECORD", str(rec_path))
    pm = _tiny_pm()

    import modegpt_tpu.models.decode_probe as dp

    monkeypatch.setattr(
        dp, "probe_decode_attn",
        lambda *a, **k: {"winner": "ragged", "xla_ms": 2.0, "ragged_ms": 1.0},
    )
    assert resolve_decode_attn_measured(pm, 2, 64) == "ragged"
    rec = json.loads(rec_path.read_text())
    assert list(rec.values())[0]["winner"] == "ragged"

    def _boom(*a, **k):
        raise AssertionError("record hit must not re-probe")

    monkeypatch.setattr(dp, "probe_decode_attn", _boom)
    assert resolve_decode_attn_measured(pm, 2, 64) == "ragged"
    # a different pool geometry is a different key -> would probe again
    # (and the probe failure falls back to None, not an exception)
    assert (
        resolve_decode_attn_measured(pm, 4, 64) is None
        or _probe_key(pm.spec, 4, 64, "model") in rec
    )

    monkeypatch.setenv("MODEGPT_DECODE_AUTO", "policy")
    monkeypatch.setattr(dp, "probe_decode_attn", _boom)
    assert resolve_decode_attn_measured(pm, 2, 64) is None


def test_probe_key_separates_geometry():
    pm = _tiny_pm()
    k1 = _probe_key(pm.spec, 2, 64, "model")
    k2 = _probe_key(pm.spec, 4, 64, "model")
    k3 = _probe_key(pm.spec, 2, 64, "int8")
    assert len({k1, k2, k3}) == 3


def test_probe_failure_never_raises(monkeypatch, tmp_path):
    """resolve must degrade to the constant policy (None) when the
    probe itself fails — a broken probe must never block serving."""
    monkeypatch.setenv(
        "MODEGPT_DECODE_AUTO_RECORD", str(tmp_path / "r.json")
    )
    import modegpt_tpu.models.decode_probe as dp

    def _boom(*a, **k):
        raise RuntimeError("probe broke")

    monkeypatch.setattr(dp, "probe_decode_attn", _boom)
    pm = _tiny_pm()
    assert resolve_decode_attn_measured(pm, 2, 64) is None
