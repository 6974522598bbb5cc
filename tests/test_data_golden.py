"""Loader + eval-harness golden parity: the reference's OWN loader code
(src/eval.py) is the oracle, run offline with `datasets.load_dataset`
monkeypatched to deterministic local corpora.

Round-1 review: "the loaders are never oracle-tested against the
reference's loader code" — these tests close that. Both sides share one
byte-level tokenizer, so parity is about chunking/sampling/formatting
semantics, not vocabulary:

* wikitext/c4 calibration: join -> tokenize -> 2048-chunk ->
  np.random.seed(1234) choice -> batches (eval.py:33-68);
* alpaca calibration: HF datasets shuffle(seed=1234) -> format ->
  token-stream -> [calib, seq] view (eval.py:71-119);
* alpaca holdout: last-500 pseudo test set, response appended, no eos
  (eval.py:228-254);
* full wikitext PPL: reference compute_perplexity (join, window, CE,
  exp(sum/(n*(s-1)))) vs our load_eval_tokens + compute_perplexity on
  the same torch-initialised weights (eval.py:134-225);
* per-sample alpaca PPL: reference evaluate_perplexity_alpaca vs our
  compute_perplexity_alpaca (eval.py:257-295).

Skipped automatically when the reference tree is not mounted.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference tree not mounted"
)


class Enc(dict):
    """Minimal BatchEncoding stand-in: dict + .input_ids + .to()."""

    @property
    def input_ids(self):
        return self["input_ids"]

    def to(self, *a, **k):
        return self


class ByteTokenizer:
    """Deterministic byte-level tokenizer shared by both pipelines."""

    eos_token = "\x00"

    def __call__(self, text, return_tensors=None, add_special_tokens=True,
                 truncation=False, max_length=None, **kw):
        ids = [b % 120 + 1 for b in text.encode("utf-8")]
        if truncation and max_length:
            ids = ids[:max_length]
        if return_tensors == "pt":
            return Enc({"input_ids": torch.tensor([ids], dtype=torch.long)})
        return {"input_ids": ids}


@pytest.fixture()
def ref_eval(monkeypatch):
    """Import src.eval with its cuda touchpoints routed to cpu."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ev = importlib.import_module("src.eval")

    orig_to = torch.Tensor.to

    def cpu_to(self, *args, **kwargs):
        args = tuple("cpu" if (isinstance(a, str) and "cuda" in a) else a for a in args)
        if isinstance(kwargs.get("device"), str) and "cuda" in kwargs["device"]:
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", cpu_to)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    monkeypatch.setattr(torch.cuda, "empty_cache", lambda *a, **k: None)
    return ev


class _ModelStub:
    """Only .config.max_position_embeddings is read by the ref loaders."""

    def __init__(self, max_pos):
        import types

        self.config = types.SimpleNamespace(max_position_embeddings=max_pos)


def _patch_corpora(monkeypatch, ref_eval, wikitext=None, c4=None, alpaca=None):
    """Route both pipelines' load_dataset to local corpora."""
    import datasets as hf_datasets

    def fake_load(name, *args, **kwargs):
        if name == "wikitext":
            return {"text": wikitext}
        if name == "json":  # the c4 shard URLs
            split = next(iter(kwargs["data_files"]))
            return {split: {"text": c4}}
        if name == "tatsu-lab/alpaca":
            return hf_datasets.Dataset.from_list(alpaca)
        raise AssertionError(f"unexpected dataset {name}")

    monkeypatch.setattr(ref_eval, "load_dataset", fake_load)
    monkeypatch.setattr(hf_datasets, "load_dataset", fake_load)


def _ref_batches_to_array(batches):
    return np.concatenate([b.cpu().numpy() for b in batches], axis=0)


def test_wikitext_calibration_golden(monkeypatch, ref_eval):
    texts = [f"sentence number {i}, with some filler words." for i in range(80)]
    _patch_corpora(monkeypatch, ref_eval, wikitext=texts)
    tok = ByteTokenizer()
    seq_len = 64

    ref = ref_eval.load_calibration_texts(
        calib_size=6, model=_ModelStub(seq_len), tokenizer=tok, batch_size=2,
        dataset="wikitext",
    )
    from modegpt_tpu.calib.data import load_calibration_batches

    ours = load_calibration_batches(tok, "wikitext", calib_size=6, batch_size=2,
                                    seq_len=seq_len)
    np.testing.assert_array_equal(
        np.concatenate(ours, axis=0), _ref_batches_to_array(ref)
    )
    assert [b.shape for b in ref] == [tuple(b.shape) for b in ours]


def test_c4_calibration_golden(monkeypatch, ref_eval):
    texts = [f"c4 document {i} " * 3 for i in range(40)] + ["", "  "]
    _patch_corpora(monkeypatch, ref_eval, c4=texts)
    tok = ByteTokenizer()
    seq_len = 48

    ref = ref_eval.load_calibration_texts(
        calib_size=4, model=_ModelStub(seq_len), tokenizer=tok, batch_size=2,
        dataset="c4",
    )
    from modegpt_tpu.calib.data import load_calibration_batches

    ours = load_calibration_batches(tok, "c4", calib_size=4, batch_size=2,
                                    seq_len=seq_len)
    np.testing.assert_array_equal(
        np.concatenate(ours, axis=0), _ref_batches_to_array(ref)
    )


def _alpaca_rows(n):
    return [
        {
            "instruction": f"explain concept number {i} in a sentence",
            "input": f"context {i}" if i % 3 == 0 else "",
            "output": f"concept {i} means repetition of idea {i}.",
        }
        for i in range(n)
    ]


def test_alpaca_calibration_golden(monkeypatch, ref_eval):
    """Formatting templates, HF shuffle(seed=1234), eos append, and the
    token-stream -> [calib, seq] view must all match the reference."""
    _patch_corpora(monkeypatch, ref_eval, alpaca=_alpaca_rows(60))
    tok = ByteTokenizer()
    seq_len = 96

    ref = ref_eval.load_alpaca_texts(
        calib_size=4, model=_ModelStub(seq_len), tokenizer=tok, batch_size=2
    )
    from modegpt_tpu.calib.data import load_calibration_batches

    ours = load_calibration_batches(tok, "alpaca", calib_size=4, batch_size=2,
                                    seq_len=seq_len)
    np.testing.assert_array_equal(
        np.concatenate(ours, axis=0), _ref_batches_to_array(ref)
    )


def test_alpaca_holdout_texts_golden(monkeypatch, ref_eval):
    """Holdout pseudo test set: last-n rows, response appended, NO eos."""
    _patch_corpora(monkeypatch, ref_eval, alpaca=_alpaca_rows(510))
    ref_texts = ref_eval.get_alpaca_eval_data(n_samples=500)

    from modegpt_tpu.calib.data import _alpaca_texts

    ours = _alpaca_texts(ByteTokenizer(), calib=False, n_holdout=500)
    assert ours == ref_texts


def _tiny_llama(max_pos):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=max_pos, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_wikitext_eval_ppl_golden(monkeypatch, ref_eval):
    """Loader AND harness: the reference's compute_perplexity (hardcoded
    2048-token windows, joined test split, exp(sum/(n*(s-1)))) vs our
    load_eval_tokens + compute_perplexity on identical weights."""
    texts = [f"evaluation sentence {i} with deterministic words." for i in range(160)]
    _patch_corpora(monkeypatch, ref_eval, wikitext=texts)
    tok = ByteTokenizer()
    m = _tiny_llama(2048)

    ref_ppl = ref_eval.compute_perplexity(m, tok, bs=2, device="cpu", dataset="wikitext")

    from modegpt_tpu.calib.data import load_eval_tokens
    from modegpt_tpu.evals.perplexity import compute_perplexity
    from modegpt_tpu.models import params_from_hf_model

    spec, params = params_from_hf_model(m)
    tokens = load_eval_tokens(tok, "wikitext", seq_len=2048)
    ppl = compute_perplexity(spec, params, tokens, batch_size=2, progress=False)
    np.testing.assert_allclose(ppl, ref_ppl, rtol=2e-4)


def test_alpaca_per_sample_ppl_golden(monkeypatch, ref_eval):
    """Per-sample truncated-window alpaca PPL: the reference's ACTUAL
    evaluate_perplexity_alpaca (per-text mean CE, L-weighted combine,
    non-finite skip, eval.py:257-295) as oracle, with its holdout
    loader pinned to 12 synthetic texts on both sides."""
    _patch_corpora(monkeypatch, ref_eval, alpaca=_alpaca_rows(505))
    tok = ByteTokenizer()
    m = _tiny_llama(2048)  # the ref function hardcodes max_length=2048

    texts = ref_eval.get_alpaca_eval_data(n_samples=12)
    monkeypatch.setattr(ref_eval, "get_alpaca_eval_data", lambda n_samples=500: texts)
    ref_ppl = ref_eval.evaluate_perplexity_alpaca(m, tok, device="cpu")

    from modegpt_tpu.evals.perplexity import compute_perplexity_alpaca
    from modegpt_tpu.models import params_from_hf_model

    spec, params = params_from_hf_model(m)
    ppl = compute_perplexity_alpaca(
        spec, params, tok, texts=texts, max_length=2048, batch_size=4, progress=False
    )
    np.testing.assert_allclose(ppl, ref_ppl, rtol=2e-4)
