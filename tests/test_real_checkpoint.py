"""Real-checkpoint harness: ours vs the reference on the SAME checkpoint.

The BASELINE.json north star — per-layer factors matching the reference
to 1e-4 (bit-level post-bf16) and wikitext-2 PPL within 0.1 — needs a
real checkpoint plus real data, which this environment lacks. This
harness closes the gap in a way that is green TODAY and meaningful the
day a checkpoint appears:

* When ``$MODEL_DIR/opt-125m`` (or ``$MODEL_DIR/$REAL_LLAMA``) exists,
  it runs against that checkpoint with wikitext batches when the
  datasets cache can serve them (seeded synthetic ids otherwise — the
  parity assertions compare ours-vs-reference on IDENTICAL data either
  way).
* Otherwise it runs the exact same harness against a tiny
  randomly-initialised checkpoint written to tmp, so the harness logic
  itself is continuously tested (all dims come from the config).

What is compared, per arch:

1. rank lists: our pipeline's per-layer ranks vs ranks derived from the
   reference's allocate_global_sparsity on the reference's own BI
   scores (calibration driver-level parity);
2. factor files: the reference's compress_nystrom / compress_qk /
   compress_vo outputs (saved bf16, its only persisted precision) vs
   our factor store, bit-level at bf16 (pre-cast 1e-9 parity is covered
   by tests/test_reference_golden.py);
3. perplexity: our compressed artifact evaluated by our jitted harness
   vs THE SAME artifact executed by the reference's own Rebuild class
   in torch (cross-executor), |delta| < 0.1.

Reference bit-rot patched to run OPT (SURVEY.md §2 "known bit-rot", the
intent per its own Llama path): ``get_n_inner`` argument-less, and
``get_mlp_components`` exposing a gate handle (OPT has no gate; the
solver computes-and-ignores it). OPT's reference surgery drops ALL
biases (model_adapter.py:199-207) while ours keeps them exactly, so the
reference-converted OPT model is not PPL-comparable by design; the
cross-executor check uses the Rebuild consumer instead.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import torch.nn.functional as F

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference tree not mounted"
)

MODEL_DIR = os.environ.get("MODEL_DIR", "")
CALIB_SIZE = int(os.environ.get("REAL_CALIB_SIZE", "8"))
EVAL_SAMPLES = int(os.environ.get("REAL_EVAL_SAMPLES", "16"))
RATIO = float(os.environ.get("REAL_RATIO", "0.3"))


class ByteTokenizer:
    eos_token = "\x00"
    pad_token = "\x00"

    def __init__(self, vocab):
        self.vocab = vocab

    def __call__(self, text, return_tensors=None, add_special_tokens=True, **kw):
        ids = [b % (self.vocab - 1) + 1 for b in text.encode("utf-8")]
        if return_tensors == "pt":
            return {"input_ids": torch.tensor([ids], dtype=torch.long)}
        return {"input_ids": ids}


def _resolve_checkpoint(arch, tmp_path):
    """(dir, is_real): $MODEL_DIR checkpoint or a tiny tmp stand-in."""
    if arch == "opt":
        real = os.path.join(MODEL_DIR, "opt-125m") if MODEL_DIR else ""
    else:
        name = os.environ.get("REAL_LLAMA", "")
        real = os.path.join(MODEL_DIR, name) if (MODEL_DIR and name) else ""
    if real and os.path.isdir(real):
        return real, True
    out = str(tmp_path / f"tiny_{arch}_ckpt")
    torch.manual_seed(0)
    if arch == "opt":
        cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=176, num_hidden_layers=3,
            num_attention_heads=4, max_position_embeddings=128,
            word_embed_proj_dim=64, do_layer_norm_before=True, enable_bias=True,
            tie_word_embeddings=False,
        )
        transformers.OPTForCausalLM(cfg).save_pretrained(out)
    else:
        cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=176,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=128, tie_word_embeddings=False,
        )
        transformers.LlamaForCausalLM(cfg).save_pretrained(out)
    return out, False


def _load_checkpoint(ckpt_dir):
    model = transformers.AutoModelForCausalLM.from_pretrained(
        ckpt_dir, torch_dtype=torch.float32
    ).eval()
    try:
        tok = transformers.AutoTokenizer.from_pretrained(ckpt_dir)
    except Exception:
        tok = ByteTokenizer(model.config.vocab_size)
    return model, tok


def _token_data(tok, vocab, seq_len, try_wikitext):
    """(calib_batches, eval_tokens): wikitext when the datasets cache can
    serve it, seeded synthetic ids otherwise. Identical arrays feed both
    pipelines either way."""
    from modegpt_tpu.calib.data import load_calibration_batches, load_eval_tokens

    try:
        if not try_wikitext:
            raise RuntimeError("tiny stand-in run: skip the datasets cache")
        batches = load_calibration_batches(
            tok, "wikitext", calib_size=CALIB_SIZE, batch_size=2, seq_len=seq_len
        )
        eval_tokens = load_eval_tokens(tok, "wikitext", seq_len, max_samples=EVAL_SAMPLES)
        return batches, eval_tokens
    except Exception:
        rng = np.random.default_rng(1234)
        chunks = rng.integers(1, vocab, size=(CALIB_SIZE, seq_len)).astype(np.int32)
        batches = [chunks[i : i + 2] for i in range(0, CALIB_SIZE, 2)]
        eval_tokens = rng.integers(1, vocab, size=(EVAL_SAMPLES, seq_len)).astype(np.int32)
        return batches, eval_tokens


@pytest.fixture()
def ref_side(monkeypatch):
    """Reference modules with cuda touchpoints routed to cpu."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    mu = importlib.import_module("src.model_utils")
    for mod_name in ("src.model_utils", "src.compression_utils",
                     "src.compression.compress_mlp", "src.compression.compress_qk",
                     "src.compression.compress_vo"):
        m = importlib.import_module(mod_name)
        for attr in ("d1", "d2", "calib_device"):
            if hasattr(m, attr):
                monkeypatch.setattr(m, attr, "cpu")

    orig_to = torch.Tensor.to

    def cpu_to(self, *args, **kwargs):
        args = tuple("cpu" if (isinstance(a, str) and "cuda" in a) else a for a in args)
        if isinstance(kwargs.get("device"), str) and "cuda" in kwargs["device"]:
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", cpu_to)
    monkeypatch.setattr(torch.cuda, "synchronize", lambda *a, **k: None, raising=False)
    monkeypatch.setattr(torch.cuda, "empty_cache", lambda *a, **k: None, raising=False)
    orig_load = torch.load
    monkeypatch.setattr(
        torch, "load",
        lambda *a, **k: orig_load(*a, **{**k, "map_location": "cpu"}),
    )
    orig_tensor = torch.tensor

    def cpu_tensor(*a, **k):  # compress_qk.py:291 builds on device="cuda"
        if isinstance(k.get("device"), str) and "cuda" in k["device"]:
            k["device"] = "cpu"
        return orig_tensor(*a, **k)

    monkeypatch.setattr(torch, "tensor", cpu_tensor)
    return {
        "calibration": importlib.import_module("src.calibration"),
        "utils": importlib.import_module("src.compression_utils"),
        "mlp": importlib.import_module("src.compression.compress_mlp"),
        "qk": importlib.import_module("src.compression.compress_qk"),
        "vo": importlib.import_module("src.compression.compress_vo"),
        "adapters": importlib.import_module("src.adapters.model_adapter"),
    }


def _patch_opt_bitrot(monkeypatch, ref_side):
    """SURVEY.md §2 'known bit-rot': make the reference's OPT path run as
    its Llama path shows it was intended to."""
    import importlib

    oa = importlib.import_module("src.adapters.OPTAdapter")
    ma = ref_side["adapters"]
    # OPTAdapter never implements the base's calibrate_model /
    # compute_layer_energy abstracts (LlamaAdapter does) and so cannot
    # even be instantiated — allow it, nothing calls those here.
    monkeypatch.setattr(oa.OPTAdapter, "__abstractmethods__", frozenset())
    monkeypatch.setattr(
        oa.OPTAdapter, "get_n_inner", lambda self, block=None: self.model.config.ffn_dim
    )
    # base head_dim property reads config.head_dim, which OPTConfig lacks
    # (the commented-out d_model//n_heads line is the working intent)
    monkeypatch.setattr(
        oa.OPTAdapter, "head_dim", property(lambda self: self.d_model // self.n_heads)
    )

    def mlp_with_gate(self, layer_idx):
        block = self.get_transformer_blocks()[layer_idx]
        # OPT has no gate; hand the solver fc1 so it computes-and-ignores
        return ma.MLPComponents(block=block, up_proj=block.fc1,
                                down_proj=block.fc2, gate_proj=block.fc1)

    monkeypatch.setattr(oa.OPTAdapter, "get_mlp_components", mlp_with_gate)
    return oa


def _ref_compress(ref_side, model, tok, batches, seq_len, tmp_path, arch, monkeypatch,
                  config_knobs, cov_override=None):
    """Run the reference's calibration + allocation + three solvers on
    the given batches; returns (keep_ratios, factor_dir, bi_scores).

    cov_override feeds the solvers OUR calibration covariances so the
    factor comparison is same-inputs -> same-factors (jax-vs-torch f32
    forwards differ at ~1e-5, enough to flip topk selections between
    near-tied scores on tiny random models; calibration parity itself is
    asserted at 2e-5 by test_reference_golden.py). The reference's own
    load_calibs still runs for the BI/keep-ratio parity check."""
    if arch == "opt":
        oa = _patch_opt_bitrot(monkeypatch, ref_side)
        adapter = oa.OPTAdapter(model, tokenizer=tok)
    else:
        import importlib

        la = importlib.import_module("src.adapters.LlamaAdapter")
        adapter = la.LlamaAdapter(model, tokenizer=tok)

    import importlib

    rcfg_mod = importlib.import_module("src.adapters.CompressionConfig")
    adapter.config = rcfg_mod.CompressionConfig(**config_knobs)
    adapter.calibs = [torch.from_numpy(np.asarray(b, dtype=np.int64)) for b in batches]

    layers = list(range(model.config.num_hidden_layers))
    cov_mlp, cov_q, cov_k, cov_x, bi = ref_side["calibration"].load_calibs(
        adapter, n_samples=CALIB_SIZE, batch_size=2, target_layers=layers
    )
    keep = ref_side["utils"].allocate_global_sparsity(
        bi, RATIO, smoothing=config_knobs["sparsity_smoothing"],
        max_sparsity=config_knobs["max_sparsity"],
    )
    if cov_override is not None:
        cov_mlp, cov_q, cov_k, cov_x = cov_override
    else:
        # Normalisation: the reference divides covs by n_texts*2048
        # regardless of the true seq_len (calibration.py:141); rescale to
        # the true token count for comparability (as golden tests do).
        scale = 2048.0 / seq_len

        def _rescale(lst):
            return [None if c is None else c * scale for c in lst]

        cov_mlp, cov_q, cov_k, cov_x = (
            _rescale(cov_mlp), _rescale(cov_q), _rescale(cov_k), _rescale(cov_x)
        )

    ref_side["mlp"].compress_nystrom(adapter, cov_mlp, keep, layers)
    ref_side["qk"].compress_qk(adapter, (cov_q, cov_k), keep, target_layers=layers)
    ref_side["vo"].compress_vo(adapter, cov_x, keep_ratios=keep, target_layers=layers)
    return keep, adapter.config.temp_storage_dir, np.asarray(bi)


def _ours_compress(spec, params, tok, batches, eval_tokens, seq_len, tmp_path, knobs):
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig

    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=CALIB_SIZE, calibs_batch_size=2,
        seq_len=seq_len, compression_ratio=RATIO,
        sparsity_smoothing=knobs["sparsity_smoothing"],
        max_sparsity=knobs["max_sparsity"],
        nystrom_ridge=knobs["nystrom_ridge"], ridge_qk=knobs["ridge_qk"],
        ridge_vo=knobs["ridge_vo"],
        output_dir=str(tmp_path / "ours_out"),
        temp_storage_dir=str(tmp_path / "ours_layers"),
        metrics_dir=str(tmp_path / "ours_metrics"),
        skip_baseline_eval=True,
    )
    return run_compression(
        config, spec=spec, params=params, tokenizer=None,
        calib_batches=[np.asarray(b, dtype=np.int32) for b in batches],
        eval_tokens=eval_tokens,
    )


def _assert_bf16_parity(ours, ref_t, what):
    """Ours (f32/f64) vs the reference's persisted bf16: cast ours to
    bf16 and require bit-level agreement up to ~1-ulp rounding ties.
    Pre-cast 1e-9 parity is covered by test_reference_golden.py."""
    ours_bf16 = torch.from_numpy(np.ascontiguousarray(ours, dtype=np.float32)).to(
        torch.bfloat16
    )
    ref_t = ref_t.to(torch.bfloat16)
    assert ours_bf16.shape == ref_t.shape, f"{what}: {ours_bf16.shape} vs {ref_t.shape}"
    a, b = ours_bf16.float().numpy(), ref_t.float().numpy()
    exact = np.mean(a == b)
    np.testing.assert_allclose(a, b, rtol=1.6e-2, atol=1e-6, err_msg=what)
    assert exact > 0.97, f"{what}: only {exact:.1%} bit-identical post-bf16"


# ridge_qk pinned to sqrt_M's default 1e-4: the reference's MHA QK kernel
# (compress_head_llama:407-408) never consumes config.ridge_qk — both
# sqrts run at the default — while its GQA kernel ridges C_k with it.
# Ours applies ridge_qk uniformly (the GQA semantics); at 1e-4 the two
# conventions coincide on every path.
KNOBS = dict(
    nystrom_ridge=1e-4, ridge_qk=1e-4, ridge_vo=1e-5,
    sparsity_smoothing=0.2, max_sparsity=0.8,
)


@pytest.mark.parametrize("arch", ["opt", "llama"])
def test_real_checkpoint_vs_reference(arch, tmp_path, monkeypatch, ref_side):
    ckpt, is_real = _resolve_checkpoint(arch, tmp_path)
    model, tok = _load_checkpoint(ckpt)
    seq_len = min(2048 if is_real else 64, model.config.max_position_embeddings)
    batches, eval_tokens = _token_data(
        tok, model.config.vocab_size, seq_len, try_wikitext=is_real
    )

    from modegpt_tpu.models import params_from_hf_model

    spec, params = params_from_hf_model(model)

    r = _ours_compress(spec, params, tok, batches, eval_tokens, seq_len, tmp_path, KNOBS)
    cspec = r["compressed_spec"]

    # Feed the reference solvers OUR covariances (see _ref_compress doc;
    # also the reference's OPT cov_x is unfillable — on_batch_end_step
    # has no call site).
    from modegpt_tpu.calib.engine import calibrate

    calib = calibrate(spec, params, [np.asarray(b, np.int32) for b in batches],
                      list(range(spec.n_layers)))

    def _as_torch(d):
        return [
            torch.from_numpy(np.asarray(d[l])).to(torch.float64)
            for l in range(spec.n_layers)
        ]

    cov_override = (
        _as_torch(calib.cov_mlp), _as_torch(calib.cov_q),
        _as_torch(calib.cov_k), _as_torch(calib.cov_x),
    )

    knobs = dict(KNOBS)
    knobs_ref = dict(
        temp_storage_dir=str(tmp_path / "ref_layers"),
        nystrom_ridge=KNOBS["nystrom_ridge"], ridge_qk=KNOBS["ridge_qk"],
        ridge_vo=KNOBS["ridge_vo"], sparsity_smoothing=KNOBS["sparsity_smoothing"],
        max_sparsity=KNOBS["max_sparsity"], compression_ratio=RATIO,
    )
    keep, ref_dir, _bi = _ref_compress(
        ref_side, model, tok, batches, seq_len, tmp_path, arch, monkeypatch,
        knobs_ref, cov_override,
    )

    # 1+2) rank parity and factor parity. BI scores agree only to ~1e-5
    # (jax-vs-torch f32 forward), so a keep ratio landing within that of
    # an integer boundary may floor to rank±1 on one side; such layers
    # have incomparable factor shapes. Assert every rank is within
    # floor-boundary distance of the reference's keep, compare factors on
    # the (majority of) layers whose ranks agree exactly.
    from modegpt_tpu.compress.artifact import load_layer_factors
    from modegpt_tpu.compress.surgery import compress_ranks_for_layer

    matched = 0
    for l in range(spec.n_layers):
        want_mlp = max(1, int(spec.d_int * keep[l]))
        want_qk = compress_ranks_for_layer(spec, keep[l], "qk") * spec.n_heads
        mlp_off = abs(spec.d_int * keep[l] - cspec.gate_ranks[l])
        qk_off = abs(spec.head_dim * keep[l] - cspec.q_ranks[l] / spec.n_heads)
        assert mlp_off <= 1.5 + spec.d_int * 1e-4, f"mlp rank diverged at layer {l}"
        assert qk_off <= 2.5, f"qk rank diverged at layer {l}"  # +- evenness
        if cspec.gate_ranks[l] != want_mlp or cspec.q_ranks[l] != want_qk:
            continue  # floor-boundary flip; shapes incomparable
        matched += 1

        ref_mlp = torch.load(os.path.join(ref_dir, f"layer_{l}_mlp"))
        ours_mlp = load_layer_factors(str(tmp_path / "ours_layers"), l, "mlp")
        # ref persists HF layouts: up [rank, d], down [d, rank]
        # (compress_mlp.py:96 saves the .T of its working transposes)
        _assert_bf16_parity(ours_mlp["up"], ref_mlp["up"], f"layer {l} up")
        _assert_bf16_parity(ours_mlp["down"], ref_mlp["down"], f"layer {l} down")

        ref_qk = torch.load(os.path.join(ref_dir, f"layer_{l}_qk"))
        ours_qk = load_layer_factors(str(tmp_path / "ours_layers"), l, "qk")
        _assert_bf16_parity(ours_qk["q"], ref_qk["q_proj"], f"layer {l} q")
        _assert_bf16_parity(ours_qk["k"], ref_qk["k_proj"], f"layer {l} k")

        ref_vo = torch.load(os.path.join(ref_dir, f"layer_{l}_vo"))
        ours_vo = load_layer_factors(str(tmp_path / "ours_layers"), l, "vo")
        # VO factors carry per-singular-vector sign ambiguity (torch vs
        # jax SVD conventions); the per-head map x -> (x@V^T)@O^T is the
        # sign-invariant comparison (as in test_reference_golden.py).
        rh = cspec.v_ranks[l] // spec.n_kv_heads
        rv = ref_vo["v_proj"].to(torch.bfloat16).float().numpy()
        ro = ref_vo["o_proj"].to(torch.bfloat16).float().numpy()
        ov = torch.from_numpy(np.asarray(ours_vo["v"], np.float32)).to(
            torch.bfloat16).float().numpy()
        oo = torch.from_numpy(np.asarray(ours_vo["o"], np.float32)).to(
            torch.bfloat16).float().numpy()
        for h in range(spec.n_kv_heads):
            ref_map = rv[h * rh : (h + 1) * rh].T @ ro[:, h * rh : (h + 1) * rh].T
            got_map = ov[h * rh : (h + 1) * rh].T @ oo[:, h * rh : (h + 1) * rh].T
            scale = np.abs(ref_map).max() + 1e-12
            np.testing.assert_allclose(
                got_map, ref_map, rtol=0.05, atol=5e-3 * scale,
                err_msg=f"layer {l} head {h} V@O map",
            )
    assert matched >= max(1, spec.n_layers // 2), (
        f"only {matched}/{spec.n_layers} layers rank-matched — more than "
        "floor-boundary noise"
    )

    # 3) cross-executor PPL: the same compressed artifact through the
    # reference's Rebuild consumer (torch) vs our jitted harness.
    from modegpt_tpu.models.hf_export import export_to_hf

    out = export_to_hf(cspec, r["compressed_params"], str(tmp_path / "export"))
    import importlib

    if arch == "opt":
        rb = importlib.import_module("src.patchers.OPTRebuild").OPTForCausalLM
    else:
        rb = importlib.import_module("src.patchers.LlamaRebuild").LlamaForCausalLM
    from safetensors.torch import load_file

    cfg = transformers.AutoConfig.from_pretrained(str(tmp_path / "export"))
    cfg._attn_implementation = "eager"
    rmodel = rb(cfg)
    missing, unexpected = rmodel.load_state_dict(
        load_file(os.path.join(str(tmp_path / "export"), "model.safetensors")),
        strict=False,
    )
    assert not missing and not unexpected
    rmodel = rmodel.eval()

    ref_ppl = _torch_ppl(rmodel, eval_tokens)
    assert abs(r["compressed_ppl"] - ref_ppl) < 0.1, (
        f"cross-executor PPL: ours {r['compressed_ppl']:.4f} vs "
        f"reference-Rebuild {ref_ppl:.4f}"
    )


def _torch_ppl(model, tokens, bs=4):
    """The reference's eval formula (eval.py:192-220) over given windows."""
    n, s = tokens.shape
    nll = 0.0
    with torch.no_grad():
        for i in range(0, n, bs):
            batch = torch.from_numpy(np.asarray(tokens[i : i + bs], dtype=np.int64))
            logits = model(batch).logits
            shift = logits[:, :-1].float()
            loss = F.cross_entropy(
                shift.reshape(-1, shift.size(-1)), batch[:, 1:].reshape(-1)
            )
            nll += loss.item() * (s - 1) * batch.shape[0]
    return math.exp(nll / (n * (s - 1)))
