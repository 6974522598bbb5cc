"""CLI surfaces: compression CLI and the standalone eval CLI."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt") / "tiny-llama"
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(d)
    return str(d)


def test_compression_cli_end_to_end(tmp_path, tiny_ckpt):
    from modegpt_tpu.cli import main

    results = main([
        "--model", tiny_ckpt, "--compression_ratio", "0.3",
        "--calib_size", "4", "--calibs_batch_size", "2", "--seq_len", "48",
        "--eval_batch_size", "4", "--eval_max_samples", "4",
        "--dataset", "synthetic", "--sparsity_smoothing", "0.5",
        "--solver_precision", "f32_device",
        "--output_dir", str(tmp_path / "o"),
        "--temp_storage_dir", str(tmp_path / "l"),
        "--metrics_dir", str(tmp_path / "m"),
    ])
    assert np.isfinite(results["compressed_ppl"])
    # metrics registry written with the reference's shape
    reg = json.load(open(tmp_path / "m" / "metrics.json"))
    run = list(reg.values())[-1]
    assert "baseline-ppl" in run and "ppl-synthetic" in run
    assert "achieved_compression" in run and run["achieved_compression"] > 0

    # eval CLI over the produced artifact
    from modegpt_tpu.evals.cli import main as eval_main

    r = eval_main([
        "--model", str(tmp_path / "o" / "model"), "--dataset", "synthetic",
        "--seq_len", "48", "--eval_batch_size", "4", "--eval_max_samples", "4",
    ])
    assert abs(r["ppl-synthetic"] - results["compressed_ppl"]) < 1e-6 * results["compressed_ppl"]

    # inspect CLI
    from modegpt_tpu.inspect_artifact import main as inspect_main

    assert inspect_main([str(tmp_path / "o" / "model")]) == 0


def test_config_validation():
    from modegpt_tpu.config import CompressionConfig

    with pytest.raises(ValueError, match="solver_precision"):
        CompressionConfig(solver_precision="f16").validate()
    with pytest.raises(ValueError, match="compression_ratio"):
        CompressionConfig(compression_ratio=1.5).validate()
    with pytest.raises(ValueError, match="order token"):
        CompressionConfig(order="mlp,bogus").validate()
    with pytest.raises(ValueError, match="qk_method"):
        CompressionConfig(qk_method="x").validate()
    CompressionConfig().validate()  # defaults are valid


def test_serve_cli(tmp_path, tiny_ckpt):
    """Serve CLI over a compressed artifact with an offline tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from modegpt_tpu.cli import main

    main([
        "--model", tiny_ckpt, "--compression_ratio", "0.3",
        "--calib_size", "4", "--calibs_batch_size", "2", "--seq_len", "48",
        "--dataset", "synthetic", "--sparsity_smoothing", "0.3",
        "--skip_baseline_eval", "--skip_final_eval",
        "--output_dir", str(tmp_path / "o"),
        "--temp_storage_dir", str(tmp_path / "l"),
        "--metrics_dir", str(tmp_path / "m"),
    ])
    artifact = str(tmp_path / "o" / "model")

    vocab = {f"tok{i}": i for i in range(126)}
    vocab.update({"<eos>": 126, "<unk>": 127})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<eos>", unk_token="<unk>")
    fast.save_pretrained(artifact)

    from modegpt_tpu.serve import main as serve_main

    done = serve_main([
        "--model", artifact, "--prompt", "tok1 tok2 tok3", "--prompt", "tok4 tok5",
        "--max_new_tokens", "5", "--slots", "2", "--max_len", "32",
        "--prefill_bucket", "8",
    ])
    assert len(done) == 2
    for tokens in done.values():
        assert len(tokens) >= 3  # prompt + at least some generation

    # fused decode dispatches must produce the same greedy output
    fused = serve_main([
        "--model", artifact, "--prompt", "tok1 tok2 tok3", "--prompt", "tok4 tok5",
        "--max_new_tokens", "5", "--slots", "2", "--max_len", "32",
        "--prefill_bucket", "8", "--steps_per_dispatch", "3",
    ])
    assert fused == done
