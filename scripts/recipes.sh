#!/usr/bin/env bash
# End-to-end compression recipes — the framework-native equivalent of the
# reference's tests.sh (same models/ratios/tuned hyperparameters,
# reference: tests.sh:87-141, 1-84, 150-175), followed by the native
# zero-shot task harness instead of external lm_eval.
#
# Requires local checkpoints (zero-egress environments must pre-download).
#
# `bash scripts/recipes.sh smoke` verifies every recipe offline: it
# builds tiny random checkpoints (llama/qwen3/opt/moe geometry + a
# trained-from-scratch tokenizer) and drives the SAME recipe functions
# with SMOKE_FLAGS appended — argparse last-wins, so the production
# flags above each call remain authoritative while smoke swaps in the
# synthetic dataset and toy sizes.
set -euo pipefail

MODEL_DIR=${MODEL_DIR:-"./checkpoints"}
SMOKE_FLAGS=${SMOKE_FLAGS:-}

qwen3_8b_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Qwen3-8B" \
    --compression_ratio 0.3 --dataset alpaca \
    --calib_size 128 --calibs_batch_size 8 \
    --ridge_vo 1e-5 --ridge_qk 1e-2 --nystrom_ridge 1e-4 \
    --sparsity_smoothing 0.04948 --max_sparsity 0.95 \
    --order mlp,qk,vo \
    --output_dir out/qwen3-8b-30 --temp_storage_dir out/qwen3-8b-30/layers \
    --note qwen3-8b-0.3 ${SMOKE_FLAGS}
}

qwen3_8b_40() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Qwen3-8B" \
    --compression_ratio 0.4 --dataset alpaca \
    --calib_size 128 --calibs_batch_size 8 \
    --ridge_vo 1e-5 --ridge_qk 1e-2 --nystrom_ridge 1e-4 \
    --sparsity_smoothing 0.04948 --max_sparsity 0.95 \
    --order mlp,qk,vo \
    --output_dir out/qwen3-8b-40 --temp_storage_dir out/qwen3-8b-40/layers \
    --note qwen3-8b-0.4 ${SMOKE_FLAGS}
}

llama2_7b_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Llama-2-7b-hf" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 128 --calibs_batch_size 8 \
    --order mlp,qk,vo \
    --output_dir out/llama2-7b-30 --temp_storage_dir out/llama2-7b-30/layers \
    --note llama2-7b-0.3 ${SMOKE_FLAGS}
}

opt_125m_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/opt-125m" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 32 --calibs_batch_size 4 \
    --order mlp,qk,vo \
    --output_dir out/opt-125m-30 --temp_storage_dir out/opt-125m-30/layers \
    --note opt-125m-0.3 ${SMOKE_FLAGS}
}

zero_shot() {  # $1 = artifact dir, $2 = tokenizer source
  # ZERO_SHOT_TASKS overrides the task list (smoke uses the offline
  # "synthetic" task; the datasets-backed five need the HF cache).
  ZERO_SHOT_TASKS="${ZERO_SHOT_TASKS:-arc_challenge,arc_easy,piqa,winogrande,hellaswag}" \
  python - "$1" "$2" <<'PY'
import os, sys
from transformers import AutoTokenizer
from modegpt_tpu.compress.artifact import load_compressed_model
from modegpt_tpu.evals.tasks import evaluate_multiple_choice, load_task

artifact, tok_src = sys.argv[1], sys.argv[2]
spec, params, _ = load_compressed_model(artifact)
tok = AutoTokenizer.from_pretrained(tok_src)
for task in os.environ["ZERO_SHOT_TASKS"].split(","):
    res = evaluate_multiple_choice(spec, params, load_task(task), tok)
    print(task, res)
PY
}

# ---- new-capability recipes (round 1) ----

serve_compressed() {  # $1 = artifact dir, $2 = prompts file
  python -m modegpt_tpu.serve --model "$1" --prompts "$2" \
    --slots 8 --max_len 1024 --prefill_bucket 128 --max_new_tokens 64
}

serve_compressed_int8() {  # int8-resident weights: ~1.5x decode on v5e
  python -m modegpt_tpu.serve --model "$1" --prompts "$2" \
    --slots 8 --max_len 1024 --prefill_bucket 128 --quantize_int8
}

serve_compress_in_memory() {  # $1 = DENSE checkpoint, $2 = prompts file
  # compress-then-serve: compress at load, no artifact round-trip
  # (factors stay on device; compress/pipeline.compress_in_memory)
  python -m modegpt_tpu.serve --model "$1" --prompts "$2" \
    --slots 8 --max_len 1024 --prefill_bucket 128 --max_new_tokens 64 \
    --compress_ratio 0.3 --compress_dataset synthetic \
    --compress_calib_size "${SMOKE_CALIB:-32}" \
    --compress_seq_len "${SMOKE_SEQ:-2048}"
}

speculative_decode() {  # $1 = dense checkpoint, $2 = compressed artifact
  python -m modegpt_tpu.evals.cli --model "$1" \
    --speculative_draft "$2" --n_draft 4 \
    --generate "The capital of France is" --max_new_tokens 64
}

compress_mixtral() {  # MoE: per-expert Type-I solves
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/mixtral" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 128 --calibs_batch_size 8 \
    --output_dir out/mixtral-30 --temp_storage_dir out/mixtral-30/layers \
    --note mixtral-0.3 ${SMOKE_FLAGS}
}

compress_pipeline_parallel() {  # model beyond one chip's HBM: stage the stack
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/llama-2-70b" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 128 --calibs_batch_size 8 \
    --mesh_shape stage:8 --solver_precision f32_device \
    --output_dir out/llama70b-30 --temp_storage_dir out/llama70b-30/layers \
    --note llama70b-0.3-pp ${SMOKE_FLAGS}
}

# ---- offline smoke verification ----
# Builds tiny random checkpoints with the real architectures' geometry
# and drives every recipe above end-to-end on the current backend.
# Verified in CI/zero-egress environments: `bash scripts/recipes.sh smoke`.

smoke() {
  local root="${SMOKE_DIR:-/tmp/modegpt_recipes_smoke}"
  rm -rf "$root"
  mkdir -p "$root/checkpoints" "$root/out"
  python - "$root/checkpoints" <<'PY'
import sys
import torch
import transformers
from tokenizers import Tokenizer, models, pre_tokenizers, trainers
from transformers import PreTrainedTokenizerFast

root = sys.argv[1]

# a from-scratch tokenizer (no network): whitespace BPE on a toy corpus
tok = Tokenizer(models.BPE(unk_token="<unk>"))
tok.pre_tokenizer = pre_tokenizers.Whitespace()
corpus = ["one two one two one b a b a the dog ran x y z capital of France is Paris"] * 8
tok.train_from_iterator(corpus, trainers.BpeTrainer(vocab_size=128, special_tokens=["<unk>", "<s>", "</s>"]))
fast = PreTrainedTokenizerFast(
    tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>", pad_token="</s>"
)
V = fast.vocab_size

def save(model, name):
    d = f"{root}/{name}"
    model.save_pretrained(d)
    fast.save_pretrained(d)
    print("saved", d)

torch.manual_seed(0)
save(transformers.Qwen3ForCausalLM(transformers.Qwen3Config(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, vocab_size=V, max_position_embeddings=256)), "Qwen3-8B")
save(transformers.LlamaForCausalLM(transformers.LlamaConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, vocab_size=V, max_position_embeddings=256)), "Llama-2-7b-hf")
save(transformers.OPTForCausalLM(transformers.OPTConfig(
    hidden_size=64, ffn_dim=128, num_hidden_layers=2, num_attention_heads=4,
    vocab_size=V, max_position_embeddings=256, word_embed_proj_dim=64)), "opt-125m")
save(transformers.MixtralForCausalLM(transformers.MixtralConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, vocab_size=V, num_local_experts=4, num_experts_per_tok=2,
    max_position_embeddings=256)), "mixtral")
save(transformers.LlamaForCausalLM(transformers.LlamaConfig(
    hidden_size=64, intermediate_size=128, num_hidden_layers=8, num_attention_heads=4,
    num_key_value_heads=2, vocab_size=V, max_position_embeddings=256)), "llama-2-70b")
print("PRIMARY_VOCAB", V)
PY
  printf 'one two one two\nthe dog ran\n' > "$root/prompts.txt"

  export MODEL_DIR="$root/checkpoints"
  export SMOKE_FLAGS="--dataset synthetic --calib_size 4 --calibs_batch_size 2 --seq_len 32"
  cd "$root"

  qwen3_8b_30
  qwen3_8b_40
  llama2_7b_30
  opt_125m_30
  compress_mixtral
  # 8-way pipeline staging on virtual CPU devices
  XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" compress_pipeline_parallel

  ZERO_SHOT_TASKS=synthetic zero_shot out/qwen3-8b-30/model "$MODEL_DIR/Qwen3-8B"
  serve_compressed out/qwen3-8b-30/model "$root/prompts.txt"
  serve_compressed_int8 out/qwen3-8b-30/model "$root/prompts.txt"
  SMOKE_CALIB=4 SMOKE_SEQ=32 serve_compress_in_memory \
    "$MODEL_DIR/Qwen3-8B" "$root/prompts.txt"
  speculative_decode "$MODEL_DIR/Llama-2-7b-hf" out/llama2-7b-30/model
  echo "SMOKE OK"
}

"$@"
