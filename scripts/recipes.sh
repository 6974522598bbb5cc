#!/usr/bin/env bash
# End-to-end compression recipes — the framework-native equivalent of the
# reference's tests.sh (same models/ratios/tuned hyperparameters,
# reference: tests.sh:87-141, 1-84, 150-175), followed by the native
# zero-shot task harness instead of external lm_eval.
#
# Requires local checkpoints (zero-egress environments must pre-download).
set -euo pipefail

MODEL_DIR=${MODEL_DIR:-"./checkpoints"}

qwen3_8b_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Qwen3-8B" \
    --compression_ratio 0.3 --dataset alpaca \
    --calib_size 128 --calibs_batch_size 8 \
    --ridge_vo 1e-5 --ridge_qk 1e-2 --nystrom_ridge 1e-4 \
    --sparsity_smoothing 0.04948 --max_sparsity 0.95 \
    --order mlp,qk,vo \
    --output_dir out/qwen3-8b-30 --note qwen3-8b-0.3
}

qwen3_8b_40() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Qwen3-8B" \
    --compression_ratio 0.4 --dataset alpaca \
    --calib_size 128 --calibs_batch_size 8 \
    --ridge_vo 1e-5 --ridge_qk 1e-2 --nystrom_ridge 1e-4 \
    --sparsity_smoothing 0.04948 --max_sparsity 0.95 \
    --order mlp,qk,vo \
    --output_dir out/qwen3-8b-40 --note qwen3-8b-0.4
}

llama2_7b_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/Llama-2-7b-hf" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 128 --calibs_batch_size 8 \
    --order mlp,qk,vo \
    --output_dir out/llama2-7b-30 --note llama2-7b-0.3
}

opt_125m_30() {
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/opt-125m" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 32 --calibs_batch_size 4 \
    --order mlp,qk,vo \
    --output_dir out/opt-125m-30 --note opt-125m-0.3
}

zero_shot() {  # $1 = artifact dir, $2 = tokenizer source
  python - "$1" "$2" <<'PY'
import sys
from transformers import AutoTokenizer
from modegpt_tpu.compress.artifact import load_compressed_model
from modegpt_tpu.evals.tasks import evaluate_multiple_choice, load_task

artifact, tok_src = sys.argv[1], sys.argv[2]
spec, params, _ = load_compressed_model(artifact)
tok = AutoTokenizer.from_pretrained(tok_src)
for task in ("arc_challenge", "arc_easy", "piqa", "winogrande", "hellaswag"):
    res = evaluate_multiple_choice(spec, params, load_task(task), tok)
    print(task, res)
PY
}

"$@"

# ---- new-capability recipes (round 1) ----

serve_compressed() {  # $1 = artifact dir, $2 = prompts file
  python -m modegpt_tpu.serve --model "$1" --prompts "$2" \
    --slots 8 --max_len 1024 --prefill_bucket 128 --max_new_tokens 64
}

serve_compressed_int8() {  # int8-resident weights: ~1.5x decode on v5e
  python -m modegpt_tpu.serve --model "$1" --prompts "$2" \
    --slots 8 --max_len 1024 --prefill_bucket 128 --quantize_int8
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
    --output_dir out/mixtral-30 --note mixtral-0.3
}

compress_pipeline_parallel() {  # model beyond one chip's HBM: stage the stack
  python -m modegpt_tpu.cli \
    --model "$MODEL_DIR/llama-2-70b" \
    --compression_ratio 0.3 --dataset wikitext \
    --calib_size 128 --calibs_batch_size 8 \
    --mesh_shape stage:8 --solver_precision f32_device \
    --output_dir out/llama70b-30 --note llama70b-0.3-pp
}
