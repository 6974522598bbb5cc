"""Serving CLI: continuous-batched generation over a compressed artifact.

    python -m modegpt_tpu.serve --model <artifact-or-hf-dir> \
        --prompts prompts.txt --max_new_tokens 64 --slots 8

Reads one prompt per line (or repeated --prompt flags), serves them all
through the slot-table continuous batcher (models/serving.py) on the
padded-uniform execution stack, and prints one JSON line per completion
plus a final throughput summary. New capability relative to the
reference, which has no serving stack (SURVEY.md §0: "no serving
stack").
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    from modegpt_tpu.utils.logging import setup_logging

    parser = argparse.ArgumentParser(prog="modegpt-tpu-serve")
    parser.add_argument("--model", required=True, help="artifact dir or HF checkpoint dir")
    parser.add_argument("--prompts", default="", help="file with one prompt per line")
    parser.add_argument("--prompt", action="append", default=[], help="inline prompt (repeatable)")
    parser.add_argument("--max_new_tokens", type=int, default=64)
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--max_len", type=int, default=1024)
    parser.add_argument("--prefill_bucket", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument(
        "--quantize_int8", action="store_true",
        help="serve with int8-resident weights (per-channel weight-only "
        "quantization; halves weight HBM traffic vs bf16)",
    )
    parser.add_argument(
        "--moe_exec", choices=("dense", "dispatch"), default="dense",
        help="MoE execution: 'dense' runs every expert on every token "
        "(exact); 'dispatch' gathers each expert's tokens into a fixed "
        "capacity buffer — per-expert FLOPs scale with capacity instead "
        "of batch (the serving-scale path for many-expert models)",
    )
    parser.add_argument(
        "--moe_capacity", type=float, default=2.0,
        help="dispatch capacity factor: each expert processes up to "
        "ceil(capacity * tokens * top_k / n_experts) tokens; >= "
        "n_experts/top_k guarantees no drops (exact)",
    )
    parser.add_argument(
        "--kv_dtype", choices=("model", "int8"), default="model",
        help="KV cache residency: 'int8' halves cache HBM capacity so 2x "
        "the slots/context fit (per-vector symmetric quantization, ~0.4%% "
        "rounding; outputs no longer bit-exact vs full precision; does "
        "not speed decode — the dequant temp costs what smaller reads save)",
    )
    parser.add_argument(
        "--spec_decode", choices=("off", "prompt_lookup", "draft"), default="off",
        help="speculative serving (greedy-exact): 'prompt_lookup' drafts "
        "from each slot's own history; 'draft' runs --draft_model in a "
        "second slot-table pool",
    )
    parser.add_argument("--n_draft", type=int, default=4, help="draft tokens per verify round")
    parser.add_argument("--lookup_ngram", type=int, default=3, help="prompt-lookup match length")
    parser.add_argument(
        "--draft_model", default="",
        help="artifact/checkpoint dir drafting for --model (typically its "
        "compressed child)",
    )
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="fuse N decode steps into one device dispatch (greedy logic "
        "identical to 1, though TPU bf16 program variants can flip "
        "near-tie argmaxes; amortises per-dispatch host latency at the "
        "cost of admitting new requests every N tokens)",
    )
    parser.add_argument(
        "--prefix_cache", action="store_true",
        help="reuse cache-resident KV for bucket-aligned shared prompt "
        "prefixes (e.g. a common system prompt) instead of re-prefilling",
    )
    parser.add_argument(
        "--prefill_exec", choices=("per_slot", "batched"), default="per_slot",
        help="'batched' prefills every admitting slot's next chunk in ONE "
        "ragged dispatch per round (admission bursts pay one dispatch "
        "latency instead of one per slot); greedy logic identical except "
        "under --moe_exec dispatch, where expert capacity pools across "
        "admitting slots",
    )
    parser.add_argument(
        "--a8_prefill", action="store_true",
        help="with --quantize_int8: run prefill W8A8 (dynamic per-token "
        "int8 activations, int8 x int8 MXU dots — 2x the bf16 peak on "
        "v5e). Decode stays weight-only int8.",
    )
    parser.add_argument(
        "--compress_ratio", type=float, default=None,
        help="compress the (dense) checkpoint IN MEMORY at this ratio "
        "before serving — no artifact round-trip, factors never leave "
        "HBM (compress/pipeline.compress_in_memory)",
    )
    parser.add_argument("--compress_dataset", default="wikitext",
                        help="calibration dataset for --compress_ratio; "
                        "'synthetic' works offline")
    parser.add_argument("--compress_calib_size", type=int, default=32)
    parser.add_argument("--compress_seq_len", type=int, default=2048)
    args = parser.parse_args(argv)

    logger = setup_logging()
    from modegpt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    texts = list(args.prompt)
    if args.prompts:
        with open(args.prompts) as f:
            texts.extend(line.rstrip("\n") for line in f if line.strip())
    if not texts:
        raise SystemExit("no prompts: pass --prompts FILE or --prompt TEXT")

    from modegpt_tpu.evals.cli import _load_any
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.models.serving import ContinuousBatcher

    spec, params, tokenizer = _load_any(args.model)
    if tokenizer is None:
        raise SystemExit("--model must resolve a tokenizer (artifact tokenizer_source)")
    if args.compress_ratio is not None:
        from modegpt_tpu.compress.pipeline import compress_in_memory
        from modegpt_tpu.config import CompressionConfig

        ccfg = CompressionConfig(
            compression_ratio=args.compress_ratio,
            dataset=args.compress_dataset,
            calib_size=args.compress_calib_size,
            calibs_batch_size=min(4, args.compress_calib_size),
            seq_len=args.compress_seq_len,
            solver_precision="f32_device",
        ).validate()
        logger.info(
            "compressing in memory at ratio %.2f (%s, %d sequences)",
            args.compress_ratio, args.compress_dataset, args.compress_calib_size,
        )
        spec, params = compress_in_memory(spec, params, ccfg, tokenizer=tokenizer)
    pm = pad_to_uniform(spec, params)
    if args.quantize_int8:
        from modegpt_tpu.models.quantize import quantize_padded

        pm = quantize_padded(pm)
        logger.info("int8-resident weights enabled")
    logger.info(
        "serving %s: %d layers, %d slots x %d tokens, bucket %d",
        args.model, spec.n_layers, args.slots, args.max_len, args.prefill_bucket,
    )

    draft_pm = None
    if args.spec_decode == "draft":
        if not args.draft_model:
            raise SystemExit("--spec_decode draft needs --draft_model")
        dspec, dparams, _ = _load_any(args.draft_model)
        draft_pm = pad_to_uniform(dspec, dparams)
        logger.info("draft model %s: %d layers", args.draft_model, dspec.n_layers)

    eos = getattr(tokenizer, "eos_token_id", None)
    batcher = ContinuousBatcher(
        pm, slots=args.slots, max_len=args.max_len, prefill_bucket=args.prefill_bucket,
        eos_token_id=eos, temperature=args.temperature, moe=args.moe_exec,
        moe_capacity=args.moe_capacity, spec_decode=args.spec_decode,
        n_draft=args.n_draft, lookup_ngram=args.lookup_ngram, draft_pm=draft_pm,
        kv_dtype=args.kv_dtype, steps_per_dispatch=args.steps_per_dispatch,
        prefill_exec=args.prefill_exec, prefix_cache=args.prefix_cache,
        a8_prefill=args.a8_prefill,
    )
    rid_to_idx = {}
    prompt_lens = {}
    for i, text in enumerate(texts):
        ids = tokenizer(text)["input_ids"]
        rid = batcher.submit(ids, max_new_tokens=args.max_new_tokens)
        rid_to_idx[rid] = i
        prompt_lens[rid] = len(ids)

    t0 = time.perf_counter()
    done = batcher.run()
    elapsed = time.perf_counter() - t0

    total_new = 0
    for rid, tokens in sorted(done.items(), key=lambda kv: rid_to_idx[kv[0]]):
        new = tokens[prompt_lens[rid] :]
        total_new += len(new)
        print(
            json.dumps(
                {
                    "prompt": texts[rid_to_idx[rid]],
                    "completion": tokenizer.decode(new),
                    "tokens": len(new),
                }
            ),
            flush=True,
        )
    logger.info(
        "served %d requests, %d new tokens in %.2fs (%.0f tok/s)",
        len(done), total_new, elapsed, total_new / max(elapsed, 1e-9),
    )
    if args.prefix_cache and batcher.prefix_hits:
        logger.info(
            "prefix cache: %d chunks adopted (%d prompt tokens not re-prefilled)",
            batcher.prefix_hits, batcher.prefix_tokens_reused,
        )
    if args.spec_decode != "off" and batcher.stats:
        drafted = sum(s["drafted"] for s in batcher.stats.values())
        accepted = sum(s["accepted"] for s in batcher.stats.values())
        rounds = sum(s["rounds"] for s in batcher.stats.values())
        logger.info(
            "speculative: %d rounds, %d/%d drafts accepted (%.0f%%)",
            rounds, accepted, drafted, 100.0 * accepted / max(drafted, 1),
        )
    print(
        json.dumps(
            {"requests": len(done), "new_tokens": total_new, "tok_per_s": total_new / max(elapsed, 1e-9)}
        ),
        file=sys.stderr,
    )
    return done


if __name__ == "__main__":
    main()


def _console() -> int:
    """Console-script entry: `main` returns a results dict for library
    callers; setuptools passes the return value to sys.exit, so wrap it."""
    main()
    return 0
