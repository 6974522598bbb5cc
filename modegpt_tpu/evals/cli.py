"""Standalone evaluation CLI for saved models.

The reference's post-compression workflow runs EleutherAI lm_eval over
the saved artifact (reference: tests.sh:107-113) and re-computes PPL via
the driver. This gives both natively:

  python -m modegpt_tpu.evals.cli --model <artifact-or-hf-dir> \
      --dataset wikitext --tasks arc_easy,piqa --generate "a prompt"

Accepts either a modegpt_tpu artifact directory (spec.json present) or a
dense HF checkpoint directory.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def _load_any(path: str):
    """(spec, params, tokenizer) from an artifact or HF checkpoint dir."""
    if os.path.exists(os.path.join(path, "spec.json")):
        from modegpt_tpu.compress.artifact import load_compressed_model

        spec, params, tok_src = load_compressed_model(path)
        tokenizer = None
        # tokenizer files copied into the artifact dir win over the
        # recorded source pointer (reference resolves tokenizer_source.txt,
        # model_utils.py:129-165; local files make artifacts portable).
        has_local = os.path.exists(os.path.join(path, "tokenizer.json")) or os.path.exists(
            os.path.join(path, "tokenizer_config.json")
        )
        for source in ([path] if has_local else []) + [tok_src or path]:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(source)
                if tokenizer.pad_token is None:
                    tokenizer.pad_token = tokenizer.eos_token
                break
            except Exception:
                tokenizer = None
        return spec, params, tokenizer
    from modegpt_tpu.models.hf import load_hf_model

    return load_hf_model(path)


def main(argv=None):
    from modegpt_tpu.utils.logging import setup_logging

    parser = argparse.ArgumentParser(prog="modegpt-tpu-eval")
    parser.add_argument("--model", required=True, help="artifact dir or HF checkpoint dir")
    parser.add_argument("--dataset", default="", help="PPL dataset (wikitext/c4/alpaca/synthetic/<file>)")
    parser.add_argument("--tasks", default="", help="comma list: arc_challenge,arc_easy,piqa,winogrande,hellaswag")
    parser.add_argument("--task_limit", type=int, default=0, help="cap examples per task")
    parser.add_argument("--seq_len", type=int, default=2048)
    parser.add_argument("--eval_batch_size", type=int, default=16)
    parser.add_argument("--eval_max_samples", type=int, default=512)
    parser.add_argument(
        "--alpaca_per_sample", action="store_true",
        help="per-sample truncated-window alpaca PPL (reference "
        "evaluate_perplexity_alpaca, eval.py:257-295) instead of the "
        "joined-window harness",
    )
    parser.add_argument("--generate", default="", help="prompt to generate from")
    parser.add_argument("--max_new_tokens", type=int, default=64)
    parser.add_argument(
        "--speculative_draft", default="",
        help="artifact/checkpoint dir used as speculative-decoding draft; "
        "--model becomes the verified target (greedy output is the target's own)",
    )
    parser.add_argument("--n_draft", type=int, default=4, help="draft tokens per round")
    parser.add_argument(
        "--prompt_lookup", action="store_true",
        help="draft-model-free speculative decoding: drafts come from "
        "n-gram matches against the sequence's own history (greedy-exact)",
    )
    parser.add_argument("--lookup_ngram", type=int, default=3, help="prompt-lookup match length")
    parser.add_argument(
        "--streaming_window", type=int, default=0,
        help="generate with an attention-sink ring cache of this many "
        "tokens (unbounded stream length, O(window) memory; lossy beyond "
        "the window — StreamingLLM semantics)",
    )
    parser.add_argument("--streaming_sinks", type=int, default=4)
    parser.add_argument("--mesh_shape", default="")
    parser.add_argument(
        "--compressed_exec", default="auto", choices=("auto", "unrolled", "padded"),
        help="heterogeneous-rank execution path (see models/padded.py)",
    )
    args = parser.parse_args(argv)

    logger = setup_logging()
    from modegpt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from modegpt_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    spec, params, tokenizer = _load_any(args.model)
    logger.info("loaded %s: %s layers, dense=%s", args.model, spec.n_layers, spec.is_dense)

    from modegpt_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(args.mesh_shape)
    results = {}

    if args.alpaca_per_sample:
        from modegpt_tpu.evals.perplexity import compute_perplexity_alpaca

        if tokenizer is None:
            raise SystemExit("--alpaca_per_sample requires a tokenizer")
        ppl = compute_perplexity_alpaca(
            spec, params, tokenizer, max_length=args.seq_len,
            batch_size=args.eval_batch_size,
        )
        results["ppl-alpaca-per-sample"] = ppl
        logger.info("ppl-alpaca-per-sample: %.4f", ppl)

    if args.dataset:
        from modegpt_tpu.calib.data import load_eval_tokens
        from modegpt_tpu.evals.perplexity import compute_perplexity

        tokens = load_eval_tokens(
            tokenizer, args.dataset, args.seq_len, args.eval_max_samples,
            vocab_size=spec.vocab_size,
        )
        ppl = compute_perplexity(
            spec, params, tokens, args.eval_batch_size, mesh=mesh, metrics=results,
            exec_mode=args.compressed_exec,
        )
        results[f"ppl-{args.dataset}"] = ppl
        logger.info("ppl-%s: %.4f", args.dataset, ppl)

    if args.tasks:
        from modegpt_tpu.evals.tasks import evaluate_multiple_choice, load_task

        if tokenizer is None:
            raise SystemExit("--tasks requires a tokenizer (artifact's tokenizer_source)")
        for task in args.tasks.split(","):
            task = task.strip()
            examples = load_task(task, limit=args.task_limit or None)
            res = evaluate_multiple_choice(
                spec, params, examples, tokenizer, batch_size=args.eval_batch_size
            )
            results[task] = res
            logger.info("%s: %s", task, res)

    if args.generate:
        from modegpt_tpu.models.generate import generate
        import numpy as np

        if tokenizer is None:
            raise SystemExit("--generate requires a tokenizer")
        ids = np.asarray([tokenizer(args.generate)["input_ids"]], dtype=np.int32)
        eos = getattr(tokenizer, "eos_token_id", None)
        if args.streaming_window:
            from modegpt_tpu.models.padded import pad_to_uniform
            from modegpt_tpu.models.streaming import streaming_generate

            out = streaming_generate(
                pad_to_uniform(spec, params), ids,
                max_new_tokens=args.max_new_tokens, window=args.streaming_window,
                n_sink=args.streaming_sinks, eos_token_id=eos,
            )
        elif args.prompt_lookup:
            from modegpt_tpu.models.padded import pad_to_uniform
            from modegpt_tpu.models.speculative import prompt_lookup_generate

            out, stats = prompt_lookup_generate(
                pad_to_uniform(spec, params), ids,
                max_new_tokens=args.max_new_tokens, n_draft=args.n_draft,
                ngram=args.lookup_ngram, eos_token_id=eos, return_stats=True,
            )
            results["prompt_lookup"] = {
                "rounds": int(stats.rounds.sum()),
                "drafted": int(stats.drafted.sum()),
                "accepted": int(stats.accepted.sum()),
                "acceptance_rate": float(stats.accepted.sum())
                / max(float(stats.drafted.sum()), 1.0),
            }
            logger.info("prompt-lookup decode: %s", results["prompt_lookup"])
        elif args.speculative_draft:
            from modegpt_tpu.models.padded import pad_to_uniform
            from modegpt_tpu.models.speculative import speculative_generate

            dspec, dparams, _ = _load_any(args.speculative_draft)
            out, stats = speculative_generate(
                pad_to_uniform(dspec, dparams), pad_to_uniform(spec, params), ids,
                max_new_tokens=args.max_new_tokens, n_draft=args.n_draft,
                eos_token_id=eos, return_stats=True,
            )
            results["spec_decode"] = {
                "rounds": int(stats.rounds.sum()),
                "drafted": int(stats.drafted.sum()),
                "accepted": int(stats.accepted.sum()),
                "acceptance_rate": float(stats.accepted.sum())
                / max(float(stats.drafted.sum()), 1.0),
            }
            logger.info("speculative decode: %s", results["spec_decode"])
        else:
            out = generate(
                spec, params, ids, max_new_tokens=args.max_new_tokens, eos_token_id=eos
            )
        text = tokenizer.decode(np.asarray(out)[0].tolist())
        results["generation"] = text
        print(text)

    print(json.dumps({k: v for k, v in results.items() if k != "generation"}, default=str))
    return results


if __name__ == "__main__":
    main()


def _console() -> int:
    """Console-script entry: `main` returns a results dict for library
    callers; setuptools passes the return value to sys.exit, so wrap it."""
    main()
    return 0
