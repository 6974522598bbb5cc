"""Zero-shot multiple-choice evaluation harness.

The reference delegates zero-shot accuracy to the external EleutherAI
`lm_eval` harness (reference: tests.sh:107-113 — arc_challenge, arc_easy,
piqa, winogrande, hellaswag at 0-shot). This is the framework-native
equivalent: length-normalised log-likelihood scoring of answer choices,
batched and jitted on-device, with task adapters for the same five tasks
(loaded from the local HF datasets cache when present) plus a synthetic
task for offline testing.

Scoring follows lm_eval's convention: pick the choice with the highest
total log-likelihood of the continuation tokens given the context
(`acc`), and also report the byte-length-normalised variant (`acc_norm`)
that lm_eval reports for arc/hellaswag/piqa.

Two scoring modes, matching lm_eval's two request shapes:

* shared context (arc/piqa/hellaswag): score choice i as
  ``LL(" " + choice_i | context)``;
* partial scoring (winogrande): per-choice CONTEXTS with one shared
  continuation — context i = sentence prefix with option i substituted
  for the blank, continuation = the suffix after the blank, and ONLY the
  suffix log-likelihood is compared (the option tokens' own likelihood
  never enters the score).

The doc -> example converters (``winogrande_doc``/``hellaswag_doc``/…)
are pure functions unit-tested against lm_eval's documented
preprocessing so accuracies are comparable with the reference's
lm_eval runs (reference: tests.sh:107-113).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.forward import forward
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = [
    "MCExample",
    "evaluate_multiple_choice",
    "load_task",
    "load_task_docs",
    "TASK_LOADERS",
    "TASK_DOC_CONVERTERS",
    "arc_doc",
    "piqa_doc",
    "hellaswag_doc",
    "winogrande_doc",
]


@dataclass
class MCExample:
    context: str
    choices: List[str]
    answer: int
    # Partial-scoring mode (lm_eval winogrande): when ``contexts`` is set,
    # choice i is scored as LL(continuation | contexts[i]) and ``choices``
    # is ignored.
    contexts: Optional[List[str]] = None
    continuation: str = ""

    def pairs(self) -> List[Tuple[str, str]]:
        """(context, continuation) per choice, in lm_eval request shape."""
        if self.contexts is not None:
            return [(ctx, self.continuation) for ctx in self.contexts]
        return [(self.context, choice) for choice in self.choices]


def _pad_batch(seqs: List[np.ndarray], pad_id: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    out = np.full((len(seqs), width), pad_id, dtype=np.int32)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
        lens[i] = len(s)
    return out, lens


def evaluate_multiple_choice(
    spec: ModelSpec,
    params: Dict,
    examples: Sequence[MCExample],
    tokenizer,
    batch_size: int = 16,
    max_len: int = 512,
    return_scores: bool = False,
) -> Dict[str, float]:
    """Zero-shot accuracy over multiple-choice examples."""

    @jax.jit
    def _token_logprobs(params, ids):
        logits, _ = forward(spec, params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]

    # Flatten (example, choice) pairs.
    flat: List[Tuple[int, int, np.ndarray, int, int]] = []
    for ei, ex in enumerate(examples):
        for ci, (context, cont) in enumerate(ex.pairs()):
            ctx_ids = tokenizer(context, add_special_tokens=False)["input_ids"]
            cont_ids = tokenizer(cont, add_special_tokens=False)["input_ids"]
            ids = np.asarray(ctx_ids + cont_ids, dtype=np.int32)[-max_len:]
            cont_len = min(len(cont_ids), len(ids) - 1)
            flat.append((ei, ci, ids, cont_len, len(cont.encode("utf-8"))))

    n_ex = len(examples)
    scores = np.full((n_ex, max(len(e.pairs()) for e in examples)), -np.inf)
    scores_norm = np.full_like(scores, -np.inf)

    pad_id = 0
    for start in range(0, len(flat), batch_size):
        chunk = flat[start : start + batch_size]
        width = max(len(c[2]) for c in chunk)
        ids, lens = _pad_batch([c[2] for c in chunk], pad_id, width)
        lp = np.asarray(_token_logprobs(params, jnp.asarray(ids)))  # [B, width-1]
        for row, (ei, ci, seq, cont_len, n_bytes) in enumerate(chunk):
            end = lens[row] - 1  # positions predicting tokens 1..len-1
            ll = lp[row, end - cont_len : end].sum()
            scores[ei, ci] = ll
            scores_norm[ei, ci] = ll / max(n_bytes, 1)

    answers = np.asarray([ex.answer for ex in examples])
    acc = float((scores.argmax(axis=1) == answers).mean())
    acc_norm = float((scores_norm.argmax(axis=1) == answers).mean())
    out = {"acc": acc, "acc_norm": acc_norm, "n": n_ex}
    if return_scores:
        out["scores"] = scores
        out["scores_norm"] = scores_norm
    return out


# ---------------------------------------------------------------------------
# Task adapters (same tasks as reference tests.sh:107-113)
# ---------------------------------------------------------------------------


def arc_doc(doc: Dict) -> Optional[MCExample]:
    """lm_eval's arc_* doc shape: ``Question: {q}\nAnswer:`` context,
    ' '-prefixed choice texts, answer index resolved through the LABEL
    list (ARC mixes letter labels A-E with numeric labels 1-4 — lm_eval
    indexes ``choices.label``, never assumes letters). Docs whose
    answerKey is missing from the labels are skipped (returns None), as
    lm_eval's dataset filtering does."""
    labels = doc["choices"]["label"]
    if doc["answerKey"] not in labels:
        return None
    return MCExample(
        context=f"Question: {doc['question']}\nAnswer:",
        choices=[" " + t for t in doc["choices"]["text"]],
        answer=labels.index(doc["answerKey"]),
    )


def _arc(subset: str, limit):
    from datasets import load_dataset

    ds = load_dataset("allenai/ai2_arc", subset, split="test")
    out = []
    for ex in ds:
        mc = arc_doc(ex)
        if mc is None:
            continue
        out.append(mc)
        if limit and len(out) >= limit:
            break
    return out


def piqa_doc(doc: Dict) -> MCExample:
    """lm_eval's piqa doc shape: ``Question: {goal}\nAnswer:`` context,
    the two ' '-prefixed solutions as choices, integer label."""
    return MCExample(
        context=f"Question: {doc['goal']}\nAnswer:",
        choices=[" " + doc["sol1"], " " + doc["sol2"]],
        answer=int(doc["label"]),
    )


def _piqa(limit):
    from datasets import load_dataset

    ds = load_dataset("piqa", split="validation")
    out = []
    for ex in ds:
        out.append(piqa_doc(ex))
        if limit and len(out) >= limit:
            break
    return out


def _hellaswag_preprocess(text: str) -> str:
    """lm_eval's hellaswag text cleanup (tasks/hellaswag `preprocess`):
    strip, turn WikiHow ' [title]' artifacts into sentence breaks, drop
    remaining bracket artifacts, collapse double spaces."""
    import re

    text = text.strip()
    text = text.replace(" [title]", ". ")
    text = re.sub(r"\[.*?\]", "", text)
    text = text.replace("  ", " ")
    return text


def hellaswag_doc(doc: Dict) -> MCExample:
    """lm_eval's hellaswag `process_docs`: query is
    ``activity_label + ': ' + ctx_a + ' ' + ctx_b.capitalize()`` run
    through the preprocessor; each ending is preprocessed and scored as
    a ' '-prefixed continuation."""
    ctx = doc["ctx_a"] + " " + doc["ctx_b"].capitalize()
    return MCExample(
        context=_hellaswag_preprocess(doc["activity_label"] + ": " + ctx),
        choices=[" " + _hellaswag_preprocess(e) for e in doc["endings"]],
        answer=int(doc["label"]),
    )


def _hellaswag(limit):
    from datasets import load_dataset

    ds = load_dataset("hellaswag", split="validation")
    out = []
    for ex in ds:
        out.append(hellaswag_doc(ex))
        if limit and len(out) >= limit:
            break
    return out


def winogrande_doc(doc: Dict) -> MCExample:
    """lm_eval's winogrande partial scoring (tasks/winogrande
    `partial_context`/`partial_target`): context i = sentence prefix with
    option i substituted for the blank; the shared continuation is
    ``' ' + suffix.strip()``; only the suffix log-likelihood is compared."""
    cut = doc["sentence"].index("_")
    prefix = doc["sentence"][:cut]
    target = " " + doc["sentence"][cut + 1 :].strip()
    return MCExample(
        context="",
        choices=[],
        answer=int(doc["answer"]) - 1,
        contexts=[prefix + doc["option1"], prefix + doc["option2"]],
        continuation=target,
    )


def _winogrande(limit):
    from datasets import load_dataset

    ds = load_dataset("winogrande", "winogrande_xl", split="validation")
    out = []
    for ex in ds:
        out.append(winogrande_doc(ex))
        if limit and len(out) >= limit:
            break
    return out


def _synthetic(limit):
    """Offline stand-in task (no datasets dependency): repetition-biased
    MC items a language model scores without any knowledge, so the
    harness end-to-end path — tokenize, batched LL scoring, acc/acc_norm
    aggregation — is exercisable in zero-egress environments."""
    out = [
        MCExample(context="one two one two one", choices=[" two", " zebra"], answer=0),
        MCExample(context="a b a b a", choices=[" b", " q"], answer=0),
        MCExample(context="x y z", choices=[" x", " y", " z"], answer=2),
        MCExample(
            context="",
            choices=[],
            answer=0,
            contexts=["the dog", "the xylophone"],
            continuation=" ran",
        ),
    ]
    return out[:limit] if limit else out


TASK_LOADERS: Dict[str, Callable] = {
    "arc_challenge": lambda limit=None: _arc("ARC-Challenge", limit),
    "arc_easy": lambda limit=None: _arc("ARC-Easy", limit),
    "piqa": _piqa,
    "hellaswag": _hellaswag,
    "winogrande": _winogrande,
    "synthetic": _synthetic,
}

# Raw-dataset-schema doc converters, one per task family — the pure
# functions the HF loaders above iterate. Exposed so air-gapped runs can
# evaluate on locally vendored documents (load_task_docs / a .json path
# to load_task) through EXACTLY the preprocessing the online loaders use.
TASK_DOC_CONVERTERS: Dict[str, Callable[[Dict], Optional[MCExample]]] = {
    "arc_challenge": arc_doc,
    "arc_easy": arc_doc,
    "piqa": piqa_doc,
    "hellaswag": hellaswag_doc,
    "winogrande": winogrande_doc,
}


def load_task_docs(task: str, docs: Sequence[Dict]) -> List[MCExample]:
    """Convert raw dataset-schema ``docs`` through ``task``'s converter
    (skipping docs the converter rejects, e.g. ARC answerKey mismatches)."""
    if task not in TASK_DOC_CONVERTERS:
        raise ValueError(
            f"no doc converter for task {task!r}; available: "
            f"{sorted(TASK_DOC_CONVERTERS)}"
        )
    conv = TASK_DOC_CONVERTERS[task]
    out = []
    for d in docs:
        mc = conv(d)
        if mc is not None:
            out.append(mc)
    return out


def load_task(name: str, limit: Optional[int] = None) -> List[MCExample]:
    """Load a task by name, or by path to a vendored fixture file.

    A ``name`` ending in ``.json`` is read as
    ``{"task": <family>, "docs": [<raw dataset-schema doc>, ...]}`` and
    converted through the family's doc converter — the offline path for
    zero-egress hosts (the HF loaders need a local datasets cache)."""
    if name.endswith(".json"):
        import json as _json

        with open(name) as f:
            blob = _json.load(f)
        docs = load_task_docs(blob["task"], blob["docs"])
        return docs[:limit] if limit else docs
    if name not in TASK_LOADERS:
        raise ValueError(f"unknown task {name!r}; available: {sorted(TASK_LOADERS)}")
    return TASK_LOADERS[name](limit)
