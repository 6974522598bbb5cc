"""Guided (constrained) decoding: the regex->DFA engine must agree with
Python `re`, token lifting must expose exactly the grammar-viable
tokens, and the serving batcher must emit only grammar-valid outputs
while leaving unguided batch-mates bit-identical (CPU f32)."""

import json
import re as pyre

import numpy as np
import pytest

from modegpt_tpu.models.guided import (
    RegexError,
    TokenGuide,
    compile_charset,
    compile_regex,
    regex_for_choice,
    regex_for_json_object,
    regex_for_json_schema,
)

# ---------------------------------------------------------------------------
# engine: DFA vs Python re (fullmatch semantics)
# ---------------------------------------------------------------------------

_PATTERNS = [
    "abc",
    "a|bc|",
    "(ab)*c",
    "a+b?c{2,3}",
    "[a-f0-9]+",
    "[^xyz]{1,4}",
    "\\d{2}-\\d{2}",
    "(foo|bar)(baz)?",
    "a.c",
    "\\w+@\\w+\\.(com|org)",
    "x{3}",
    "(?:ab|cd){1,2}e",
    "\\s*ok\\s*",
    "a{2,}",
]

_PROBES = [
    "", "a", "b", "c", "ab", "abc", "abcc", "ababc", "bc", "aabcc",
    "abccc", "f00", "deadbeef", "xyz", "wvu", "12-34", "1-234",
    "foobaz", "bar", "barbaz", "axc", "a\nc", "a@b.com", "ab@cd.org",
    "xxx", "xx", "xxxx", "abe", "abcde", "cdabe", "  ok ", "ok",
    "aa", "aaa", "aaaaaaa",
]


@pytest.mark.parametrize("pattern", _PATTERNS)
def test_dfa_matches_python_re(pattern):
    dfa = compile_charset(pattern)
    ref = pyre.compile(pattern)
    for s in _PROBES:
        assert dfa.fullmatch(s) == bool(ref.fullmatch(s)), (pattern, s)


def test_dfa_multibyte_utf8_literal():
    dfa = compile_charset("é+x")
    assert dfa.fullmatch("ééx")
    assert not dfa.fullmatch("x")
    assert not dfa.fullmatch("éx".encode()[:-1])  # truncated UTF-8


def test_literal_brace_matches_python_re():
    # '{' not opening a valid bound is a literal, like Python re
    dfa = compile_charset("a{2")
    assert dfa.fullmatch("a{2") == bool(pyre.fullmatch("a{2", "a{2"))


def test_regex_errors():
    for bad in ["(ab", "ab)", "a**", "*a", "[z-a]", "a{4,2}", "a{9999,}",
                "a{0,99999}", "^ab$"]:
        with pytest.raises(RegexError):
            compile_charset(bad)


def test_choice_regex_escapes_specials():
    pat = regex_for_choice(["a.b", "c+d", "x{1}"])
    dfa = compile_charset(pat)
    for s in ["a.b", "c+d", "x{1}"]:
        assert dfa.fullmatch(s)
    assert not dfa.fullmatch("axb")
    assert not dfa.fullmatch("ccd")
    with pytest.raises(ValueError):
        regex_for_choice([])


def test_json_object_regex_accepts_real_json():
    dfa = compile_charset(regex_for_json_object(max_depth=2))
    good = [
        {}, {"a": 1}, {"a": -2.5e3, "b": "x\\ny"}, {"k": [1, "two", None]},
        {"nested": {"x": True}}, {"s": 'q"uote'},
    ]
    for obj in good:
        assert dfa.fullmatch(json.dumps(obj)), obj
    for bad in ["", "[1,2]", '"str"', "{", '{"a":}', "{'a':1}", '{"a":01}']:
        assert not dfa.fullmatch(bad), bad


def test_json_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tag": {"enum": ["x", "y"]},
            "scores": {"type": "array", "items": {"type": "number"},
                       "minItems": 1, "maxItems": 2},
        },
    }
    dfa = compile_charset(regex_for_json_schema(schema))
    ok = '{"name": "bo", "age": 3, "tag": "x", "scores": [1.5]}'
    assert dfa.fullmatch(ok)
    assert dfa.fullmatch(
        '{"name":"","age":-2,"tag":"y","scores":[1,2]}'
    )
    # wrong order / missing key / over maxItems / wrong enum all rejected
    for bad in [
        '{"age": 3, "name": "bo", "tag": "x", "scores": [1]}',
        '{"name": "bo", "age": 3, "tag": "x"}',
        '{"name": "bo", "age": 3, "tag": "x", "scores": [1,2,3]}',
        '{"name": "bo", "age": 3, "tag": "z", "scores": [1]}',
        '{"name": "bo", "age": 3.5, "tag": "x", "scores": [1]}',
    ]:
        assert not dfa.fullmatch(bad), bad


# ---------------------------------------------------------------------------
# token lifting
# ---------------------------------------------------------------------------


def _byte_vocab(vocab_size: int, eos_id: int, strip_ws: bool = False):
    """Synthetic vocabulary: token i spells the single byte i (eos and,
    optionally, whitespace bytes spell nothing — never content)."""
    ws = {0x20, 0x09, 0x0A, 0x0D, 0x0B, 0x0C}
    return [
        b"" if i == eos_id or (strip_ws and i in ws) else bytes([i])
        for i in range(vocab_size)
    ]


def test_token_guide_masks_and_advance():
    eos = 127
    tb = _byte_vocab(128, eos)
    g = compile_regex("(ab|ba)c*", tb, eos)
    st = g.start
    mask = g.mask_for(st)
    assert mask[ord("a")] and mask[ord("b")]
    assert not mask[ord("c")] and not mask[eos]
    assert mask.sum() == 2
    st = g.advance(st, ord("a"))
    mask = g.mask_for(st)
    assert mask[ord("b")] and not mask[ord("a")] and not mask[eos]
    st = g.advance(st, ord("b"))
    mask = g.mask_for(st)  # "ab" accepts; c* may continue
    assert mask[eos] and mask[ord("c")] and mask.sum() == 2
    assert g.eos_ok(st)
    st = g.advance(st, ord("c"))
    assert g.eos_ok(st) and g.mask_for(st)[ord("c")]


def test_token_guide_multibyte_tokens():
    """Tokens spanning several grammar positions walk the whole way."""
    eos = 9
    tb = [b"", b"ab", b"ba", b"a", b"b", b"abab", b"abx", b"", b"c", b""]
    g = compile_regex("(ab)+", tb, eos)
    m = g.mask_for(g.start)
    assert m[1] and m[3] and m[5]          # "ab", "a", "abab"
    assert not m[2] and not m[4] and not m[6] and not m[8]
    st = g.advance(g.start, 5)             # "abab" -> accepting
    assert g.eos_ok(st) and g.mask_for(st)[1]
    st2 = g.advance(g.start, 3)            # "a" -> mid-pair
    m2 = g.mask_for(st2)
    assert m2[4] and not m2[eos] and not m2[1]


def test_token_guide_random_walks_never_die(rng):
    """Any path that follows the mask stays alive, and EOS is allowed
    exactly at accepting states."""
    eos = 127
    tb = _byte_vocab(128, eos)
    g = compile_regex("[a-d]{1,6}(x|yz)", tb, eos)
    ref = pyre.compile("[a-d]{1,6}(x|yz)")
    for _ in range(50):
        st, emitted = g.start, b""
        for _ in range(10):
            mask = g.mask_for(st)
            assert g.eos_ok(st) == bool(ref.fullmatch(emitted.decode()))
            choices = np.nonzero(mask)[0]
            choices = choices[choices != eos]
            if choices.size == 0:
                break
            t = int(rng.choice(choices))
            emitted += tb[t]
            st = g.advance(st, t)
        assert not g.dead_end(st)


def test_token_guide_dead_grammar():
    eos = 10
    tb = [bytes([i + ord("a")]) for i in range(10)] + [b""]
    g = compile_regex("z+", tb, eos)  # no token spells 'z'
    assert g.dead_end(g.start)


def test_gpt2_byte_decoder_is_a_permutation():
    from modegpt_tpu.models.guided import _gpt2_byte_decoder

    dec = _gpt2_byte_decoder()
    assert len(dec) == 256
    assert sorted(dec.values()) == list(range(256))


# ---------------------------------------------------------------------------
# batcher integration (tiny HF llama, CPU f32)
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import params_from_hf_model  # noqa: E402
from modegpt_tpu.models.generate import generate  # noqa: E402
from modegpt_tpu.models.padded import pad_to_uniform  # noqa: E402
from modegpt_tpu.models.serving import ContinuousBatcher  # noqa: E402


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


EOS = 127


def _pm():
    spec, params = params_from_hf_model(_tiny_llama())
    return spec, params, pad_to_uniform(spec, params)


def test_guided_choice_and_unguided_exactness(rng):
    """A guided request's output spells one of the choices exactly and
    ends with EOS; the unguided batch-mate is bit-identical to its solo
    greedy decode (the mask variant must not perturb other rows)."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    guide = compile_regex(regex_for_choice(["cat", "dog", "bird"]), tb, EOS,
                          vocab_size=spec.vocab_size)
    free = rng.integers(1, 100, size=(6,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, free[None, :], max_new_tokens=8,
                 temperature=0.0, eos_token_id=EOS)
    )[0].tolist()

    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS)
    gid = b.submit(rng.integers(1, 100, size=(4,)).astype(np.int32),
                   max_new_tokens=10, guide=guide)
    fid = b.submit(free, max_new_tokens=8)
    done = b.run()
    out = done[gid][4:]
    assert out[-1] == EOS
    word = b"".join(tb[t] for t in out[:-1]).decode()
    assert word in ("cat", "dog", "bird")
    # the generate() reference stops AT eos too; compare the full row
    n = len(done[fid]) - 6
    assert done[fid] == ref[: 6 + n]


def test_guided_json_schema_parses(rng):
    """Forced valid JSON: a finite schema grammar terminates within the
    budget and json.loads accepts the output."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS, strip_ws=True)  # compact JSON (no ws tokens)
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"},
                             "tag": {"enum": ["a", "b"]}}}
    guide = compile_regex(regex_for_json_schema(schema), tb, EOS,
                          vocab_size=spec.vocab_size)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS)
    rid = b.submit(rng.integers(1, 100, size=(3,)).astype(np.int32),
                   max_new_tokens=32, guide=guide)
    out = b.run()[rid][3:]
    assert out[-1] == EOS
    obj = json.loads(b"".join(tb[t] for t in out[:-1]).decode())
    assert set(obj) == {"ok", "tag"}
    assert isinstance(obj["ok"], bool) and obj["tag"] in ("a", "b")


def test_guided_sampled_rows_stay_in_grammar(rng):
    """Per-request sampling + guide: every sampled token obeys the mask
    (temperature 1.3, several requests, mixed with greedy traffic)."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    guide = compile_regex("[a-h]{2,12}", tb, EOS, vocab_size=spec.vocab_size)
    ref = pyre.compile("[a-h]{2,12}")
    b = ContinuousBatcher(pm, slots=3, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS, per_request_sampling=True)
    gids = [
        b.submit(rng.integers(1, 100, size=(4,)).astype(np.int32),
                 max_new_tokens=14, guide=guide, temperature=1.3, seed=i)
        for i in range(3)
    ]
    b.submit(rng.integers(1, 100, size=(5,)).astype(np.int32), max_new_tokens=6)
    done = b.run()
    for rid in gids:
        out = done[rid][4:]
        body = out[:-1] if out[-1] == EOS else out
        s = b"".join(tb[t] for t in body).decode()
        if out[-1] == EOS:
            assert ref.fullmatch(s), s
        else:  # budget-truncated: still a viable prefix
            assert all(c in "abcdefgh" for c in s) and len(s) <= 12


def test_guided_budget_truncation_mid_grammar(rng):
    """Budget may end before the grammar accepts: the output is a
    viable prefix and the request still finishes (no hang)."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    guide = compile_regex("[a-b]{10}z", tb, EOS, vocab_size=spec.vocab_size)
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS)
    rid = b.submit(rng.integers(1, 100, size=(3,)).astype(np.int32),
                   max_new_tokens=4, guide=guide)
    out = b.run()[rid][3:]
    assert len(out) == 4
    assert all(tb[t].decode() in "ab" for t in out)


def test_guided_adds_one_decode_program():
    """Guided traffic selects a masked program VARIANT: mixed guided +
    unguided serving adds exactly one _decode_slots_jit entry beyond the
    unmasked one (the traced [slots, V] table never recompiles)."""
    from modegpt_tpu.models.serving import _decode_slots_jit

    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    rng = np.random.default_rng(3)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS)
    b.submit(rng.integers(1, 100, size=(4,)).astype(np.int32), max_new_tokens=4)
    b.run()
    base = _decode_slots_jit._cache_size()
    sizes = []
    for pat in ("cat|dog", "[a-f]{1,3}", "x+y"):
        g = compile_regex(pat, tb, EOS, vocab_size=spec.vocab_size)
        b.submit(rng.integers(1, 100, size=(4,)).astype(np.int32),
                 max_new_tokens=6, guide=g)
        b.submit(rng.integers(1, 100, size=(5,)).astype(np.int32),
                 max_new_tokens=4)
        b.run()
        sizes.append(_decode_slots_jit._cache_size())
    # the first guided dispatch may add the masked variant (unless an
    # earlier test in this module already compiled it); later patterns
    # and mixed traffic must add NOTHING — the [slots, V] table is traced
    assert sizes[0] - base <= 1
    assert sizes[2] == sizes[1] == sizes[0]


def test_guided_forces_single_step_rounds(rng):
    """steps_per_dispatch > 1 must drop to single-step rounds while a
    guided request is resident (the fused scan cannot see the mask) —
    output still grammar-exact."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    guide = compile_regex(regex_for_choice(["lion", "wolf"]), tb, EOS,
                          vocab_size=spec.vocab_size)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS, steps_per_dispatch=4)
    rid = b.submit(rng.integers(1, 100, size=(4,)).astype(np.int32),
                   max_new_tokens=8, guide=guide)
    out = b.run()[rid][4:]
    assert out[-1] == EOS
    assert b"".join(tb[t] for t in out[:-1]).decode() in ("lion", "wolf")


def test_guided_validation_errors(rng):
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    ok = compile_regex("ab", tb, EOS, vocab_size=spec.vocab_size)
    prompt = rng.integers(1, 100, size=(3,)).astype(np.int32)

    b2 = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8)
    with pytest.raises(ValueError, match="eos"):
        b2.submit(prompt, max_new_tokens=4, guide=ok)  # no eos_token_id

    b3 = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                           eos_token_id=EOS)
    small = compile_regex("ab", tb[:64], 63)
    with pytest.raises(ValueError, match="vocab"):
        b3.submit(prompt, max_new_tokens=4, guide=small)
    # bytes >= 128 are unspellable in the synthetic single-byte vocab
    dead = compile_regex("\\xff+", tb, EOS, vocab_size=spec.vocab_size)
    with pytest.raises(ValueError, match="no token"):
        b3.submit(prompt, max_new_tokens=4, guide=dead)


def test_guided_speculative_prompt_lookup_exact(rng):
    """Guided + prompt_lookup speculative serving: the host repairs
    drafts through the automaton and ships per-position verify masks —
    output must EXACTLY equal plain guided decode (CPU f32), with the
    unguided batch-mate staying greedy-exact too."""
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    pattern = "(ab|cd){2,8}e"
    prompt = rng.integers(1, 100, size=(5,)).astype(np.int32)
    free = rng.integers(1, 100, size=(6,)).astype(np.int32)

    g0 = compile_regex(pattern, tb, EOS, vocab_size=spec.vocab_size)
    b0 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=EOS)
    r0 = b0.submit(prompt, max_new_tokens=20, guide=g0)
    ref = b0.run()[r0]

    ref_free = np.asarray(
        generate(spec, params, free[None, :], max_new_tokens=8,
                 temperature=0.0, eos_token_id=EOS)
    )[0].tolist()

    g1 = compile_regex(pattern, tb, EOS, vocab_size=spec.vocab_size)
    b1 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=EOS, spec_decode="prompt_lookup",
                           n_draft=3)
    r1 = b1.submit(prompt, max_new_tokens=20, guide=g1)
    rf = b1.submit(free, max_new_tokens=8)
    done = b1.run()
    assert done[r1] == ref
    n = len(done[rf]) - 6
    assert done[rf] == ref_free[: 6 + n]
    # the guided output itself is grammar-exact
    out = done[r1][5:]
    assert out[-1] == EOS
    assert pyre.fullmatch(pattern, b"".join(tb[t] for t in out[:-1]).decode())
    # telemetry recorded rounds for the guided request
    assert b1.stats[r1]["rounds"] >= 1


def test_guided_rejects_draft_model_speculation(rng):
    spec, params, pm = _pm()
    tb = _byte_vocab(128, EOS)
    g = compile_regex("ab", tb, EOS, vocab_size=spec.vocab_size)
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                          eos_token_id=EOS, spec_decode="draft", draft_pm=pm)
    with pytest.raises(ValueError, match="draft"):
        b.submit(rng.integers(1, 100, size=(3,)).astype(np.int32),
                 max_new_tokens=4, guide=g)
