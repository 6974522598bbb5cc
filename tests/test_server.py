"""HTTP serving frontend: the scheduler-thread facade and the
OpenAI-style endpoints must reproduce the batcher's (greedy-exact)
outputs through real concurrent HTTP round-trips on loopback."""

import http.client
import json
import threading

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.serving import ContinuousBatcher
from modegpt_tpu.server import InferenceServer, make_http_server


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def served():
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    batcher = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    server = InferenceServer(batcher, tokenizer=None, model_id="tiny-llama")
    httpd = make_http_server(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield spec, params, server, port
    httpd.shutdown()
    server.close()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _greedy_ref(spec, params, prompt, n_new):
    return np.asarray(
        generate(spec, params, np.asarray(prompt, np.int32)[None, :],
                 max_new_tokens=n_new, temperature=0.0)
    )[0].tolist()


def test_completions_roundtrip_matches_greedy(served, rng):
    """Concurrent POSTs (more requests than slots) each come back equal
    to the standalone greedy decode of their own prompt."""
    spec, params, _, port = served
    prompts = [rng.integers(1, spec.vocab_size, size=(p,)).tolist()
               for p in (3, 7, 5)]
    n_new = 6
    results = [None] * len(prompts)

    def worker(i):
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompts[i], "max_tokens": n_new})
        results[i] = (status, json.loads(data))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, prompt in enumerate(prompts):
        status, body = results[i]
        assert status == 200, body
        got = body["choices"][0]["token_ids"]
        assert prompt + got == _greedy_ref(spec, params, prompt, n_new)
        assert body["usage"]["completion_tokens"] == n_new
        assert body["choices"][0]["text"] is None  # no tokenizer on this server


def test_streaming_sse_matches_nonstreaming(served, rng):
    spec, params, _, port = served
    prompt = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
    n_new = 8

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", "/v1/completions",
                 body=json.dumps({"prompt_ids": prompt, "max_tokens": n_new,
                                  "stream": True}),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()  # http.client de-chunks for us
    conn.close()

    events = [line[len("data: "):] for line in raw.split("\n")
              if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    streamed = []
    for e in events[:-1]:
        streamed.extend(json.loads(e)["token_ids"])
    assert len(events) >= 3  # genuinely incremental, not one blob
    assert prompt + streamed == _greedy_ref(spec, params, prompt, n_new)


def test_health_models_and_errors(served):
    _, _, server, port = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)

    conn.request("GET", "/health")
    r = conn.getresponse()
    health = json.loads(r.read())
    assert r.status == 200 and health["status"] == "ok"
    assert health["slots"] == 2

    conn.request("GET", "/v1/models")
    r = conn.getresponse()
    models = json.loads(r.read())
    assert [m["id"] for m in models["data"]] == ["tiny-llama"]

    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404 or True  # drain
    conn.close()

    # bad requests: no prompt; prompt without tokenizer; over max_len
    assert _post(port, "/v1/completions", {})[0] == 400
    assert _post(port, "/v1/completions", {"prompt": "hi"})[0] == 400
    status, data = _post(port, "/v1/completions",
                         {"prompt_ids": [1] * 60, "max_tokens": 60})
    assert status == 400 and "max_len" in json.loads(data)["error"]


def test_batcher_cancel_frees_slot(rng):
    """cancel() on queued and in-flight requests: survivors still match
    per-sequence greedy, and the freed slot is reused."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=16)
    keep_p = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
    kill_p = rng.integers(1, spec.vocab_size, size=(4,)).tolist()
    kill_active = b.submit(kill_p, max_new_tokens=30)
    kill_queued = b.submit(kill_p, max_new_tokens=30)
    keep = b.submit(keep_p, max_new_tokens=6)

    key = jax.random.key(0)
    key, fin, _ = b.step(key)  # admits kill_active into the only slot
    assert b.slot_req[0] == kill_active and not fin
    assert b.cancel(kill_queued)  # still queued
    assert b.cancel(kill_active)  # in flight
    assert not b.cancel(kill_active)  # already gone
    assert b.slot_req[0] is None
    done = {}
    for _ in range(100):
        key, fin, drained = b.step(key)
        done.update(fin)
        if drained:
            break
    assert set(done) == {keep}
    assert done[keep] == _greedy_ref(spec, params, keep_p, 6)


def test_http_cancel_endpoint_and_backpressure(served, rng):
    """POST /v1/cancel aborts a streaming generation mid-flight; a
    max_queue=0 server 429s while its only slot is busy and accepts
    again after it frees."""
    spec, params, _, _ = served
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=None, model_id="bp", max_queue=0)
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = rng.integers(1, spec.vocab_size, size=(4,)).tolist()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/completions",
                     body=json.dumps({"prompt_ids": prompt, "max_tokens": 40,
                                      "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        # read one SSE event to know the request is in flight
        first = b""
        while b"\n\n" not in first:
            first += resp.read1(256)
        rid = json.loads(first.decode().split("data: ", 1)[1].split("\n")[0])["id"]

        # slot busy, zero queue allowance -> 429
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 4})
        assert status == 429, data

        status, data = _post(port, "/v1/cancel", {"id": rid})
        assert status == 200 and json.loads(data)["cancelled"]
        rest = resp.read()  # stream terminates promptly with [DONE]
        assert b"data: [DONE]" in first + rest
        conn.close()

        # unknown id -> 404; freed slot serves again, greedy-exact
        assert _post(port, "/v1/cancel", {"id": rid})[0] == 404
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 5})
        body = json.loads(data)
        assert status == 200, body
        got = body["choices"][0]["token_ids"]
        assert prompt + got == _greedy_ref(spec, params, prompt, 5)
    finally:
        httpd.shutdown()
        srv.close()


def test_inference_server_direct_and_reuse(served, rng):
    """The facade keeps serving across waves (scheduler sleeps between)
    and slots are reused; direct submit() bypasses HTTP."""
    spec, params, server, _ = served
    for wave in range(2):
        prompts = [rng.integers(1, spec.vocab_size, size=(4 + wave,)).tolist()
                   for _ in range(3)]
        reqs = [server.submit(p, max_new_tokens=5) for p in prompts]
        for p, r in zip(prompts, reqs):
            assert r.done.wait(timeout=300)
            assert r.tokens == _greedy_ref(spec, params, p, 5)
    occ = server.occupancy()
    assert occ["busy"] == 0 and occ["queued"] == 0


def test_http_per_request_sampling(rng):
    """Per-request sampling fields over HTTP: a greedy request and a
    sampled request share the server; the greedy one stays exact, the
    sampled one honours its own knobs; bad fields get 400."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16,
                          per_request_sampling=True)
    srv = InferenceServer(b, tokenizer=None, model_id="prs")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
        results = {}

        def worker(name, body):
            results[name] = _post(port, "/v1/completions", body)

        threads = [
            threading.Thread(target=worker, args=("greedy", {
                "prompt_ids": prompt, "max_tokens": 6})),
            threading.Thread(target=worker, args=("sampled", {
                "prompt_ids": prompt, "max_tokens": 6,
                "temperature": 0.9, "top_p": 0.9, "repetition_penalty": 1.2})),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        status, data = results["greedy"]
        assert status == 200
        got = json.loads(data)["choices"][0]["token_ids"]
        assert prompt + got == _greedy_ref(spec, params, prompt, 6)
        status, data = results["sampled"]
        assert status == 200
        got = json.loads(data)["choices"][0]["token_ids"]
        assert len(got) == 6 and all(0 <= t < spec.vocab_size for t in got)

        status, _ = _post(port, "/v1/completions",
                          {"prompt_ids": prompt, "temperature": "hot"})
        assert status == 400
    finally:
        httpd.shutdown()
        srv.close()


def test_http_stop_sequences(rng):
    """`stop_token_ids` over HTTP: non-streaming output truncates before
    the match; streaming never emits the stop tokens (holdback)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=None, model_id="stop")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
        full = _greedy_ref(spec, params, prompt, 10)
        gen = full[len(prompt):]
        j = 4
        stop = gen[j:j + 2]

        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 10,
                              "stop_token_ids": stop})
        assert status == 200
        body = json.loads(data)
        assert body["choices"][0]["token_ids"] == gen[:j]
        assert body["usage"]["completion_tokens"] == j

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/completions",
                     body=json.dumps({"prompt_ids": prompt, "max_tokens": 10,
                                      "stop_token_ids": [stop], "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        conn.close()
        events = [line[len("data: "):] for line in raw.split("\n")
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        streamed = [t for e in events[:-1] for t in json.loads(e)["token_ids"]]
        assert streamed == gen[:j]

        # string stop without a tokenizer -> 400
        status, _ = _post(port, "/v1/completions",
                          {"prompt_ids": prompt, "stop": "foo"})
        assert status == 400
    finally:
        httpd.shutdown()
        srv.close()


def test_http_logprobs(rng):
    """`logprobs` over HTTP: non-streaming carries
    choices[0].logprobs.token_logprobs; streaming events carry aligned
    per-delta logprobs."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=None, model_id="lp")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 6,
                              "logprobs": True})
        assert status == 200
        body = json.loads(data)
        lps = body["choices"][0]["logprobs"]["token_logprobs"]
        toks = body["choices"][0]["token_ids"]
        assert len(lps) == len(toks) == 6
        assert all(lp <= 0.0 for lp in lps)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/completions",
                     body=json.dumps({"prompt_ids": prompt, "max_tokens": 6,
                                      "logprobs": 1, "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        conn.close()
        events = [json.loads(line[len("data: "):]) for line in raw.split("\n")
                  if line.startswith("data: ") and "[DONE]" not in line]
        streamed_toks = [t for e in events for t in e["token_ids"]]
        streamed_lps = [l for e in events for l in e["logprobs"]]
        assert streamed_toks == toks
        assert streamed_lps == pytest.approx(lps, abs=1e-6)

        # plain request on the same server: no logprobs key
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 4})
        assert status == 200
        assert "logprobs" not in json.loads(data)["choices"][0]
    finally:
        httpd.shutdown()
        srv.close()


def test_http_top_logprobs(rng):
    """OpenAI top-logprob alternatives over HTTP: legacy completions
    `logprobs: N` returns top-N dicts per position (chosen token always
    among them, rows sorted descending); chat `logprobs: true,
    top_logprobs: N` returns the chat `content` shape; out-of-range N
    is a 400."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=None, model_id="toplp")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        prompt = rng.integers(1, spec.vocab_size, size=(5,)).tolist()
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": prompt, "max_tokens": 5,
                              "logprobs": 3})
        assert status == 200
        ch = json.loads(data)["choices"][0]
        lpd = ch["logprobs"]
        assert len(lpd["token_logprobs"]) == 5
        assert len(lpd["top_logprobs"]) == 5
        for j, row in enumerate(lpd["top_logprobs"]):
            assert len(row) == 3
            vals = sorted(row.values(), reverse=True)
            assert list(row.values()) == vals
            # greedy decode: the chosen token is the argmax -> its
            # (stringified) id heads the row and matches token_logprobs
            assert str(ch["token_ids"][j]) in row
            assert row[str(ch["token_ids"][j])] == pytest.approx(
                lpd["token_logprobs"][j], abs=1e-6
            )
            assert max(row.values()) == pytest.approx(
                lpd["token_logprobs"][j], abs=1e-6
            )

        status, _ = _post(port, "/v1/completions",
                          {"prompt_ids": prompt, "max_tokens": 2,
                           "logprobs": 50})
        assert status == 400
    finally:
        httpd.shutdown()
        srv.close()

    # chat shape (logprobs: true + top_logprobs: N) needs a tokenizer
    tokenizer = _tiny_tokenizer()
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=tokenizer, model_id="toplp-chat")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        status, data = _post(port, "/v1/chat/completions",
                             {"messages": [{"role": "user",
                                            "content": "hello there"}],
                              "max_tokens": 4,
                              "logprobs": True, "top_logprobs": 2})
        assert status == 200
        chc = json.loads(data)["choices"][0]
        content = chc["logprobs"]["content"]
        assert len(content) == 4
        for entry in content:
            assert len(entry["top_logprobs"]) == 2
            # greedy: the chosen token is the distribution's argmax
            assert entry["top_logprobs"][0]["logprob"] == pytest.approx(
                entry["logprob"], abs=1e-6
            )
    finally:
        httpd.shutdown()
        srv.close()


def test_streaming_chat_logprobs_shape():
    """Streaming chat chunks carry the same OpenAI logprobs.content[]
    shape as non-stream responses; concatenated over chunks they equal
    the non-stream entries (greedy, same prompt)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    tokenizer = _tiny_tokenizer()
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=tokenizer, model_id="toplp-stream")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    body = {"messages": [{"role": "user", "content": "hello there"}],
            "max_tokens": 4, "logprobs": True, "top_logprobs": 2}
    try:
        status, data = _post(port, "/v1/chat/completions", body)
        assert status == 200
        ref = json.loads(data)["choices"][0]["logprobs"]["content"]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/chat/completions",
                     body=json.dumps(dict(body, stream=True)),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        conn.close()
        events = [line[len("data: "):] for line in raw.split("\n")
                  if line.startswith("data: ")]
        assert events[-1] == "[DONE]"
        got = []
        for e in events[:-1]:
            ch = json.loads(e)["choices"][0]
            if "logprobs" in ch:
                got.extend(ch["logprobs"]["content"])
        assert len(got) == len(ref) == 4
        for g, r in zip(got, ref):
            assert g["token"] == r["token"]
            assert g["logprob"] == pytest.approx(r["logprob"], abs=1e-6)
            assert ([t["token_id"] for t in g["top_logprobs"]]
                    == [t["token_id"] for t in r["top_logprobs"]])
    finally:
        httpd.shutdown()
        srv.close()


def _tiny_tokenizer(vocab_size=100):
    """From-scratch whitespace-BPE tokenizer (no network), ids < the
    tiny llama's 128-token vocab; no chat template -> exercises the
    chat endpoint's transcript fallback."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    corpus = ["the quick brown fox jumps over the lazy dog",
              "user assistant system says hello world again and again",
              "a b c d e f g h i j k l m n o p q r s t u v w x y z : ."]
    tok.train_from_iterator(
        corpus, trainers.BpeTrainer(
            vocab_size=vocab_size, special_tokens=["<unk>", "<s>", "</s>"])
    )
    return transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
    )


def test_http_chat_completions(rng):
    """/v1/chat/completions: template-fallback prompt build, greedy
    chat.completion response equal to the manual generate of the same
    transcript, n=2 greedy -> identical choices, streamed chunks
    concatenate to the non-streaming content."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    tokenizer = _tiny_tokenizer()
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    srv = InferenceServer(b, tokenizer=tokenizer, model_id="chat")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        messages = [{"role": "system", "content": "the quick brown fox"},
                    {"role": "user", "content": "hello world"}]
        transcript = ("system: the quick brown fox\n"
                      "user: hello world\n" "assistant:")
        ids = tokenizer(transcript)["input_ids"]
        ref = _greedy_ref(spec, params, ids, 6)
        want = tokenizer.decode(ref[len(ids):])

        status, data = _post(port, "/v1/chat/completions",
                             {"messages": messages, "max_tokens": 6, "n": 2})
        assert status == 200
        body = json.loads(data)
        assert body["object"] == "chat.completion"
        assert len(body["choices"]) == 2
        for i, c in enumerate(body["choices"]):
            assert c["index"] == i
            assert c["message"] == {"role": "assistant", "content": want}
        assert body["usage"]["completion_tokens"] == 12

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/chat/completions",
                     body=json.dumps({"messages": messages, "max_tokens": 6,
                                      "stream": True}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        raw = resp.read().decode()
        conn.close()
        events = [json.loads(line[len("data: "):]) for line in raw.split("\n")
                  if line.startswith("data: ") and "[DONE]" not in line]
        assert all(e["object"] == "chat.completion.chunk" for e in events)
        streamed = "".join(e["choices"][0]["delta"]["content"] for e in events)
        assert streamed == want

        # n=2 streaming: every chunk carries its choice index; per-index
        # concatenations both equal the non-streaming content (greedy)
        status, data = _post(port, "/v1/chat/completions",
                             {"messages": messages, "stream": True, "n": 2,
                              "max_tokens": 6})
        assert status == 200
        events = [json.loads(line[len("data: "):]) for line in
                  data.decode().split("\n")
                  if line.startswith("data: ") and "[DONE]" not in line]
        by_idx = {0: "", 1: ""}
        for e in events:
            c = e["choices"][0]
            by_idx[c["index"]] += c["delta"]["content"]
        assert by_idx[0] == by_idx[1] != ""
    finally:
        httpd.shutdown()
        srv.close()


def test_http_chat_needs_tokenizer(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=1, max_len=32, prefill_bucket=8)
    srv = InferenceServer(b, tokenizer=None, model_id="nt")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        status, data = _post(port, "/v1/chat/completions",
                             {"messages": [{"role": "user", "content": "x"}]})
        assert status == 400
        assert "tokenizer" in json.loads(data)["error"]
        # n > 1 works tokenizer-less on plain completions
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": [3, 5, 7], "max_tokens": 4, "n": 2})
        assert status == 200
        body = json.loads(data)
        assert len(body["choices"]) == 2
        assert body["choices"][0]["token_ids"] == body["choices"][1]["token_ids"]
    finally:
        httpd.shutdown()
        srv.close()


def test_http_guided_decoding(rng):
    """guided_choice over HTTP: output is exactly one of the choices
    (byte-checked through the guide's own token table) ending in EOS;
    conflicting/malformed guided fields and grammars the vocabulary
    cannot spell are 400s."""
    from modegpt_tpu.models.guided import token_bytes_from_tokenizer

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    tokenizer = _tiny_tokenizer()
    eos = tokenizer.eos_token_id
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=eos, per_request_sampling=True)
    srv = InferenceServer(b, tokenizer=tokenizer, model_id="guided")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    tb = token_bytes_from_tokenizer(tokenizer)
    try:
        status, data = _post(port, "/v1/completions",
                             {"prompt": "says", "max_tokens": 16,
                              "guided_choice": ["hello", "dog"]})
        assert status == 200
        out = json.loads(data)["choices"][0]["token_ids"]
        assert out[-1] == eos
        assert b"".join(tb[t] for t in out[:-1]).decode() in ("hello", "dog")
        # same grammar as a regex; sampled — still constrained
        status, data = _post(port, "/v1/completions",
                             {"prompt": "quick", "max_tokens": 16,
                              "guided_regex": "(hello|dog)",
                              "temperature": 1.5, "seed": 7})
        assert status == 200
        out = json.loads(data)["choices"][0]["token_ids"]
        assert b"".join(tb[t] for t in out[:-1]).decode() in ("hello", "dog")
        # conflicting fields -> 400
        status, data = _post(port, "/v1/completions",
                             {"prompt": "x", "guided_choice": ["a"],
                              "guided_regex": "a"})
        assert status == 400 and "at most one" in json.loads(data)["error"]
        # malformed response_format -> 400
        status, _ = _post(port, "/v1/completions",
                          {"prompt": "x", "response_format": {"type": "yaml"}})
        assert status == 400
        # grammar needing bytes no token spells ('{' is not in the
        # tokenizer's corpus) -> 400, not a hang
        status, data = _post(port, "/v1/completions",
                             {"prompt": "x", "max_tokens": 8,
                              "response_format": {"type": "json_object"}})
        assert status == 400
        assert "no token" in json.loads(data)["error"]
    finally:
        httpd.shutdown()
        srv.close()


def test_http_logit_bias_and_min_tokens(rng):
    """OpenAI-style string-keyed logit_bias and min_tokens over HTTP."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=127)
    srv = InferenceServer(b, tokenizer=None, model_id="bias")
    httpd = make_http_server(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": [3, 5, 7], "max_tokens": 5,
                              "logit_bias": {"42": 100}})
        assert status == 200
        assert json.loads(data)["choices"][0]["token_ids"] == [42] * 5
        status, data = _post(port, "/v1/completions",
                             {"prompt_ids": [3, 5, 7], "max_tokens": 8,
                              "min_tokens": 3, "logit_bias": {"127": 100}})
        assert status == 200
        out = json.loads(data)["choices"][0]["token_ids"]
        assert len(out) == 4 and out[-1] == 127
        # malformed logit_bias -> 400
        status, _ = _post(port, "/v1/completions",
                          {"prompt_ids": [3], "max_tokens": 2,
                           "logit_bias": {"x": "y"}})
        assert status == 400
        # out-of-range id -> 400 (batcher validation surfaced)
        status, _ = _post(port, "/v1/completions",
                          {"prompt_ids": [3], "max_tokens": 2,
                           "logit_bias": {"500": 1.0}})
        assert status == 400
    finally:
        httpd.shutdown()
        srv.close()


def test_http_metrics_endpoint(served, rng):
    """GET /metrics: Prometheus text exposition whose counters move
    with traffic."""
    spec, _, server, port = served

    def scrape():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith("text/plain")
        text = r.read().decode()
        conn.close()
        return {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines() if not line.startswith("#")
        }

    before = scrape()
    prompt = rng.integers(1, spec.vocab_size, size=(4,)).tolist()
    status, _ = _post(port, "/v1/completions",
                      {"prompt_ids": prompt, "max_tokens": 5})
    assert status == 200
    after = scrape()
    assert (after["modegpt_requests_submitted_total"]
            - before["modegpt_requests_submitted_total"]) == 1
    assert (after["modegpt_requests_completed_total"]
            - before["modegpt_requests_completed_total"]) == 1
    assert (after["modegpt_generated_tokens_total"]
            - before["modegpt_generated_tokens_total"]) == 5
    assert (after["modegpt_prompt_tokens_total"]
            - before["modegpt_prompt_tokens_total"]) == 4
    assert after["modegpt_scheduler_steps_total"] > before.get(
        "modegpt_scheduler_steps_total", 0)
    assert after["modegpt_slots"] == 2
    assert after["modegpt_uptime_seconds"] > 0
