"""Serving load benchmark: Poisson arrivals through the continuous
batcher, reporting TTFT / TPOT percentiles and sustained throughput.

The microbench (bench_serving.py) times single dispatches; this drives
the REAL scheduler — admission, chunked prefill, decode, slot reuse —
under an open-loop arrival process, the way serving systems are
actually evaluated:

* **TTFT** (time to first token): request arrival -> first generated
  token committed. Dominated by queueing + prefill, and by whether
  decode dispatches stall admission rounds.
* **TPOT** (time per output token): mean inter-token time after the
  first. Dominated by decode dispatch cadence.
* **throughput**: generated tokens / wall time over the run.

A/B knobs map to the batcher's scheduling features, so this is the
harness that measures what `mixed_prefill_decode` (decode piggybacking
on batched prefill dispatches) and `decode_attn=ragged` (cache reads
scaling with occupancy) are worth end-to-end:

    MODEGPT_LOAD_MIXED=0|1       mixed prefill+decode rounds
    MODEGPT_LOAD_DECODE_ATTN=xla|ragged|auto   (default auto: the
        per-dispatch hybrid resolve_auto_decode_attn picks)
    MODEGPT_LOAD_MULTI=N         steps_per_dispatch when idle of prefill
    MODEGPT_LOAD_KV_INT8=1       int8 KV cache
    MODEGPT_LOAD_RATE=2.0        mean arrivals per second (Poisson)
    MODEGPT_LOAD_N=64            total requests
    MODEGPT_LOAD_SLOTS=16        slot-table size
    MODEGPT_LOAD_TINY=1          tiny model (CPU smoke)

Prints ONE JSON line. Seeded: the workload (arrival times, prompt
lengths, budgets, token ids) is identical across A/B runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _env_int(name, default):
    return int(os.environ.get(name, str(default)))


def main():
    import jax
    import jax.numpy as jnp

    from modegpt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.models.serving import ContinuousBatcher
    from modegpt_tpu.models.spec import ModelSpec

    tiny = bool(os.environ.get("MODEGPT_LOAD_TINY"))
    if tiny:  # CPU smoke shape
        D, H, HK, HD, DI, L, V = 128, 4, 2, 32, 256, 2, 512
    else:  # the 0.5B serving shape used across bench_results
        D, H, HK, HD, DI, L, V = 2048, 16, 8, 128, 5504, 8, 16384
    SLOTS = _env_int("MODEGPT_LOAD_SLOTS", 16)
    N_REQ = _env_int("MODEGPT_LOAD_N", 64)
    RATE = float(os.environ.get("MODEGPT_LOAD_RATE", "2.0"))
    MAXLEN = _env_int("MODEGPT_LOAD_MAXLEN", 1024 if not tiny else 96)
    BUCKET = _env_int("MODEGPT_LOAD_BUCKET", 128 if not tiny else 16)
    P_MIN = _env_int("MODEGPT_LOAD_PROMPT_MIN", 64 if not tiny else 8)
    P_MAX = _env_int("MODEGPT_LOAD_PROMPT_MAX", 512 if not tiny else 40)
    G_MIN = _env_int("MODEGPT_LOAD_NEW_MIN", 32 if not tiny else 4)
    G_MAX = _env_int("MODEGPT_LOAD_NEW_MAX", 128 if not tiny else 12)
    MIXED = os.environ.get("MODEGPT_LOAD_MIXED", "1") != "0"
    MULTI = _env_int("MODEGPT_LOAD_MULTI", 8)
    ATTN = os.environ.get("MODEGPT_LOAD_DECODE_ATTN", "auto")
    KV = "int8" if os.environ.get("MODEGPT_LOAD_KV_INT8") else "model"

    spec = ModelSpec(
        arch="llama", vocab_size=V, d_model=D, n_layers=L, n_heads=H,
        n_kv_heads=HK, head_dim=HD, d_int=DI, max_position_embeddings=2 * MAXLEN,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(H * HD,) * L, k_ranks=(HK * HD,) * L, v_ranks=(HK * HD,) * L,
        o_ranks=(H * HD,) * L, gate_ranks=(DI,) * L,
    )
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = init_params(spec, jax.random.key(0), dtype=dtype)
    pm = pad_to_uniform(spec, params)

    rng = np.random.default_rng(_env_int("MODEGPT_LOAD_SEED", 0))
    arrivals = np.cumsum(rng.exponential(1.0 / RATE, size=N_REQ))
    plens = rng.integers(P_MIN, P_MAX + 1, size=N_REQ)
    budgets = rng.integers(G_MIN, G_MAX + 1, size=N_REQ)
    prompts = [rng.integers(1, V, size=int(p)).astype(np.int32) for p in plens]

    batcher = ContinuousBatcher(
        pm, slots=SLOTS, max_len=MAXLEN, prefill_bucket=BUCKET,
        prefill_exec="batched", steps_per_dispatch=MULTI,
        mixed_prefill_decode=MIXED, decode_attn=ATTN, kv_dtype=KV,
    )

    # warm the compiled programs on throwaway requests so TTFT numbers
    # measure the scheduler, not XLA compilation. The overlap phase
    # matters: one request must be DECODING while another PREFILLS so
    # the mixed round (mixed=1) or the single-step decode beside
    # prefill rounds (mixed=0) compiles here, not inside the first
    # requests' TTFT window.
    log("warmup (compiling scheduler programs)...")
    wkey = jax.random.key(99)
    # w1's budget must OUTLAST w2's prefill (the first two steps may
    # burn 1 + steps_per_dispatch tokens in fused dispatches) so a
    # decode-active slot exists while w2's chunks are pending
    w1 = batcher.submit(prompts[0][: max(4, BUCKET // 2)],
                        max_new_tokens=2 * MULTI + 8)
    for _ in range(2):  # w1 finishes prefill and starts decoding
        wkey, _, _ = batcher.step(wkey)
    # w2 spans MULTIPLE chunks so some round has chunks still pending
    # while w1 decodes — that compiles the mixed program (mixed=1) or
    # the single-step decode beside prefill rounds (mixed=0), which a
    # one-chunk warmup never reaches (steady state goes straight to
    # the fused multi-step program)
    w2_len = min(2 * BUCKET + 3, MAXLEN - 8)
    w2 = batcher.submit(rng.integers(1, V, size=w2_len).astype(np.int32),
                        max_new_tokens=4)
    batcher.run()
    del w1, w2

    submitted = 0
    t_arrive = {}
    t_first = {}
    t_done = {}
    plen_of = {}
    budget_of = {}
    finished_out = {}
    key = jax.random.key(1)
    log(f"driving {N_REQ} requests at {RATE}/s "
        f"(mixed={MIXED}, attn={ATTN}, kv={KV}, multi={MULTI})...")
    t0 = time.perf_counter()
    while len(t_done) < N_REQ:
        now = time.perf_counter() - t0
        while submitted < N_REQ and arrivals[submitted] <= now:
            rid = batcher.submit(prompts[submitted],
                                 max_new_tokens=int(budgets[submitted]))
            t_arrive[rid] = arrivals[submitted]
            plen_of[rid] = int(plens[submitted])
            budget_of[rid] = int(budgets[submitted])
            submitted += 1
        idle = submitted < N_REQ and not any(
            r is not None for r in batcher.slot_req
        ) and not batcher.queue
        if idle:
            time.sleep(min(0.005, arrivals[submitted] - now))
            continue
        key, fin, _ = batcher.step(key)
        step_t = time.perf_counter() - t0
        # first-token timestamps: a resident request whose output grew
        # past its prompt gets stamped the step it happened
        for s in range(batcher.slots):
            rid = batcher.slot_req[s]
            if rid is not None and rid not in t_first and rid in t_arrive:
                if len(batcher.slot_out[s]) > plen_of[rid]:
                    t_first[rid] = step_t
        for rid, out in fin.items():
            if rid in t_arrive:
                t_done[rid] = step_t
                t_first.setdefault(rid, step_t)
                finished_out[rid] = out
    wall = time.perf_counter() - t0

    ttft = np.asarray([t_first[r] - t_arrive[r] for r in t_done]) * 1e3
    tpot = np.asarray([
        (t_done[r] - t_first[r]) / max(len(finished_out[r]) - plen_of[r] - 1, 1)
        for r in t_done
    ]) * 1e3
    gen_tokens = sum(len(finished_out[r]) - plen_of[r] for r in t_done)
    print(json.dumps({
        "ttft_p50_ms": round(float(np.percentile(ttft, 50)), 1),
        "ttft_p99_ms": round(float(np.percentile(ttft, 99)), 1),
        "tpot_p50_ms": round(float(np.percentile(tpot, 50)), 2),
        "tpot_p99_ms": round(float(np.percentile(tpot, 99)), 2),
        "gen_tok_s": round(gen_tokens / wall, 1),
        "req_s": round(len(t_done) / wall, 2),
        "wall_s": round(wall, 1),
        "n_requests": len(t_done),
        "slots": SLOTS, "rate_rps": RATE, "max_len": MAXLEN,
        "bucket": BUCKET, "mixed": MIXED, "decode_attn": ATTN,
        "kv": KV, "steps_per_dispatch": MULTI,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
