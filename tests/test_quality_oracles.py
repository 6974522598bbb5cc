"""Discriminative quality oracles for the three solvers (VERDICT r3
missing-1): planted-structure problems with COMPUTABLE optima, so a
solver that is wrong-but-finite (e.g. silently selecting the worst
columns) FAILS these gates instead of slipping through random-model
PPL curves.

  * Type-III VO truncation vs the Eckart-Young optimum in the whitened
    metric (the two-stage SVD is exactly the rank-r truncation of
    sqrt(C) W_v^T W_o^T per head — reference: compress_vo.py:193-206).
  * Type-I Nystrom column choice vs the EXHAUSTIVE best subset at small
    d_int, under the true objective tr(W_d Schur(S) W_d^T); and the
    down re-solve vs the closed-form optimum for its own subset
    (reference: compress_mlp.py:45-57).
  * Type-II RoPE pair selection recovers planted high-energy pairs
    exactly (reference: compress_qk.py:346-367).
  * End-to-end: logits distortion increases monotonically with the
    compression ratio, and an intentionally-sabotaged solver (worst-k
    columns / tail singular directions) produces MUCH larger distortion
    than the honest solver at the same ratio — the discriminative gate
    the random-model curves could not provide.

All oracles run in f64 on CPU (tests enable x64), so "equals the
optimum" is asserted at 1e-6-level tolerances, not vibes.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modegpt_tpu.ops.mlp import NYSTROM_SOLVE_RIDGE, nystrom_mlp, nystrom_scores
from modegpt_tpu.ops.psd import sqrt_and_inv_sqrt_psd
from modegpt_tpu.ops.qk import qk_rope_pair_scores
from modegpt_tpu.ops.vo import compress_vo_layer, vo_full_factors


def _psd(rng, n, scale=1.0):
    A = rng.standard_normal((n, 2 * n))
    return (A @ A.T) * (scale / n)


# ---------------------------------------------------------------------------
# Type-III VO: Eckart-Young optimality in the whitened metric
# ---------------------------------------------------------------------------


def _vo_setup(rng, d=24, hd=6, n_heads=2, n_kv=2, decay=0.45):
    """W_v with geometrically decaying per-head spectrum so rank-r tails
    are well separated (a flat spectrum would make every subspace about
    as good and the sabotage gap vanish)."""
    C = _psd(rng, d)
    W_v = np.zeros((n_kv * hd, d))
    for h in range(n_kv):
        U, _ = np.linalg.qr(rng.standard_normal((d, hd)))
        V, _ = np.linalg.qr(rng.standard_normal((hd, hd)))
        s = decay ** np.arange(hd)
        W_v[h * hd : (h + 1) * hd] = ((U * s) @ V.T).T  # [hd, d]
    W_o = rng.standard_normal((d, n_heads * hd)) / np.sqrt(d)
    return C, W_v, W_o


def test_vo_mha_matches_eckart_young(rng):
    d, hd, H = 24, 6, 2
    C, W_v, W_o = _vo_setup(rng, d=d, hd=hd, n_heads=H, n_kv=H)
    ridge = 1e-9
    sqrt_C = np.asarray(sqrt_and_inv_sqrt_psd(jnp.asarray(C), ridge)[0])

    for r in (2, 4):
        f = compress_vo_layer(
            jnp.asarray(C), jnp.asarray(W_v), jnp.asarray(W_o), r, H, H,
            ridge, whiten="eigh",
        )
        v, o = np.asarray(f.v), np.asarray(f.o)
        for h in range(H):
            P = W_o[:, h * hd : (h + 1) * hd] @ W_v[h * hd : (h + 1) * hd]
            P_c = o[:, h * r : (h + 1) * r] @ v[h * r : (h + 1) * r]
            err = np.linalg.norm(sqrt_C @ (P - P_c).T)
            sig = np.linalg.svd(sqrt_C @ P.T, compute_uv=False)
            opt = np.sqrt((sig[r:] ** 2).sum())
            # the two-stage whitened SVD IS the Eckart-Young optimum
            np.testing.assert_allclose(err, opt, rtol=1e-6, atol=1e-9)

            # discriminative: keeping the TAIL singular directions (a
            # plausible off-by-one/ordering bug) must be far worse
            sig_head = np.sqrt((sig[:-r] ** 2).sum()) if r < len(sig) else 0.0
            assert sig_head > 3 * max(opt, 1e-12), (r, h, sig_head, opt)


def test_vo_mha_tail_sabotage_fails(rng):
    """An explicitly sabotaged truncation (tail columns of the full
    factor forms — wrong but shape-correct and finite) must blow the
    whitened error up vs the solver's optimum."""
    d, hd, H, r = 24, 6, 2, 2
    C, W_v, W_o = _vo_setup(rng, d=d, hd=hd, n_heads=H, n_kv=H)
    ridge = 1e-9
    sqrt_C = np.asarray(sqrt_and_inv_sqrt_psd(jnp.asarray(C), ridge)[0])

    v_full, o_full = vo_full_factors(
        jnp.asarray(C), jnp.asarray(W_v), jnp.asarray(W_o), H, H, ridge,
        whiten="eigh",
    )
    v_full, o_full = np.asarray(v_full), np.asarray(o_full)
    f = compress_vo_layer(
        jnp.asarray(C), jnp.asarray(W_v), jnp.asarray(W_o), r, H, H,
        ridge, whiten="eigh",
    )
    v, o = np.asarray(f.v), np.asarray(f.o)
    for h in range(H):
        P = W_o[:, h * hd : (h + 1) * hd] @ W_v[h * hd : (h + 1) * hd]
        P_good = o[:, h * r : (h + 1) * r] @ v[h * r : (h + 1) * r]
        P_bad = (o_full[h, -r:, :].T @ v_full[h, :, -r:].T).T
        err_good = np.linalg.norm(sqrt_C @ (P - P_good).T)
        err_bad = np.linalg.norm(sqrt_C @ (P - P_bad).T)
        assert err_bad > 3 * max(err_good, 1e-12), (h, err_bad, err_good)


def test_vo_gqa_projects_onto_optimal_shared_basis(rng):
    """GQA: the shared V basis per kv head is the top-r left singular
    subspace of sqrt(C) W_v^T, and every O head is the EXACT projection
    of its dense map onto that subspace (reference GQA path:
    compress_vo.py:136-151)."""
    d, hd, H, Hk = 24, 6, 4, 2
    C, W_v, W_o = _vo_setup(rng, d=d, hd=hd, n_heads=H, n_kv=Hk)
    ridge = 1e-9
    sqrt_C = np.asarray(sqrt_and_inv_sqrt_psd(jnp.asarray(C), ridge)[0])
    group = H // Hk

    for r in (2, 4):
        f = compress_vo_layer(
            jnp.asarray(C), jnp.asarray(W_v), jnp.asarray(W_o), r, H, Hk,
            ridge, whiten="eigh",
        )
        v, o = np.asarray(f.v), np.asarray(f.o)
        for kv in range(Hk):
            M = sqrt_C @ W_v[kv * hd : (kv + 1) * hd].T  # [d, hd]
            U, S, Vh = np.linalg.svd(M, full_matrices=False)
            U_r = U[:, :r]
            for g in range(group):
                h = kv * group + g
                P = W_o[:, h * hd : (h + 1) * hd] @ W_v[kv * hd : (kv + 1) * hd]
                P_c = o[:, h * r : (h + 1) * r] @ v[kv * r : (kv + 1) * r]
                # oracle: orthogonal projection onto the shared basis
                W = sqrt_C @ P.T
                P_proj = U_r @ (U_r.T @ W)
                np.testing.assert_allclose(
                    sqrt_C @ P_c.T, P_proj, rtol=1e-6, atol=1e-9
                )


# ---------------------------------------------------------------------------
# Type-I Nystrom: exhaustive subset oracle at small d_int
# ---------------------------------------------------------------------------


def _nystrom_objective(C, W_d_hf, S):
    """True expected approximation error of replacing h W_d^T by
    h_S W'(S) at the optimal W'(S): tr(W_d Schur(S) W_d^T) with the
    solver's own tiny solve ridge."""
    S = list(S)
    C_SS = C[np.ix_(S, S)] + NYSTROM_SOLVE_RIDGE * np.eye(len(S))
    G = C[np.ix_(S, range(C.shape[0]))]
    Schur = C - G.T @ np.linalg.solve(C_SS, G)
    return float(np.trace(W_d_hf @ Schur @ W_d_hf.T))


def _planted_mlp(rng, d_int=12, d_model=8, n_hot=4, hot=6.0):
    """Intermediate Gram with ``n_hot`` planted high-leverage columns:
    strong independent energy on a known subset, weak correlated noise
    elsewhere. The ridge-leverage rule must recover the subset."""
    hot_idx = np.sort(rng.choice(d_int, size=n_hot, replace=False))
    X = rng.standard_normal((256, d_int)) * 0.1
    X[:, hot_idx] += rng.standard_normal((256, n_hot)) * hot
    C = X.T @ X / 256
    W_u = rng.standard_normal((d_int, d_model))
    W_g = rng.standard_normal((d_int, d_model))
    W_d = rng.standard_normal((d_model, d_int)) / np.sqrt(d_int)
    return C, W_u, W_g, W_d, hot_idx


def test_nystrom_matches_exhaustive_best_subset(rng):
    d_int, d_model, r = 12, 8, 4
    C, W_u, W_g, W_d, hot_idx = _planted_mlp(rng, d_int, d_model, n_hot=r)

    f = nystrom_mlp(
        jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g),
        jnp.asarray(W_d), keep_ratio=r / d_int, ridge=1e-4,
    )
    idx = np.asarray(f.idx)
    W_d_hf = W_d  # already [d_model, d_int] HF layout

    all_subsets = list(itertools.combinations(range(d_int), r))
    objs = np.array([_nystrom_objective(C, W_d_hf, S) for S in all_subsets])
    best = objs.min()
    worst = objs.max()
    got = _nystrom_objective(C, W_d_hf, idx)

    # on planted-leverage structure the ridge-leverage selection must be
    # (near-)exhaustively optimal — and the planted columns are the
    # optimum, so check both ways
    np.testing.assert_array_equal(idx, hot_idx)
    assert got <= 1.01 * best, (got, best)
    # the problem must actually discriminate (otherwise this test is
    # vacuous): the worst subset is far worse than the best
    assert worst > 10 * best, (worst, best)


def test_nystrom_down_resolve_is_optimal_for_its_subset(rng):
    """The down re-solve (C_SS + eps I)^{-1} C_S W_d^T is the exact
    minimiser of the expected error FOR ITS SUBSET — compare against
    the closed form computed independently in f64."""
    d_int, d_model, r = 12, 8, 4
    C, W_u, W_g, W_d, _ = _planted_mlp(rng, d_int, d_model, n_hot=r)
    f = nystrom_mlp(
        jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g),
        jnp.asarray(W_d), keep_ratio=r / d_int, ridge=1e-4,
    )
    S = np.asarray(f.idx)
    C_SS = C[np.ix_(S, S)] + NYSTROM_SOLVE_RIDGE * np.eye(r)
    W_opt = np.linalg.solve(C_SS, C[np.ix_(S, range(d_int))] @ W_d.T)
    np.testing.assert_allclose(np.asarray(f.down), W_opt.T, rtol=1e-8, atol=1e-10)
    # and the up/gate factors are exact row slices
    np.testing.assert_allclose(np.asarray(f.up), W_u[S], rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(f.gate), W_g[S], rtol=0, atol=0)


def test_nystrom_worst_k_sabotage_fails(rng):
    """Selecting the HIGHEST inverse-leverage columns (the exact
    opposite of the reference rule, compress_mlp.py:45-47) must score
    far worse under the true objective — the gate a silent selection
    bug cannot pass."""
    d_int, d_model, r = 12, 8, 4
    C, W_u, W_g, W_d, _ = _planted_mlp(rng, d_int, d_model, n_hot=r)
    scores = np.asarray(nystrom_scores(jnp.asarray(C), 1e-4))
    best_idx = np.sort(np.argsort(scores)[:r])
    worst_idx = np.sort(np.argsort(scores)[-r:])
    j_best = _nystrom_objective(C, W_d, best_idx)
    j_worst = _nystrom_objective(C, W_d, worst_idx)
    assert j_worst > 5 * j_best, (j_worst, j_best)


# ---------------------------------------------------------------------------
# Type-II QK: planted frequency pairs
# ---------------------------------------------------------------------------


def test_qk_rope_selection_recovers_planted_pairs(rng):
    """Per-head q/k Grams with energy planted on known RoPE frequency
    pairs: the pair scores must rank exactly those pairs on top
    (reference scoring: compress_qk.py:346-364)."""
    H, Hk, hd = 4, 2, 8
    half = hd // 2
    group = H // Hk
    planted = {0: [1, 3], 1: [0, 2]}  # per kv head

    cov_q = np.zeros((H, hd, hd))
    cov_k = np.zeros((Hk, hd, hd))
    for kv in range(Hk):
        for j in range(half):
            e = 25.0 if j in planted[kv] else 0.1 + 0.01 * j
            cov_k[kv, j, j] = e
            cov_k[kv, j + half, j + half] = e
            for g in range(group):
                cov_q[kv * group + g, j, j] = e
                cov_q[kv * group + g, j + half, j + half] = e

    scores = np.asarray(
        qk_rope_pair_scores(jnp.asarray(cov_q), jnp.asarray(cov_k), 1e-2, Hk)
    )
    for kv in range(Hk):
        top = set(np.argsort(scores[kv])[-2:].tolist())
        assert top == set(planted[kv]), (kv, top, planted[kv])


# ---------------------------------------------------------------------------
# End-to-end: monotone ratio -> distortion, and the sabotage gate
# ---------------------------------------------------------------------------


def _oracle_model(seed=0):
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec

    d_model, d_int, n_layers = 64, 144, 3
    spec = ModelSpec(
        arch="llama", vocab_size=128, d_model=d_model, n_layers=n_layers,
        n_heads=4, n_kv_heads=2, head_dim=16, d_int=d_int,
        max_position_embeddings=128, act="silu", norm="rmsnorm",
        norm_eps=1e-6, rope_theta=10000.0, attention_bias=False,
        mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64,) * n_layers, k_ranks=(32,) * n_layers,
        v_ranks=(32,) * n_layers, o_ranks=(64,) * n_layers,
        gate_ranks=(d_int,) * n_layers,
    )
    params = init_params(spec, jax.random.key(seed))

    # plant intermediate-channel structure: a known subset of channels
    # carries most of the MLP signal in every layer, so selection
    # quality is OBSERVABLE in the output (random-weight models have
    # near-uniform leverage and cannot distinguish good from bad
    # selection — the r3 verdict's core complaint)
    rng = np.random.default_rng(7)
    hot = {}
    for l in range(n_layers):
        lp = params["layers"][l]
        hot_idx = np.sort(rng.choice(d_int, size=d_int // 4, replace=False))
        up = np.array(lp["up"]["kernel"])  # [d_model, d_int] (owned copy)
        gate = np.array(lp["gate"]["kernel"])
        up[:, hot_idx] *= 4.0
        gate[:, hot_idx] *= 2.0
        lp["up"]["kernel"] = jnp.asarray(up)
        lp["gate"]["kernel"] = jnp.asarray(gate)
        hot[l] = hot_idx
    return spec, params, hot


def _distortion(spec, params, cspec, cparams, tokens):
    from modegpt_tpu.models.forward import forward

    dense, _ = forward(spec, params, tokens)
    comp, _ = forward(cspec, cparams, tokens)
    dense, comp = np.asarray(dense, np.float64), np.asarray(comp, np.float64)
    return float(np.linalg.norm(comp - dense) / np.linalg.norm(dense))


def _compress_at(spec, params, calib, config, keep, mlp_override=None,
                 order="mlp,qk,vo"):
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.compress.surgery import apply_factors

    layers = list(range(spec.n_layers))
    f = solve_chunk_batched(spec, params, layers, keep, calib, config, order)
    mlp = mlp_override if mlp_override is not None else f.get("mlp", {})
    return apply_factors(spec, params, mlp, f.get("qk", {}), f.get("vo", {}))


@pytest.fixture(scope="module")
def _e2e_setup():
    from modegpt_tpu.calib.data import load_calibration_batches
    from modegpt_tpu.calib.engine import calibrate
    from modegpt_tpu.config import CompressionConfig

    spec, params, hot = _oracle_model()
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    calib = calibrate(
        spec, params, batches, list(range(spec.n_layers)), accumulate="device"
    )
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5,
        solver_precision="f32_device",
    )
    tokens = np.asarray(batches[0][:, :24], dtype=np.int32)
    return spec, params, hot, calib, config, tokens


def test_distortion_monotone_in_ratio(_e2e_setup):
    spec, params, _, calib, config, tokens = _e2e_setup
    dist = []
    for ratio in (0.1, 0.3, 0.5, 0.7):
        keep = np.full(spec.n_layers, 1.0 - ratio)
        cspec, cparams = _compress_at(spec, params, calib, config, keep)
        dist.append(_distortion(spec, params, cspec, cparams, tokens))
    for a, b in zip(dist, dist[1:]):
        assert b > a - 1e-9, dist
    assert dist[-1] > 2 * dist[0], dist  # the curve actually moves


def test_sabotaged_mlp_selection_fails_gate(_e2e_setup):
    """Worst-k column selection wired through the REAL pipeline factors
    must produce far larger output distortion than the honest solver at
    the same ratio. This is the end-to-end discriminative gate: before
    it, a solver that picked the worst columns still passed every
    quality check in the repo (VERDICT r3, missing-1)."""
    from modegpt_tpu.compress.batched import _hf_w
    from modegpt_tpu.compress.surgery import compress_ranks_for_layer
    from modegpt_tpu.ops.mlp import _nystrom_factor

    spec, params, _, calib, config, tokens = _e2e_setup
    ratio = 0.5
    keep = np.full(spec.n_layers, 1.0 - ratio)

    # MLP-only compression isolates the selection signal: with qk/vo
    # compressed too, their (identical) distortion floor dilutes the gap
    cspec_h, cparams_h = _compress_at(
        spec, params, calib, config, keep, order="mlp"
    )
    d_honest = _distortion(spec, params, cspec_h, cparams_h, tokens)

    mlp_bad = {}
    for l in range(spec.n_layers):
        r = compress_ranks_for_layer(spec, float(keep[l]), "mlp")
        C = np.asarray(calib.cov_mlp[l], np.float64)
        scores = np.asarray(nystrom_scores(jnp.asarray(C), config.nystrom_ridge))
        idx_bad = np.sort(np.argsort(scores)[-r:])  # HIGHEST inv-leverage
        lp = params["layers"][l]
        up, gate, down = _nystrom_factor(
            jnp.asarray(C), jnp.asarray(_hf_w(lp, "up"), jnp.float64),
            jnp.asarray(_hf_w(lp, "gate"), jnp.float64),
            jnp.asarray(_hf_w(lp, "down"), jnp.float64),
            jnp.asarray(idx_bad), r,
        )
        mlp_bad[l] = {
            "up": np.asarray(up, np.float32),
            "gate": np.asarray(gate, np.float32),
            "down": np.asarray(down, np.float32),
            "idx": idx_bad.astype(np.int32),
        }
    cspec_b, cparams_b = _compress_at(
        spec, params, calib, config, keep, mlp_override=mlp_bad, order="mlp"
    )
    d_bad = _distortion(spec, params, cspec_b, cparams_b, tokens)
    assert d_bad > 2 * d_honest, (d_bad, d_honest)
