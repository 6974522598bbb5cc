"""Solver tests: closed-form properties + golden parity vs fresh torch math.

The torch implementations below are written directly from the MoDeGPT
closed forms (the same formulas the reference implements) so factor-level
parity is verified without importing or copying reference code.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from modegpt_tpu.ops.mlp import nystrom_mlp, nystrom_mlp_padded
from modegpt_tpu.ops.qk import (
    compress_qk_layer_opt,
    compress_qk_layer_rope,
    qk_rope_pair_scores,
)
from modegpt_tpu.ops.vo import compress_vo_layer

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- Type-I MLP


def _torch_nystrom(C, W_u, W_g, W_d, rank, ridge):
    C = torch.tensor(C, dtype=torch.float64)
    lam = ridge * torch.eye(C.shape[0], dtype=torch.float64)
    L = torch.linalg.cholesky(C + lam)
    inv_diag = torch.diag(torch.cholesky_inverse(L))
    topk = torch.topk(inv_diag, k=rank, largest=False).indices
    topk, _ = torch.sort(topk)
    Wu = torch.tensor(W_u, dtype=torch.float64)
    Wg = torch.tensor(W_g, dtype=torch.float64)
    Wd = torch.tensor(W_d, dtype=torch.float64)
    up = Wu[topk, :]
    gate = Wg[topk, :]
    C_red = C[topk][:, topk]
    cross = C[topk, :] @ Wd.T
    L_red = torch.linalg.cholesky(C_red + 1e-6 * torch.eye(rank, dtype=torch.float64))
    down_T = torch.cholesky_solve(cross, L_red)
    return up.numpy(), gate.numpy(), down_T.T.numpy(), topk.numpy()


def test_nystrom_full_rank_is_exact(make_psd, rng):
    """At keep=1.0 the Nyström re-solve reproduces W_d exactly (up to ridge)."""
    d_int, d = 24, 16
    C = make_psd(d_int, scale=4.0)
    W_u = rng.standard_normal((d_int, d))
    W_g = rng.standard_normal((d_int, d))
    W_d = rng.standard_normal((d, d_int))
    f = nystrom_mlp(jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g), jnp.asarray(W_d), 1.0, 1e-8)
    assert f.up.shape == (d_int, d)
    np.testing.assert_allclose(np.asarray(f.down), W_d, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f.up), W_u)
    np.testing.assert_allclose(np.asarray(f.gate), W_g)


def test_nystrom_torch_parity(make_psd, rng):
    d_int, d, keep, ridge = 32, 12, 0.5, 1e-2
    C = make_psd(d_int, scale=2.0)
    W_u = rng.standard_normal((d_int, d))
    W_g = rng.standard_normal((d_int, d))
    W_d = rng.standard_normal((d, d_int))
    rank = int(d_int * keep)
    f = nystrom_mlp(jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g), jnp.asarray(W_d), keep, ridge)
    up_t, gate_t, down_t, idx_t = _torch_nystrom(C, W_u, W_g, W_d, rank, ridge)
    np.testing.assert_array_equal(np.asarray(f.idx), idx_t)
    np.testing.assert_allclose(np.asarray(f.up), up_t, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f.gate), gate_t, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f.down), down_t, rtol=1e-7, atol=1e-10)


def test_nystrom_padded_matches_exact(make_psd, rng):
    """Identity block-padding gives the exact unpadded solve after slicing."""
    d_int, d = 32, 12
    C = make_psd(d_int, scale=2.0)
    W_u = rng.standard_normal((d_int, d))
    W_g = rng.standard_normal((d_int, d))
    W_d = rng.standard_normal((d, d_int))
    rank, pad = 16, 24
    exact = nystrom_mlp(jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g), jnp.asarray(W_d), 0.5, 1e-2)
    up_p, gate_p, down_p, idx_p, valid = nystrom_mlp_padded(
        jnp.asarray(C), jnp.asarray(W_u), jnp.asarray(W_g), jnp.asarray(W_d),
        jnp.asarray(rank), pad, jnp.asarray(1e-2),
    )
    np.testing.assert_array_equal(np.asarray(idx_p)[:rank], np.asarray(exact.idx))
    np.testing.assert_allclose(np.asarray(up_p)[:rank], np.asarray(exact.up), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(down_p)[:, :rank], np.asarray(exact.down), rtol=1e-7, atol=1e-10)
    assert np.all(np.asarray(up_p)[rank:] == 0)
    assert np.all(np.asarray(down_p)[:, rank:] == 0)


# ---------------------------------------------------------------- Type-II QK


def _torch_sqrt_m(C, ridge=1e-4):
    w, V = torch.linalg.eigh(torch.tensor(C, dtype=torch.float64))
    w = w + ridge
    return V @ torch.diag(torch.sqrt(w.clamp(min=0))) @ V.T


def _torch_qk_rope_grouped(cov_q, cov_k, Wq, Wk, rank, ridge_qk):
    """Fresh torch version of the grouped RoPE-pair selection."""
    n_heads, hd = cov_q.shape[0], cov_q.shape[-1]
    n_kv = cov_k.shape[0]
    group = n_heads // n_kv
    half = hd // 2
    Wq_h = torch.tensor(Wq, dtype=torch.float64).view(n_heads, hd, -1)
    Wk_h = torch.tensor(Wk, dtype=torch.float64).view(n_kv, hd, -1)
    q_out, k_out, masks = [], [], []
    for kv in range(n_kv):
        sq_k = _torch_sqrt_m(cov_k[kv], ridge_qk)
        score = torch.zeros(half, dtype=torch.float64)
        for g in range(group):
            sq_q = _torch_sqrt_m(cov_q[kv * group + g], 1e-4)
            nq1 = torch.norm(sq_q[..., :half], dim=0)
            nq2 = torch.norm(sq_q[..., half:], dim=0)
            nk1 = torch.norm(sq_k[..., :half], dim=0)
            nk2 = torch.norm(sq_k[..., half:], dim=0)
            score += nq1**2 * nk1**2 + nq2**2 * nk2**2
        score = torch.sqrt(score)
        topk = torch.topk(score, k=rank // 2).indices
        mask = torch.cat((topk, topk + half))
        masks.append(mask)
        k_out.append(Wk_h[kv][mask, :])
        for g in range(group):
            q_out.append(Wq_h[kv * group + g][mask, :])
    return (
        torch.cat(q_out, 0).numpy(),
        torch.cat(k_out, 0).numpy(),
        torch.stack(masks).numpy(),
    )


@pytest.mark.parametrize("n_heads,n_kv", [(4, 4), (4, 2), (8, 2)])
def test_qk_rope_torch_parity(make_psd, rng, n_heads, n_kv):
    hd, d, rank = 16, 20, 8
    cov_q = np.stack([make_psd(hd) for _ in range(n_heads)])
    cov_k = np.stack([make_psd(hd) for _ in range(n_kv)])
    Wq = rng.standard_normal((n_heads * hd, d))
    Wk = rng.standard_normal((n_kv * hd, d))
    f = compress_qk_layer_rope(
        jnp.asarray(cov_q), jnp.asarray(cov_k), jnp.asarray(Wq), jnp.asarray(Wk), rank, 1e-2
    )
    q_t, k_t, m_t = _torch_qk_rope_grouped(cov_q, cov_k, Wq, Wk, rank, 1e-2)
    np.testing.assert_array_equal(np.asarray(f.rotary_mask), m_t)
    np.testing.assert_allclose(np.asarray(f.q), q_t, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f.k), k_t, rtol=1e-9)


def test_qk_rope_full_rank_is_permutation(make_psd, rng):
    """At rank = head_dim the mask is a permutation of all dims."""
    hd, d, n = 8, 10, 2
    cov_q = np.stack([make_psd(hd) for _ in range(n)])
    cov_k = np.stack([make_psd(hd) for _ in range(n)])
    Wq = rng.standard_normal((n * hd, d))
    Wk = rng.standard_normal((n * hd, d))
    f = compress_qk_layer_rope(
        jnp.asarray(cov_q), jnp.asarray(cov_k), jnp.asarray(Wq), jnp.asarray(Wk), hd, 1e-4
    )
    for h in range(n):
        assert sorted(np.asarray(f.rotary_mask)[h].tolist()) == list(range(hd))


def test_qk_opt_selects_topk_rows(make_psd, rng):
    hd, d, n, rank = 12, 10, 3, 6
    cov_q = np.stack([make_psd(hd) for _ in range(n)])
    cov_k = np.stack([make_psd(hd) for _ in range(n)])
    Wq = rng.standard_normal((n * hd, d))
    Wk = rng.standard_normal((n * hd, d))
    bq = rng.standard_normal(n * hd)
    bk = rng.standard_normal(n * hd)
    f = compress_qk_layer_opt(
        jnp.asarray(cov_q), jnp.asarray(cov_k), jnp.asarray(Wq), jnp.asarray(Wk),
        jnp.asarray(bq), jnp.asarray(bk), rank, 1e-6,
    )
    assert f.q.shape == (n * rank, d)
    assert f.q_bias.shape == (n * rank,)
    # Each selected Q row must be an actual row of the original head block,
    # and the bias entry must be its matching coordinate.
    for h in range(n):
        block = Wq[h * hd : (h + 1) * hd]
        for r in range(rank):
            row = np.asarray(f.q)[h * rank + r]
            match = np.where((np.abs(block - row) < 1e-12).all(axis=1))[0]
            assert len(match) == 1
            assert abs(np.asarray(f.q_bias)[h * rank + r] - bq[h * hd + match[0]]) < 1e-12


def test_qk_group1_reduces_to_mha(make_psd, rng):
    """GQA scoring with group=1 must equal the MHA scoring path."""
    hd, n = 16, 3
    cov_q = np.stack([make_psd(hd) for _ in range(n)])
    cov_k = np.stack([make_psd(hd) for _ in range(n)])
    s = np.asarray(qk_rope_pair_scores(jnp.asarray(cov_q), jnp.asarray(cov_k), 1e-4, n))
    # Direct per-head formula
    for h in range(n):
        sq = np.asarray(_torch_sqrt_m(cov_q[h], 1e-4))
        sk = np.asarray(_torch_sqrt_m(cov_k[h], 1e-4))
        half = hd // 2
        eq = (sq**2).sum(0)
        ek = (sk**2).sum(0)
        want = np.sqrt(eq[:half] * ek[:half] + eq[half:] * ek[half:])
        np.testing.assert_allclose(s[h], want, rtol=1e-8)


# --------------------------------------------------------------- Type-III VO


def test_vo_mha_torch_parity(make_psd, rng):
    d, hd, n, rank = 24, 8, 3, 4
    cov_x = make_psd(d, scale=2.0)
    Wv = rng.standard_normal((n * hd, d))
    Wo = rng.standard_normal((d, n * hd))
    ridge = 1e-4
    f = compress_vo_layer(
        jnp.asarray(cov_x), jnp.asarray(Wv), jnp.asarray(Wo), rank, n, n, ridge
    )
    # Fresh torch: two-stage whitened SVD per head.
    sqrt_C = _torch_sqrt_m(cov_x, ridge)
    inv_sqrt_C = torch.linalg.inv(sqrt_C)
    Wv_t = torch.tensor(Wv, dtype=torch.float64)
    Wo_t = torch.tensor(Wo, dtype=torch.float64)
    v_blocks, o_blocks = [], []
    for h in range(n):
        V_head = Wv_t[h * hd : (h + 1) * hd, :]
        O_head = Wo_t[:, h * hd : (h + 1) * hd]
        U, S, Vh = torch.linalg.svd(sqrt_C @ V_head.T, full_matrices=False)
        A = torch.diag(S) @ Vh @ O_head.T
        Up, Sp, Vph = torch.linalg.svd(A, full_matrices=True)
        v_new = (inv_sqrt_C @ U @ Up)[:, :rank]
        o_new = torch.diag(Sp[:rank]) @ Vph[:rank, :]
        v_blocks.append(v_new.T)
        o_blocks.append(o_new.T)
    v_ref = torch.cat(v_blocks, 0).numpy()
    o_ref = torch.cat(o_blocks, 1).numpy()
    # SVD columns have sign ambiguity; compare |values| and the functional
    # product V @ O which is sign-invariant.
    got_vo = np.einsum(
        "dhr,hre->hde", np.asarray(f.o).reshape(d, n, rank), np.asarray(f.v).reshape(n, rank, d)
    )
    ref_vo = np.einsum("dhr,hre->hde", o_ref.reshape(d, n, rank), v_ref.reshape(n, rank, d))
    np.testing.assert_allclose(got_vo, ref_vo, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.abs(np.asarray(f.v)), np.abs(v_ref), rtol=1e-5, atol=1e-7)


def test_vo_full_rank_reconstructs_product(make_psd, rng):
    """At full rank, the compressed V/O product equals W_o @ W_v (whitened
    SVD truncation at full rank is exact)."""
    d, hd, n = 16, 8, 2
    cov_x = make_psd(d, scale=3.0)
    Wv = rng.standard_normal((n * hd, d))
    Wo = rng.standard_normal((d, n * hd))
    f = compress_vo_layer(jnp.asarray(cov_x), jnp.asarray(Wv), jnp.asarray(Wo), hd, n, n, 1e-9)
    got = np.asarray(f.o) @ np.asarray(f.v)
    want = Wo @ Wv
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_vo_gqa_shared_basis(make_psd, rng):
    d, hd, n_heads, n_kv, rank = 20, 8, 4, 2, 4
    cov_x = make_psd(d, scale=2.0)
    Wv = rng.standard_normal((n_kv * hd, d))
    Wo = rng.standard_normal((d, n_heads * hd))
    ridge = 1e-5
    f = compress_vo_layer(jnp.asarray(cov_x), jnp.asarray(Wv), jnp.asarray(Wo), rank, n_heads, n_kv, ridge)
    assert f.v.shape == (n_kv * rank, d)
    assert f.o.shape == (d, n_heads * rank)
    # Fresh torch GQA path.
    sqrt_C = _torch_sqrt_m(cov_x, ridge)
    inv_sqrt_C = torch.linalg.inv(sqrt_C)
    Wv_t = torch.tensor(Wv, dtype=torch.float64)
    Wo_t = torch.tensor(Wo, dtype=torch.float64)
    group = n_heads // n_kv
    v_blocks, o_blocks = [], []
    for kv in range(n_kv):
        V_head = Wv_t[kv * hd : (kv + 1) * hd, :]
        U, S, Vh = torch.linalg.svd(sqrt_C @ V_head.T, full_matrices=False)
        v_blocks.append((inv_sqrt_C @ U[:, :rank]).T)
        for g in range(group):
            h = kv * group + g
            O_head = Wo_t[:, h * hd : (h + 1) * hd]
            o_new = torch.diag(S[:rank]) @ Vh[:rank, :] @ O_head.T
            o_blocks.append(o_new.T)
    v_ref = torch.cat(v_blocks, 0).numpy()
    o_ref = torch.cat(o_blocks, 1).numpy()
    got_vo = np.einsum(
        "dhr,hre->hde",
        np.asarray(f.o).reshape(d, n_heads, rank),
        np.asarray(f.v).reshape(n_kv, rank, d).repeat(group, 0),
    )
    ref_vo = np.einsum(
        "dhr,hre->hde",
        o_ref.reshape(d, n_heads, rank),
        v_ref.reshape(n_kv, rank, d).repeat(group, 0),
    )
    np.testing.assert_allclose(got_vo, ref_vo, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("n_heads,n_kv", [(3, 3), (4, 2)])
def test_vo_cholesky_whitening_functionally_equals_eigh(make_psd, rng, n_heads, n_kv):
    """Any F with F^T F = C gives the same whitened projection: the
    cholesky fast path must match the eigh parity path functionally."""
    d, hd, rank = 20, 8, 4
    cov_x = make_psd(d, scale=2.0)
    Wv = rng.standard_normal((n_kv * hd, d))
    Wo = rng.standard_normal((d, n_heads * hd))
    fe = compress_vo_layer(jnp.asarray(cov_x), jnp.asarray(Wv), jnp.asarray(Wo), rank, n_heads, n_kv, 1e-5, whiten="eigh")
    fc = compress_vo_layer(jnp.asarray(cov_x), jnp.asarray(Wv), jnp.asarray(Wo), rank, n_heads, n_kv, 1e-5, whiten="cholesky")
    group = n_heads // n_kv

    def per_head_product(f):
        return np.einsum(
            "dhr,hre->hde",
            np.asarray(f.o).reshape(d, n_heads, rank),
            np.asarray(f.v).reshape(n_kv, rank, d).repeat(group, 0),
        )

    np.testing.assert_allclose(per_head_product(fe), per_head_product(fc), rtol=1e-6, atol=1e-8)


def test_qk_svd_full_rank_reproduces_bilinear_form(make_psd, rng):
    """At full rank the whitened-SVD QK factors reproduce Wq_h^T Wk_h."""
    from modegpt_tpu.ops.qk import compress_qk_layer_svd

    d, hd, n = 20, 8, 2
    cov_x = make_psd(d, scale=2.0)
    Wq = rng.standard_normal((n * hd, d))
    Wk = rng.standard_normal((n * hd, d))
    f = compress_qk_layer_svd(
        jnp.asarray(cov_x), jnp.asarray(Wq), jnp.asarray(Wk), None, None, hd, 1e-10, n
    )
    for h in range(n):
        q_blk = np.asarray(f.q)[h * hd : (h + 1) * hd]  # [r, d]
        k_blk = np.asarray(f.k)[h * hd : (h + 1) * hd]
        got = q_blk.T @ k_blk  # [d, d] bilinear form
        want = Wq[h * hd : (h + 1) * hd].T @ Wk[h * hd : (h + 1) * hd]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_qk_svd_truncation_reduces_error_with_rank(make_psd, rng):
    from modegpt_tpu.ops.qk import compress_qk_layer_svd

    d, hd, n = 24, 12, 1
    cov_x = make_psd(d, scale=2.0)
    Wq = rng.standard_normal((hd, d))
    Wk = rng.standard_normal((hd, d))
    want = Wq.T @ Wk
    errs = []
    for r in (4, 8, 12):
        f = compress_qk_layer_svd(
            jnp.asarray(cov_x), jnp.asarray(Wq), jnp.asarray(Wk), None, None, r, 1e-8, n
        )
        got = np.asarray(f.q).T @ np.asarray(f.k)
        errs.append(np.linalg.norm(got - want))
    assert errs[0] > errs[1] > errs[2]
