"""Unit tests for PSD sqrt / ridge-leverage primitives."""

import jax.numpy as jnp
import numpy as np
import pytest

from modegpt_tpu.ops.psd import (
    cholesky_solve_ridged,
    ridge_inverse_diag,
    sqrt_and_inv_sqrt_psd,
    sqrt_psd,
)


def test_sqrt_psd_squares_back(make_psd):
    M = make_psd(32)
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=0.0))
    np.testing.assert_allclose(S @ S, M, rtol=1e-8, atol=1e-10)


def test_sqrt_psd_ridge_shifts_eigenvalues(make_psd):
    M = make_psd(16)
    ridge = 0.5
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=ridge))
    w_m = np.linalg.eigvalsh(M)
    w_s = np.linalg.eigvalsh(S @ S)
    np.testing.assert_allclose(np.sort(w_s), np.sort(w_m + ridge), rtol=1e-8, atol=1e-9)


def test_sqrt_psd_scaled_ridge(make_psd):
    M = make_psd(16)
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=1e-2, scaled=True))
    w_m = np.linalg.eigvalsh(M)
    w_s = np.linalg.eigvalsh(S @ S)
    np.testing.assert_allclose(np.sort(w_s), np.sort(w_m + 1e-2 * w_m.max()), rtol=1e-8)


def test_inv_sqrt_is_inverse_of_sqrt(make_psd):
    M = make_psd(24)
    S, Si = sqrt_and_inv_sqrt_psd(jnp.asarray(M), ridge=1e-6)
    prod = np.asarray(S) @ np.asarray(Si)
    np.testing.assert_allclose(prod, np.eye(24), rtol=1e-6, atol=1e-8)


def test_ridge_inverse_diag_matches_dense_inverse(make_psd):
    C = make_psd(40)
    lam = 1e-2
    got = np.asarray(ridge_inverse_diag(jnp.asarray(C), lam))
    want = np.diag(np.linalg.inv(C + lam * np.eye(40)))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)


def test_cholesky_solve_ridged(make_psd, rng):
    A = make_psd(20)
    B = rng.standard_normal((20, 7))
    X = np.asarray(cholesky_solve_ridged(jnp.asarray(A), jnp.asarray(B), ridge=1e-6))
    want = np.linalg.solve(A + 1e-6 * np.eye(20), B)
    np.testing.assert_allclose(X, want, rtol=1e-7, atol=1e-10)


def test_torch_parity_sqrt(make_psd):
    """Golden parity: same math as the reference's sqrt_M, written in torch."""
    torch = pytest.importorskip("torch")
    M = make_psd(48)
    ridge = 1e-4

    # Reference formula (src/compression_utils.py:21-48): eigh, += ridge,
    # clamped sqrt, reassemble.
    w, V = torch.linalg.eigh(torch.tensor(M, dtype=torch.float64))
    w = w + ridge
    S_ref = (V @ torch.diag(torch.sqrt(w.clamp(min=0))) @ V.T).numpy()

    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=ridge))
    np.testing.assert_allclose(S, S_ref, rtol=1e-9, atol=1e-10)


def test_cholesky_escalated_is_plain_cholesky_when_well_conditioned(make_psd):
    """The escalation path must not perturb healthy solves: first-attempt
    success returns the bit-identical factorisation."""
    from modegpt_tpu.ops.psd import _cholesky_escalated

    A = jnp.asarray(make_psd(32))
    L = np.asarray(_cholesky_escalated(A, 1e-6))
    want = np.asarray(jnp.linalg.cholesky(A + 1e-6 * jnp.eye(32, dtype=A.dtype)))
    np.testing.assert_array_equal(L, want)


def test_cholesky_escalated_survives_singular_f32(rng):
    """f32 Gram with rank << n and spectrum >> ridge: the reference's
    absolute 1e-6 ridge sits below f32 rounding noise, so plain Cholesky
    NaNs — the escalated path must return a finite factorisation (this is
    the tokens < kept-rank regime: near-full-rank Nystrom solves, OPT
    relu Grams, per-expert MoE Grams at top_k/E routing)."""
    m, n = 64, 512  # rank 64 covariance in 512 dims
    X = rng.standard_normal((m, n)).astype(np.float32) * 10.0
    C = jnp.asarray((X.T @ X) / m, dtype=jnp.float32)

    plain = np.asarray(
        jnp.linalg.cholesky(C + 1e-6 * jnp.eye(n, dtype=jnp.float32))
    )
    assert np.isnan(plain).any(), "precondition: plain f32 Cholesky must fail here"

    from modegpt_tpu.ops.psd import _cholesky_escalated

    L = np.asarray(_cholesky_escalated(C, jnp.float32(1e-6)))
    assert np.isfinite(L).all()
    # L L^T must still be C up to the escalated ridge (~8*eps*trace scale).
    delta = L @ L.T - np.asarray(C)
    bound = 64 * 8 * np.finfo(np.float32).eps * float(jnp.trace(C))
    assert np.abs(delta - np.diag(np.diag(delta))).max() < bound
    assert np.abs(np.diag(delta)).max() < bound


def test_nystrom_finite_when_rank_exceeds_token_count(rng):
    """End-to-end Type-I regression for the singular regime: 2048-token
    Gram, 2647-column keep (the opt-125m quality-curve shape, scaled
    down) in f32 must give finite factors on every output."""
    from modegpt_tpu.ops.mlp import nystrom_mlp, nystrom_mlp_padded

    m, d_int, d_model, rank = 48, 256, 64, 200  # rank > m: singular C_SS
    H = np.maximum(rng.standard_normal((m, d_int)), 0).astype(np.float32) * 5
    C = jnp.asarray((H.T @ H) / m)
    W_u = jnp.asarray(rng.standard_normal((d_int, d_model)).astype(np.float32) * 0.02)
    W_d = jnp.asarray(rng.standard_normal((d_model, d_int)).astype(np.float32) * 0.02)

    f = nystrom_mlp(C, W_u, None, W_d, keep_ratio=0.0, ridge=1e-2, rank=rank)
    for a in (f.up, f.down):
        assert np.isfinite(np.asarray(a)).all()

    up, gate, down, idx, valid = nystrom_mlp_padded(
        C, W_u, W_u, W_d, jnp.int32(rank), rank, jnp.float32(1e-2)
    )
    for a in (up, gate, down):
        assert np.isfinite(np.asarray(a)).all()


def test_vo_cholesky_whitener_finite_on_singular_cov(rng):
    """cov_x singular (d_model > calibration tokens — the 13B+ regime)
    must not NaN the f32 cholesky whitening path."""
    from modegpt_tpu.ops.vo import vo_full_factors

    m, d = 32, 256
    X = rng.standard_normal((m, d)).astype(np.float32) * 8
    cov_x = jnp.asarray((X.T @ X) / m)
    H, Hk, hd = 4, 2, 64
    W_v = jnp.asarray(rng.standard_normal((Hk * hd, d)).astype(np.float32) * 0.02)
    W_o = jnp.asarray(rng.standard_normal((d, H * hd)).astype(np.float32) * 0.02)
    v_full, o_full = vo_full_factors(cov_x, W_v, W_o, H, Hk, 1e-6, whiten="cholesky")
    assert np.isfinite(np.asarray(v_full)).all()
    assert np.isfinite(np.asarray(o_full)).all()


def test_cholesky_escalated_under_shard_map(rng):
    """The escalated-Cholesky while_loop must trace under shard_map:
    its constant initial carries (NaN factor, caller ridge) have to be
    promoted to the mesh axes the Gram is varying over (jax 0.9 vma
    rules) — a plain constant carry fails to type-check against the
    varying body output. Regression for the 8-device dryrun's
    shard_map solver stage."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")

    d = 64
    # one Gram per device; half the batch exactly singular (rank 4)
    grams = []
    for i in range(n_dev):
        m = 4 if i % 2 == 0 else 256
        X = rng.standard_normal((m, d)).astype(np.float32) * 4
        grams.append((X.T @ X) / m)
    C = jnp.asarray(np.stack(grams))

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    @jax.jit
    def run(C):
        f = shard_map(
            lambda c: jax.vmap(lambda g: ridge_inverse_diag(g, 1e-6))(c),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P("data"),
        )
        return f(C)

    scores = np.asarray(run(C))
    assert scores.shape == (n_dev, d)
    assert np.isfinite(scores).all()
    # parity with the unsharded path on every shard
    ref = np.stack([np.asarray(ridge_inverse_diag(C[i], 1e-6)) for i in range(n_dev)])
    np.testing.assert_allclose(scores, ref, rtol=2e-4, atol=1e-5)


class TestRowBlockedTriangular:
    """The beyond-native-memory solve path for 32B-geometry d_int.

    XLA's native TPU triangular_solve needs ~n^2*16 bytes of live
    remainder temps (10.5 GB at n=25600 — OOMs the 16 GB chip), so
    `ridge_inverse_diag` / `cholesky_solve_ridged` switch to explicit
    row-blocked substitution above `_TRI_NATIVE_MAX_N`. The blocking is
    exact; these tests force the threshold down and require the big
    path to match the native path and the dense f64 oracle."""

    @pytest.fixture
    def low_threshold(self, monkeypatch):
        import modegpt_tpu.ops.psd as psd_mod

        monkeypatch.setattr(psd_mod, "_TRI_NATIVE_MAX_N", 48)

    @pytest.mark.parametrize("n,m", [(100, 7), (2048 + 300, 129), (4096 + 1, 1)])
    def test_rowblocked_solves_match_native(self, rng, n, m):
        from modegpt_tpu.ops.psd import (
            _tri_solve_lower_rowblocked,
            _tri_solve_lowerT_rowblocked,
        )
        import jax

        A = rng.standard_normal((n, n)).astype(np.float32)
        A = A @ A.T / n + 0.1 * np.eye(n, dtype=np.float32)
        L = np.linalg.cholesky(A).astype(np.float32)
        B = rng.standard_normal((n, m)).astype(np.float32)
        want = np.asarray(jax.scipy.linalg.solve_triangular(L, B, lower=True))
        got = np.asarray(_tri_solve_lower_rowblocked(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        wantT = np.asarray(jax.scipy.linalg.solve_triangular(L.T, B, lower=False))
        gotT = np.asarray(_tri_solve_lowerT_rowblocked(jnp.asarray(L), jnp.asarray(B)))
        np.testing.assert_allclose(gotT, wantT, rtol=2e-5, atol=2e-5)

    def test_ridge_inverse_diag_big_path(self, make_psd, low_threshold):
        import jax

        C = make_psd(300).astype(np.float32)
        with jax.disable_jit():
            got = np.asarray(ridge_inverse_diag.__wrapped__(jnp.asarray(C), 1e-2))
        want = np.diag(np.linalg.inv(C.astype(np.float64) + 1e-2 * np.eye(300)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_cholesky_solve_big_path(self, make_psd, rng, low_threshold):
        import jax

        A = make_psd(300).astype(np.float32)
        B = rng.standard_normal((300, 17)).astype(np.float32)
        with jax.disable_jit():
            got = np.asarray(
                cholesky_solve_ridged(jnp.asarray(A), jnp.asarray(B), ridge=1e-4)
            )
        want = np.linalg.solve(A.astype(np.float64) + 1e-4 * np.eye(300), B)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestRecursiveCholesky:
    """Recursive blocked Cholesky/solves (ops/psd.py _cholesky_recursive):
    exact reorganisation of the native ops into MXU-sized matmuls for the
    7B..14B d_int range (VERDICT r4 weak-4). Small leaf sizes here force
    several recursion levels at test scale."""

    def _psd(self, rng, n):
        A = rng.standard_normal((n, 640)).astype(np.float32)
        return jnp.asarray(A @ A.T / 640 + 0.1 * np.eye(n, dtype=np.float32))

    def test_matches_native_cholesky(self, rng, monkeypatch):
        from modegpt_tpu.ops import psd

        monkeypatch.setattr(psd, "_CHOL_LEAF", 64)
        C = self._psd(rng, 300)
        L = np.asarray(psd._cholesky_recursive(C))
        L_ref = np.asarray(jnp.linalg.cholesky(C))
        assert np.allclose(L, L_ref, rtol=2e-4, atol=2e-5)
        assert np.allclose(L, np.tril(L))  # strictly lower-triangular

    def test_tri_solves_match_native(self, rng, monkeypatch):
        from modegpt_tpu.ops import psd
        import jax.scipy.linalg as jsl

        monkeypatch.setattr(psd, "_CHOL_LEAF", 64)
        C = self._psd(rng, 300)
        L = jnp.linalg.cholesky(C)
        B = jnp.asarray(rng.standard_normal((300, 37)).astype(np.float32))
        X = np.asarray(psd._tri_solve_lower_recursive(L, B))
        X_ref = np.asarray(jsl.solve_triangular(L, B, lower=True))
        assert np.allclose(X, X_ref, rtol=2e-4, atol=2e-5)
        Y = np.asarray(psd._tri_solve_lowerT_recursive(L, B))
        Y_ref = np.asarray(jsl.solve_triangular(L.T, B, lower=False))
        assert np.allclose(Y, Y_ref, rtol=2e-3, atol=2e-4)

    def test_nan_propagates_to_diagonal(self, rng, monkeypatch):
        """Indefinite input must surface NaN on the factor diagonal —
        _cholesky_escalated's retry detection depends on it."""
        from modegpt_tpu.ops import psd

        monkeypatch.setattr(psd, "_CHOL_LEAF", 64)
        n = 300
        A = self._psd(rng, n) - 5.0 * jnp.eye(n)  # strongly indefinite
        L = np.asarray(psd._cholesky_recursive(A))
        assert np.isnan(np.diagonal(L)).any()
        # ...including when only the TRAILING block is indefinite
        A2 = np.array(self._psd(rng, n))
        A2[200:, 200:] -= 50.0 * np.eye(100, dtype=np.float32)
        L2 = np.asarray(psd._cholesky_recursive(jnp.asarray(A2)))
        assert not np.isnan(np.diagonal(L2)[:64]).any()
        assert np.isnan(np.diagonal(L2)[200:]).any()

    def test_dispatch_thresholds(self, rng, monkeypatch):
        """_chol: native below the floor and above _TRI_NATIVE_MAX_N,
        recursive in between; escalated retry still converges through
        the recursive path."""
        from modegpt_tpu.ops import psd

        monkeypatch.setattr(psd, "_CHOL_LEAF", 64)
        monkeypatch.setattr(psd, "_CHOL_RECURSIVE_MIN_N", 128)
        C = self._psd(rng, 192)
        assert np.allclose(
            np.asarray(psd._chol(C)), np.asarray(jnp.linalg.cholesky(C)),
            rtol=2e-4, atol=2e-5,
        )
        # singular matrix through the mid-range escalated path: the
        # NaN retry must raise the ridge and return finite factors
        x = rng.standard_normal((192, 3)).astype(np.float32)
        S = jnp.asarray(x @ x.T)  # rank-3, singular
        L = np.asarray(psd._cholesky_escalated(S, 1e-30))
        assert np.isfinite(L).all()

    def test_ridge_inverse_diag_and_solve_mid_range(self, rng, monkeypatch):
        """The public entry points route through the recursive forms in
        the mid range and agree with the dense reference."""
        from modegpt_tpu.ops import psd

        monkeypatch.setattr(psd, "_CHOL_LEAF", 64)
        monkeypatch.setattr(psd, "_CHOL_RECURSIVE_MIN_N", 128)
        monkeypatch.setattr(psd, "_TRI_SOLVE_BLOCK", 48)
        n = 300
        C = self._psd(rng, n)
        got = np.asarray(psd.ridge_inverse_diag.__wrapped__(C, 1e-2))
        want = np.diagonal(np.linalg.inv(np.asarray(C) + 1e-2 * np.eye(n)))
        assert np.allclose(got, want, rtol=2e-3, atol=1e-5)
        B = jnp.asarray(rng.standard_normal((n, 37)).astype(np.float32))
        X = np.asarray(psd.cholesky_solve_ridged(C, B, 1e-6))
        X_ref = np.linalg.solve(np.asarray(C) + 1e-6 * np.eye(n), np.asarray(B))
        assert np.allclose(X, X_ref, rtol=2e-3, atol=2e-4)
