"""Numerics unit tests for the linalg primitives, mirroring the reference's
tests/test_linalg.py strategy: check approximations against full
np.linalg.svd/eigh (sign-agnostic), and fast-Hankel products against dense."""
import numpy as np
import pytest

from changepoynt_spark.kernels import linalg as lg


@pytest.fixture()
def sym_matrix():
    # controlled spectrum with a clear dominant gap so the power method converges
    rng = np.random.default_rng(42)
    q, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    vals = np.linspace(1.0, 50.0, 40)
    vals[-1] = 120.0
    return (q * vals) @ q.T


def test_power_method_dominant_eigenpair(sym_matrix):
    eigvals, eigvecs = np.linalg.eigh(sym_matrix)
    x0 = np.ones((40, 1)) / np.sqrt(40)
    val, vec = lg.power_method(sym_matrix, x0, n_iterations=100)
    np.testing.assert_allclose(val, eigvals[-1], rtol=1e-8)
    np.testing.assert_allclose(np.abs(vec[:, 0]), np.abs(eigvecs[:, -1]), atol=1e-6)


def test_lanczos_tridiagonal_reproduces_dominant_eigenvalue(sym_matrix):
    # plain Lanczos (no reorthogonalization, like the reference) — only the
    # dominant Ritz value is reliable; larger k produces ghost copies.
    eigvals = np.linalg.eigvalsh(sym_matrix)
    rng = np.random.default_rng(0)
    r0 = rng.standard_normal((40, 1))
    r0 /= np.linalg.norm(r0)
    alphas, betas = lg.lanczos(sym_matrix, r0, 15)
    approx, _ = lg.tridiagonal_eigenvalues(alphas, betas, 1)
    np.testing.assert_allclose(approx[0], eigvals[-1], rtol=1e-6)


def test_tridiagonal_eigenvalues_against_dense():
    rng = np.random.default_rng(1)
    alphas = rng.standard_normal(12)
    betas = rng.standard_normal(11)
    dense = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
    expected = np.linalg.eigvalsh(dense)[::-1]
    vals, vecs = lg.tridiagonal_eigenvalues(alphas, betas, 5)
    np.testing.assert_allclose(vals, expected[:5], atol=1e-10)
    # eigenvector property
    for i in range(5):
        np.testing.assert_allclose(dense @ vecs[:, i], vals[i] * vecs[:, i], atol=1e-8)


def test_rayleigh_ritz_svd_matches_full_svd():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((30, 20))
    s_full = np.linalg.svd(a, compute_uv=False)
    s, u = lg.rayleigh_ritz_singular_value_decomposition(a, 4)
    np.testing.assert_allclose(np.sort(s)[::-1], s_full[:4], rtol=1e-10)
    # left singular vectors orthonormal
    np.testing.assert_allclose(u.T @ u, np.eye(4), atol=1e-10)


def test_randomized_hankel_svd_approximates_dominant_subspace():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((60, 5)) @ rng.standard_normal((5, 40))
    noise = 1e-6 * rng.standard_normal((60, 40))
    a = base + noise
    u_full, s_full, _ = np.linalg.svd(a, full_matrices=False)
    np.random.seed(7)
    u, s, va = lg.randomized_hankel_svd(a, 5, oversampling_p=10)
    np.testing.assert_allclose(s, s_full[:5], rtol=1e-4)
    # subspace alignment: |U_full^T U| should be ~identity in singular values
    overlap = np.linalg.svd(u_full[:, :5].T @ u, compute_uv=False)
    np.testing.assert_allclose(overlap, np.ones(5), atol=1e-4)


def test_plu_factor_reconstructs_column_space():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((25, 6))
    pl = lg._plu(a)
    # P@L spans the same column space as A (up to the upper-triangular factor)
    q_a, _ = np.linalg.qr(a)
    q_pl, _ = np.linalg.qr(pl)
    overlap = np.linalg.svd(q_a.T @ q_pl, compute_uv=False)
    np.testing.assert_allclose(overlap, np.ones(6), atol=1e-10)


def test_compile_hankel_layout():
    ts = np.arange(30, dtype=np.float64)
    h = lg.compile_hankel(ts, end_index=20, window_size=4, rank=3)
    # column -cx-1 = ts[end-w-cx : end-cx]
    np.testing.assert_array_equal(h[:, 2], ts[16:20])
    np.testing.assert_array_equal(h[:, 1], ts[15:19])
    np.testing.assert_array_equal(h[:, 0], ts[14:18])


def test_compile_hankel_with_lag_and_offset():
    ts = np.arange(60, dtype=np.float64)
    h = lg.compile_hankel(ts, end_index=50, window_size=5, rank=4, lag=3, const_offset=2.0)
    for cx in range(4):
        np.testing.assert_array_equal(h[:, -cx - 1], ts[50 - 5 - cx * 3:50 - cx * 3] - 2.0)


def test_fast_hankel_products_match_dense():
    rng = np.random.default_rng(5)
    ts = rng.standard_normal(200)
    w, n, end = 30, 25, 150
    dense = lg.compile_hankel(ts, end, w, n)
    fast = lg.FastHankel(ts, end, w, n)
    np.testing.assert_allclose(fast.dense(), dense, atol=1e-12)
    x = rng.standard_normal((n, 3))
    np.testing.assert_allclose(fast.matmat(x), dense @ x, atol=1e-9)
    y = rng.standard_normal((w, 2))
    np.testing.assert_allclose(fast.t_matmat(y), dense.T @ y, atol=1e-9)
    # lazy gram matvec
    v = rng.standard_normal((w, 1))
    np.testing.assert_allclose(lg.gram(fast) @ v, dense @ (dense.T @ v), atol=1e-9)


def test_concat_hankel_matches_dense_concatenation():
    rng = np.random.default_rng(6)
    ts = rng.standard_normal(300)
    w, n = 20, 15
    d1 = lg.compile_hankel(ts, 100, w, n)
    d2 = lg.compile_hankel(ts, 140, w, n)
    concat_dense = np.concatenate([d1, d2], axis=1)
    concat_fast = lg.ConcatHankel(lg.FastHankel(ts, 100, w, n), lg.FastHankel(ts, 140, w, n))
    x = rng.standard_normal((2 * n, 4))
    np.testing.assert_allclose(concat_fast.matmat(x), concat_dense @ x, atol=1e-9)
    y = rng.standard_normal((w, 4))
    np.testing.assert_allclose(concat_fast.t_matmat(y), concat_dense.T @ y, atol=1e-9)


def test_randomized_svd_on_fast_hankel_matches_dense_input():
    rng = np.random.default_rng(8)
    ts = rng.standard_normal(400)
    w, n, end = 40, 35, 300
    dense = lg.compile_hankel(ts, end, w, n)
    fast = lg.FastHankel(ts, end, w, n)
    np.random.seed(11)
    u_d, s_d, v_d = lg.randomized_hankel_svd(dense, 3, oversampling_p=5)
    np.random.seed(11)
    u_f, s_f, v_f = lg.randomized_hankel_svd(fast, 3, oversampling_p=5)
    np.testing.assert_allclose(s_f, s_d, rtol=1e-8)
    np.testing.assert_allclose(np.abs(u_f), np.abs(u_d), atol=1e-7)
