"""Linear-algebra primitives for subspace change-point scoring (numpy oracle).

Re-derives, scipy/numba-free, the numerical semantics of the reference
(/root/reference/changepoynt/utils/linalg.py):

- ``power_method``           (reference linalg.py:15-45)
- ``lanczos``                (reference linalg.py:49-96, Ide & Tsuda 2007 subroutine 1)
- ``tridiagonal_eigenvalues``(reference linalg.py:99-125; scipy.eigh_tridiagonal
                              replaced with a dense ``np.linalg.eigh`` — matrices
                              are k x k with k ~ 10, exact to ~1e-12)
- ``rayleigh_ritz_singular_value_decomposition`` (reference linalg.py:128-141;
                              ARPACK svds replaced with full ``np.linalg.svd``
                              top-k — Hankel matrices are at most a few hundred
                              square, and downstream scores are order/sign
                              insensitive)
- ``randomized_hankel_svd``  (reference linalg.py:162-205, Halko et al. 2011;
                              ``scipy.linalg.lu(permute_l=True)`` replaced with
                              an own partial-pivot LU returning P@L)
- ``compile_hankel``         (reference linalg.py:208-236; numba loop replaced
                              with a vectorized ``sliding_window_view`` that
                              produces identical values)
- ``FastHankel``             implicit O(L log L) Hankel via rFFT correlation
                              (semantics of reference linalg.py:396-598
                              ``HankelFFTRepresentation``; fft length uses
                              next power of two instead of ``next_fast_len`` —
                              changes only padding, not results)

All randomness flows through the *global* legacy numpy RNG, in the same draw
order as the reference, so a single ``np.random.seed`` before ``transform``
pins the whole score array (determinism contract, reference tests).
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# dense primitives
# ---------------------------------------------------------------------------

def power_method(a_matrix, x_vector: np.ndarray, n_iterations: int):
    """Dominant eigenpair by repeated multiplication with max-abs rescaling
    per iteration and a final 2-norm normalization (reference linalg.py:15-45).

    ``a_matrix`` may be a dense ndarray or any object implementing
    ``__matmul__`` against an (N, 1) vector (e.g. :class:`LazyGram`).
    """
    for _ in range(n_iterations):
        x_vector = a_matrix @ x_vector
        x_vector = x_vector / np.max(np.abs(x_vector))
    x_vector = x_vector / np.linalg.norm(x_vector)
    # single evaluation of A@x (the reference evaluates the identical
    # product twice — same bits, half the work)
    y = a_matrix @ x_vector
    eigenvalue = np.linalg.norm(y)
    return eigenvalue, y / eigenvalue


def lanczos(a_matrix, r_0: np.ndarray, k: int):
    """k-step Lanczos tridiagonalization seeded with the *unnormalized* r_0
    and beta_0 = 1 (reference linalg.py:49-96).  Returns (alphas, betas) of
    the symmetric tridiagonal T.
    """
    r_i = r_0
    q_i = np.zeros_like(r_i)
    alphas = np.zeros(shape=(k + 1,), dtype=np.float64)
    betas = np.ones(shape=(k + 1,), dtype=np.float64)
    for j in range(k):
        new_q = r_i / betas[j]
        intermediate = a_matrix @ new_q
        alphas[j + 1] = (new_q.T @ intermediate).item()
        r_i = intermediate - alphas[j + 1] * new_q - betas[j] * q_i
        betas[j + 1] = np.linalg.norm(r_i)
        q_i = new_q
    return alphas[1:], betas[1:-1]


def tridiagonal_eigenvalues(alphas: np.ndarray, betas: np.ndarray, amount: int = -1):
    """Top-``amount`` eigenpairs of the symmetric tridiagonal matrix, in
    descending order (reference linalg.py:99-125)."""
    if amount < 0:
        amount = alphas.shape[0]
    assert 0 < amount <= alphas.shape[0], 'We can only calculate one to size of matrix eigenvalues.'
    assert alphas.ndim == 1, 'The alphas need to be vectors.'
    assert betas.ndim == 1, 'The betas need to be vectors.'
    assert alphas.shape[0] - 1 == betas.shape[0], 'Alpha size needs to be exactly one bigger than beta size.'
    t = np.diag(alphas) + np.diag(betas, 1) + np.diag(betas, -1)
    eigenvalues, eigenvectors = np.linalg.eigh(t)
    eigenvalues = eigenvalues[-amount:]
    eigenvectors = eigenvectors[:, -amount:]
    return eigenvalues[::-1], eigenvectors[:, ::-1]


def rayleigh_ritz_singular_value_decomposition(a_matrix: np.ndarray, k: int):
    """Top-k left singular pairs (reference linalg.py:128-141).  The reference
    uses ARPACK and documents that ordering is not guaranteed; downstream
    scores are invariant to column order and sign."""
    u, s, _ = np.linalg.svd(a_matrix, full_matrices=False)
    return s[:k], u[:, :k]


def facebook_randomized_svd(a_matrix, randomized_rank: int):
    """Halko randomized SVD stand-in for ``fbpca.pca(A, l, raw=True)``
    (reference linalg.py:144-159).  fbpca is not installable here; the
    reference's own tests only smoke this method, so we back it with
    :func:`randomized_hankel_svd` at the same sampling rank (fbpca's default
    oversampling is l = k + 2, subspace iterations = 2 — the same Halko
    scheme this module implements)."""
    u, s, _ = randomized_hankel_svd(a_matrix, randomized_rank, oversampling_p=2)
    return s, u


def _plu(a: np.ndarray) -> np.ndarray:
    """Partial-pivot LU returning the row-permuted unit-lower-triangular
    factor P@L (the ``permute_l=True`` output of a standard LU).  Used as the
    cheap inter-iteration orthogonalization inside the randomized SVD power
    iterations (Halko et al. 2011, remark 4.3)."""
    m, n = a.shape
    k = min(m, n)
    u = a.astype(np.float64, copy=True)
    perm = np.arange(m)
    lower = np.zeros((m, k), dtype=np.float64)
    for j in range(k):
        p = j + int(np.argmax(np.abs(u[j:, j])))
        if p != j:
            u[[j, p], :] = u[[p, j], :]
            lower[[j, p], :] = lower[[p, j], :]
            perm[[j, p]] = perm[[p, j]]
        lower[j, j] = 1.0
        piv = u[j, j]
        if piv != 0.0:
            mult = u[j + 1:, j] / piv
            lower[j + 1:, j] = mult
            u[j + 1:, j:] -= np.outer(mult, u[j, j:])
    out = np.empty_like(lower)
    out[perm, :] = lower
    return out


def _qr_q(a: np.ndarray) -> np.ndarray:
    q, _ = np.linalg.qr(a)
    return q


def _plu_batched(a: np.ndarray) -> np.ndarray:
    """Batched partial-pivot LU returning P@L for a (B, m, n) stack — the
    same factorization as :func:`_plu`, vectorized across the batch (one
    python iteration per column instead of per column per step)."""
    b, m, n = a.shape
    k = min(m, n)
    u = a.astype(np.float64, copy=True)
    perm = np.tile(np.arange(m), (b, 1))
    lower = np.zeros((b, m, k), dtype=np.float64)
    bidx = np.arange(b)
    for j in range(k):
        p = j + np.argmax(np.abs(u[:, j:, j]), axis=1)
        for mat in (u, lower):
            row_j = mat[bidx, j, :].copy()
            mat[bidx, j, :] = mat[bidx, p, :]
            mat[bidx, p, :] = row_j
        pj = perm[bidx, j].copy()
        perm[bidx, j] = perm[bidx, p]
        perm[bidx, p] = pj
        lower[:, j, j] = 1.0
        piv = u[:, j, j]
        safe = np.where(piv == 0.0, 1.0, piv)
        mult = np.where(piv[:, None] == 0.0, 0.0, u[:, j + 1:, j] / safe[:, None])
        lower[:, j + 1:, j] = mult
        u[:, j + 1:, j:] -= mult[:, :, None] * u[:, j, j:][:, None, :]
    out = np.zeros_like(lower)
    np.put_along_axis(out, perm[:, :, None], lower, axis=1)
    return out


def batched_randomized_hankel_svd(hankels: np.ndarray, k: int, omegas: np.ndarray,
                                  subspace_iteration_q: int = 2):
    """Randomized truncated SVD of a (B, w, n) Hankel stack — the batched
    form of :func:`randomized_hankel_svd` with pre-drawn sketches ``omegas``
    of shape (B, n, l) (callers replay the RNG stream in the reference's
    draw order before calling).  Returns (U, s, Va) stacks.
    """
    q = np.matmul(hankels, omegas)
    if subspace_iteration_q == 0:
        q, _ = np.linalg.qr(q)
    if subspace_iteration_q > 0:
        q = _plu_batched(q)
    ht = hankels.transpose(0, 2, 1)
    for it in range(subspace_iteration_q):
        q = np.matmul(ht, q)
        q = _plu_batched(q)
        q = np.matmul(hankels, q)
        if it + 1 < subspace_iteration_q:
            q = _plu_batched(q)
        else:
            q, _ = np.linalg.qr(q)
    lower_space = np.matmul(q.transpose(0, 2, 1), hankels)
    r, s, va = np.linalg.svd(lower_space, full_matrices=False)
    u = np.matmul(q, r)
    return u[:, :, :k], s[:, :k], va[:, :k, :]


def randomized_hankel_svd(hankel_matrix, k: int, subspace_iteration_q: int = 2,
                          oversampling_p: int = 2):
    """Randomized truncated SVD (Halko et al. 2011), structured like the
    reference's fbpca-derived implementation (reference linalg.py:162-205):
    uniform(-1, 1) sketch, LU-stabilized power iterations, final QR, small
    dense SVD.  Accepts dense ndarrays or implicit :class:`FastHankel` /
    :class:`ConcatHankel` operators (only products with tall-skinny dense
    matrices are ever formed — this is the O(L log L) path).

    The uniform sketch is drawn from the global RNG — one draw per call, in
    the same position of the RNG stream as the reference.
    """
    sample_length_l = k + oversampling_p
    assert 1.25 * sample_length_l < min(hankel_matrix.shape)

    omega = np.random.uniform(low=-1, high=1, size=(hankel_matrix.shape[1], sample_length_l))
    q = _matmat(hankel_matrix, omega)

    if subspace_iteration_q == 0:
        q = _qr_q(q)
    if subspace_iteration_q > 0:
        q = _plu(q)

    for it in range(subspace_iteration_q):
        q = _t_matmat(hankel_matrix, q)            # (A^T Q)
        q = _plu(q)
        q = _matmat(hankel_matrix, q)              # A (A^T Q)
        if it + 1 < subspace_iteration_q:
            q = _plu(q)
        else:
            q = _qr_q(q)

    lower_space = _t_matmat(hankel_matrix, q).T    # Q^T A, dense (l x n)
    r, s, va = np.linalg.svd(lower_space, full_matrices=False)
    u = q @ r
    return u[:, :k], s[:k], va[:k, :]


# ---------------------------------------------------------------------------
# Hankel construction — dense and implicit-FFT forms
# ---------------------------------------------------------------------------

def compile_hankel(time_series: np.ndarray, end_index: int, window_size: int, rank: int,
                   lag: int = 1, const_offset: float = None) -> np.ndarray:
    """Dense (window_size x rank) Hankel trajectory matrix whose columns are
    lagged subsequences ending at ``end_index``; column -cx-1 is
    ``ts[end - w - cx*lag : end - cx*lag]`` (reference linalg.py:208-236).
    Vectorized with a strided view — identical values, no per-column loop.
    """
    start = end_index - window_size - (rank - 1) * lag
    sl = time_series[start:end_index]
    windows = np.lib.stride_tricks.sliding_window_view(sl, window_size)[::lag]
    hankel = windows.T.astype(np.float64, copy=True)
    if const_offset is not None:
        hankel = hankel - const_offset
    return hankel


def _next_pow2(n: int) -> int:
    return 1 << (int(n - 1).bit_length())


class FastHankel:
    """Implicit Hankel operator over a covering signal slice.

    H[i, c] = s[i + c] where s = ts[end-w-n+1 : end] (unit-lag only, like the
    reference fast path).  Products with dense matrices are rFFT cross-
    correlations, O(L log L) per column instead of O(w*n) — the semantics of
    the reference's HankelFFTRepresentation (linalg.py:396-598).
    """

    __slots__ = ('signal', 'w', 'n', 'fft_len', 'signal_fft')

    def __init__(self, time_series: np.ndarray, end_index: int, window_size: int, rank: int):
        self.w = int(window_size)
        self.n = int(rank)
        s = np.asarray(time_series[end_index - self.w - self.n + 1:end_index], dtype=np.float64)
        self.signal = s
        self.fft_len = _next_pow2(len(s) + max(self.w, self.n))
        self.signal_fft = np.fft.rfft(s, self.fft_len)

    @property
    def shape(self):
        return (self.w, self.n)

    def matmat(self, x: np.ndarray) -> np.ndarray:
        """H @ X for dense X of shape (n, k): out[i, j] = sum_c s[i+c] X[c, j]."""
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        xf = np.fft.rfft(x[::-1, :], self.fft_len, axis=0)
        full = np.fft.irfft(self.signal_fft[:, None] * xf, self.fft_len, axis=0)
        return full[self.n - 1:self.n - 1 + self.w, :]

    def t_matmat(self, y: np.ndarray) -> np.ndarray:
        """H.T @ Y for dense Y of shape (w, k): out[c, j] = sum_i s[i+c] Y[i, j]."""
        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 1:
            y = y[:, None]
        yf = np.fft.rfft(y[::-1, :], self.fft_len, axis=0)
        full = np.fft.irfft(self.signal_fft[:, None] * yf, self.fft_len, axis=0)
        return full[self.w - 1:self.w - 1 + self.n, :]

    def __matmul__(self, other):
        if isinstance(other, _Transposed) and other.base is self:
            return LazyGram(self)
        return self.matmat(other)

    @property
    def T(self):
        return _Transposed(self)

    def dense(self) -> np.ndarray:
        return np.lib.stride_tricks.sliding_window_view(self.signal, self.w)[:self.n].T.copy()


class _Transposed:
    """Transposed view of an implicit Hankel-like operator."""

    __slots__ = ('base',)

    def __init__(self, base):
        self.base = base

    @property
    def shape(self):
        s = self.base.shape
        return (s[1], s[0])

    def __matmul__(self, other):
        return self.base.t_matmat(other)


class LazyGram:
    """Lazy H @ H.T product; only supports matvec/matmat (what power_method
    and lanczos need).  Mirrors the reference's correlation FFT representation
    (linalg.py:601-623) without the operator-overload protocol."""

    __slots__ = ('h',)

    def __init__(self, h):
        self.h = h

    @property
    def shape(self):
        w = self.h.shape[0]
        return (w, w)

    def __matmul__(self, x):
        return _matmat(self.h, _t_matmat(self.h, x))


class ConcatHankel:
    """Column-concatenation [H1 | H2] of two implicit Hankels (the ESST
    concatenated trajectory matrix; semantics of the reference's multilevel
    representation, linalg.py:626-825)."""

    __slots__ = ('h1', 'h2')

    def __init__(self, h1, h2):
        assert h1.shape[0] == h2.shape[0]
        self.h1 = h1
        self.h2 = h2

    @property
    def shape(self):
        return (self.h1.shape[0], self.h1.shape[1] + self.h2.shape[1])

    def matmat(self, x: np.ndarray) -> np.ndarray:
        n1 = self.h1.shape[1]
        return _matmat(self.h1, x[:n1, :]) + _matmat(self.h2, x[n1:, :])

    def t_matmat(self, y: np.ndarray) -> np.ndarray:
        return np.vstack([_t_matmat(self.h1, y), _t_matmat(self.h2, y)])

    def __matmul__(self, other):
        return self.matmat(other)

    @property
    def T(self):
        return _Transposed(self)


def _matmat(h, x: np.ndarray) -> np.ndarray:
    if isinstance(h, np.ndarray):
        return h @ x
    return h.matmat(x)


def _t_matmat(h, y: np.ndarray) -> np.ndarray:
    if isinstance(h, np.ndarray):
        return h.T @ y
    return h.t_matmat(y)


def gram(h):
    """H @ H.T — dense product for ndarrays, lazy FFT product for implicit
    Hankels (what the reference's ``hankel @ hankel.T`` overload resolves to)."""
    if isinstance(h, np.ndarray):
        return h @ h.T
    return LazyGram(h)
