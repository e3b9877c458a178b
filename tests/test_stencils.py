"""Stencil and circulant-symbol unit tests (reference behavior:
paper_2/discretization.py:152-222)."""

import numpy as np
import pytest

from pcx import stencils


def test_stencil_k1():
    # Staggered first difference and averaging.
    np.testing.assert_allclose(stencils.mfd_stencil(1, 1), [-1.0, 1.0])
    np.testing.assert_allclose(stencils.mfd_stencil(1, 0), [0.5, 0.5])


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("d", [0, 1])
def test_stencil_moment_conditions(k, d):
    """sum_j c_j p_j^i == (d+1) delta_{i,d} for i < 2k, exactly."""
    sten = stencils.mfd_stencil(k, d)
    pts = np.array([2 * (j - k) + 1 for j in range(2 * k)], dtype=float)
    for i in range(2 * k):
        want = (d + 1.0) if i == d else 0.0
        scale = np.sum(np.abs(sten * pts**i))  # cancellation magnitude
        np.testing.assert_allclose(np.dot(sten, pts**i), want,
                                   atol=1e-13 * max(scale, 1.0))


def test_stencil_symmetry():
    # Averaging stencils are symmetric; difference stencils antisymmetric.
    for k in (1, 2, 3):
        s0 = stencils.mfd_stencil(k, 0)
        s1 = stencils.mfd_stencil(k, 1)
        np.testing.assert_allclose(s0, s0[::-1], atol=1e-14)
        np.testing.assert_allclose(s1, -s1[::-1], atol=1e-14)


@pytest.mark.parametrize("n", [5, 8])
@pytest.mark.parametrize("k", [1, 2])
def test_circulant_symbol_vs_dense(n, k):
    """Symbol entries must be the eigenvalues of the explicit circulant,
    in DFT-frequency order: for the matrix C with C[r, (r+o) % n] = w_o,
    eigenvector v_f[j] = exp(-2 pi i f j / n) has eigenvalue
    sum_o w_o exp(-2 pi i f o / n)... verified numerically via similarity."""
    sten = stencils.mfd_stencil(k, 1)
    center = k
    c_mat = np.zeros((n, n), dtype=complex)
    for j in range(2 * k):
        o = j - (center - 1)
        for r in range(n):
            c_mat[r, (r + o) % n] += sten[j]
    lam = stencils.circulant_symbol(sten, center, n)
    # The DFT matrix diagonalizes any circulant; compare spectra as sets.
    got = np.linalg.eigvals(c_mat)
    for v in lam:
        assert np.min(np.abs(got - v)) < 1e-10


def test_circulant_symbol_frequency_order():
    """Pin the frequency convention: with F[f,j] = exp(-2 pi i f j / N),
    diag(F C F^{-1}) = symbol (C acts as convolution)."""
    n, k = 6, 1
    sten = stencils.mfd_stencil(k, 1)
    c_mat = np.zeros((n, n), dtype=complex)
    for j in range(2 * k):
        o = j - (k - 1)
        for r in range(n):
            c_mat[r, (r + o) % n] += sten[j]
    f = np.exp(-2j * np.pi * np.outer(np.arange(n), np.arange(n)) / n)
    diag = np.diag(f @ c_mat @ np.linalg.inv(f))
    np.testing.assert_allclose(diag, stencils.circulant_symbol(sten, k, n),
                               atol=1e-10)
