"""Mathematical-property tests of the assembled Maxwell operator.

These are the pcx analog of the reference's check_sdd / check_component_HPD /
self-validation strategy (paper_2/paper_2_test.py:259-297, SURVEY.md section 4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pcx.config import ProblemConfig, TYPE_CHIRAL, TYPE_PSEUDO_TRIVIAL, TYPE_PSEUDO_CROSSDOF
from pcx.operators import maxwell
from pcx.operators import dielectric as diel_mod
from pcx.operators import symbols as sym
from pcx.operators.blocks import a_block, h_block

N = 6
ALPHA = np.array([np.pi, 0.3, 0.1])


def _dense(op, n):
    """Materialize a (3n^3, 3n^3) dense matrix from an operator on
    (1, 3, n, n, n) blocks."""
    d = 3 * n**3
    eye = np.eye(d, dtype=complex).reshape(d, 3, n, n, n)
    cols = np.asarray(op(jnp.asarray(eye))).reshape(d, d)
    return cols.T  # rows of the block are input basis vectors -> transpose


@pytest.mark.parametrize("diel_type", [TYPE_CHIRAL, TYPE_PSEUDO_TRIVIAL,
                                       TYPE_PSEUDO_CROSSDOF])
def test_penalized_operator_hermitian_pd(diel_type):
    cfg = ProblemConfig(n=N, lattice="sc_curv", diel_type=diel_type)
    prob = maxwell.assemble_problem(cfg, ALPHA)
    h = _dense(prob.h_apply, N)
    assert np.abs(h - h.conj().T).max() < 1e-10, "penalized operator not Hermitian"
    w = np.linalg.eigvalsh((h + h.conj().T) / 2)
    assert w.min() > -1e-10, f"not PSD: min eig {w.min()}"


def test_ama_hermitian_psd_with_kernel():
    """A M A^H is Hermitian PSD and has a nontrivial kernel (divergence
    subspace) — the penalty must remove it."""
    cfg = ProblemConfig(n=N, lattice="sc_curv", diel_type=TYPE_CHIRAL)
    prob = maxwell.assemble_problem(cfg, ALPHA)
    a = _dense(prob.a_apply, N)
    assert np.abs(a - a.conj().T).max() < 1e-10
    w = np.linalg.eigvalsh((a + a.conj().T) / 2)
    assert w.min() > -1e-8
    # Kernel dimension = N^3 (one divergence constraint per cell).
    n_zero = int(np.sum(w < 1e-8))
    assert n_zero == N**3, f"kernel dim {n_zero} != {N**3}"


def test_penalty_shifts_kernel_only():
    """Penalized and unpenalized operators agree on the physical
    (divergence-free) eigenspace: smallest nonzero eigenvalues of AMA^H
    are eigenvalues of AMA^H + pnt B^H B."""
    cfg = ProblemConfig(n=N, lattice="sc_curv", diel_type=TYPE_CHIRAL)
    prob = maxwell.assemble_problem(cfg, ALPHA)
    a = _dense(prob.a_apply, N)
    h = _dense(prob.h_apply, N) - prob.shift * np.eye(3 * N**3)
    wa = np.linalg.eigvalsh((a + a.conj().T) / 2)
    wh = np.linalg.eigvalsh((h + h.conj().T) / 2)
    wa_phys = wa[wa > 1e-8][:8]
    # Penalized spectrum must contain the physical eigenvalues.
    for lam in wa_phys:
        assert np.min(np.abs(wh - lam)) < 1e-8 * max(1.0, lam)


def test_preconditioner_is_exact_inverse():
    """P = (A A^H + pnt B^H B + shift)^{-1} exactly, in the vacuum case
    where M = I (then AMA^H = A A^H)."""
    cfg = ProblemConfig(n=N, lattice="sc_curv", diel_type=TYPE_CHIRAL)
    prob = maxwell.assemble_problem(cfg, ALPHA,
                                    diel=diel_mod.identity_op())
    h = _dense(prob.h_apply, N)
    p = _dense(prob.p_apply, N)
    np.testing.assert_allclose(p @ h, np.eye(3 * N**3), atol=1e-8)


@pytest.mark.parametrize("diel_type", [TYPE_PSEUDO_TRIVIAL, TYPE_PSEUDO_CROSSDOF])
def test_dielectric_hermitian_pd(diel_type):
    """The assembled eps^{-1} operator itself must be Hermitian PD
    (reference: check_component_HPD, paper_2_test.py:283-297)."""
    op = diel_mod.build(diel_type, N, "sc_curv", eps_opt=0)
    d = _dense(op, N)
    assert np.abs(d - d.conj().T).max() < 1e-12
    w = np.linalg.eigvalsh((d + d.conj().T) / 2)
    assert w.min() > 0, f"eps^-1 not PD: min eig {w.min()}"


def test_crossdof_matches_dense_kron_construction():
    """Cross-check the roll-based crossdof operator against an explicit dense
    assembly that follows the reference kron/restriction algebra verbatim
    (paper_2/discretization.py:403-453)."""
    from pcx import geometry, stencils
    from pcx.config import PSEUDOCHIRAL_EPS_LOC, CHIRAL_EPS_EG

    n, k = 4, 1
    lattice = "sc_curv"
    eps_loc = PSEUDOCHIRAL_EPS_LOC[0] / CHIRAL_EPS_EG[lattice]
    mask = geometry.edge_mask(n, lattice, cache=False)
    nn = n**3

    # Flat reference indexing: i + j*n + k*n^2 (i fastest).
    def flat_mask(c):
        return mask[c].transpose(2, 1, 0).reshape(-1)

    sten = stencils.mfd_stencil(k, 0)
    c_mat = np.zeros((n, n))
    for j in range(2 * k):
        o = j - (k - 1)
        for r in range(n):
            c_mat[r, (r + o) % n] += sten[j]
    eye = np.eye(n)
    # kron convention: slowest flat index (k) is the OUTER factor.
    t12 = np.kron(np.kron(c_mat, c_mat.T), eye)
    t13 = np.kron(np.kron(c_mat, eye), c_mat.T)
    t23 = np.kron(np.kron(eye, c_mat), c_mat.T)

    def m_of(t, rmask, cmask):
        r = np.diag(rmask.astype(float))
        c = np.diag(cmask.astype(float))
        return (r @ t + t @ c) / 2

    dx, dy, dz = flat_mask(0), flat_mask(1), flat_mask(2)
    m12 = m_of(t12, dx, dy)
    m13 = m_of(t13, dx, dz)
    m23 = m_of(t23, dy, dz)

    dense = np.zeros((3 * nn, 3 * nn), dtype=complex)
    diag = np.ones(3 * nn)
    diag[:nn][dx] = eps_loc[0].real
    diag[nn:2 * nn][dy] = eps_loc[1].real
    diag[2 * nn:][dz] = eps_loc[2].real
    dense += np.diag(diag)
    dense[:nn, nn:2 * nn] += eps_loc[3] * m12
    dense[nn:2 * nn, :nn] += np.conj(eps_loc[3]) * m12.T
    dense[:nn, 2 * nn:] += eps_loc[4] * m13
    dense[2 * nn:, :nn] += np.conj(eps_loc[4]) * m13.T
    dense[nn:2 * nn, 2 * nn:] += eps_loc[5] * m23
    dense[2 * nn:, nn:2 * nn] += np.conj(eps_loc[5]) * m23.T

    op = diel_mod.pseudochiral_crossdof_op(n, lattice, eps_opt=0, k=k,
                                           edge_mask=mask)
    got = _dense(op, n)
    # got is in (c, i, j, k) layout flattened C-order; dense is in reference
    # flat layout (c, k, j, i).  Permute got to reference layout.
    perm = np.arange(3 * nn).reshape(3, n, n, n).transpose(0, 3, 2, 1).reshape(-1)
    got_ref = got[np.ix_(perm, perm)]
    np.testing.assert_allclose(got_ref, dense, atol=1e-12)


def test_h_block_matches_dense():
    rng = np.random.default_rng(0)
    n = 3
    diag = jnp.asarray(rng.normal(size=(3, n, n, n)))
    sdiag = jnp.asarray(rng.normal(size=(3, n, n, n))
                        + 1j * rng.normal(size=(3, n, n, n)))
    x = jnp.asarray(rng.normal(size=(2, 3, n, n, n))
                    + 1j * rng.normal(size=(2, 3, n, n, n)))
    y = np.asarray(h_block(x, (diag, sdiag)))
    # Hermitian per grid point.
    for p in [(0, 0, 0), (1, 2, 0)]:
        m = np.array([
            [diag[0][p], sdiag[0][p], sdiag[1][p]],
            [np.conj(sdiag[0][p]), diag[1][p], sdiag[2][p]],
            [np.conj(sdiag[1][p]), np.conj(sdiag[2][p]), diag[2][p]],
        ])
        xv = np.array([x[0, c][p] for c in range(3)])
        np.testing.assert_allclose(np.array([y[0, c][p] for c in range(3)]),
                                   m @ xv, atol=1e-12)


def test_a_block_antisymmetric():
    rng = np.random.default_rng(1)
    n = 3
    d = jnp.asarray(rng.normal(size=(3, n, n, n))
                    + 1j * rng.normal(size=(3, n, n, n)))
    x = jnp.asarray(rng.normal(size=(1, 3, n, n, n))
                    + 1j * rng.normal(size=(1, 3, n, n, n)))
    y = np.asarray(a_block(x, d))
    p = (1, 0, 2)
    m = np.array([
        [0, -d[2][p], d[1][p]],
        [d[2][p], 0, -d[0][p]],
        [-d[1][p], d[0][p], 0],
    ])
    xv = np.array([x[0, c][p] for c in range(3)])
    np.testing.assert_allclose(np.array([y[0, c][p] for c in range(3)]),
                               m @ xv, atol=1e-12)


def test_plane_wave_block_divergence_free():
    """Plane-wave init columns are unit one-hot Fourier modes transverse to
    the curl symbol (exactly in the kernel of the penalty)."""
    from pcx.operators import maxwell
    from pcx.operators import symbols as sym
    from pcx.operators.blocks import h_block
    from pcx import lattices
    import jax.numpy as jnp

    n, m = 8, 6
    ct = lattices.ct_matrix("sc_curv")
    d, di = sym.curl_symbols(n, 1, ct)
    d_a = sym.shift_symbol(d, di, np.array([np.pi, 0, 0]))
    x0 = maxwell.plane_wave_block(d_a, m)
    assert x0.shape == (m, 3, n, n, n)
    norms = np.linalg.norm(np.asarray(x0).reshape(m, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    b = sym.penalty_symbol(jnp.asarray(d_a))
    bx = h_block(x0, b)
    assert float(jnp.abs(bx).max()) < 1e-10


def test_plane_wave_scatter_matches_host_build():
    """Device-side scatter build == host column selection semantics: each
    column is the selected one-hot polarization."""
    from pcx.operators import maxwell
    from pcx.operators import symbols as sym
    from pcx import lattices
    import jax.numpy as jnp

    n, m = 6, 5
    ct = lattices.ct_matrix("fcc")
    d, di = sym.curl_symbols(n, 1, ct)
    d_a = sym.shift_symbol(d, di, np.array([0.5, -0.2, 0.9]))
    idx, amps = maxwell.plane_wave_cols(d_a, m)
    assert idx.shape == (m,) and amps.shape == (m, 3)
    x0 = maxwell.plane_wave_scatter(jnp.asarray(idx), jnp.asarray(amps), n)
    flat = np.asarray(x0).reshape(m, 3, -1)
    for i in range(m):
        np.testing.assert_allclose(flat[i, :, idx[i]], amps[i], atol=1e-14)
        rest = np.delete(flat[i], idx[i], axis=1)
        assert np.abs(rest).max() == 0.0


def test_fourier_upsample_exact_and_real_preserving():
    """upsample_mat/resample3: exact trigonometric interpolation for
    band-limited periodic fields (any nc -> n, odd and even), and real
    inputs stay real (even-nc Nyquist split)."""
    from pcx.operators import dft
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for nc, n in [(6, 9), (8, 12), (5, 10)]:
        # random spectrum supported strictly inside the coarse band
        spec = np.zeros((2, n, n, n), np.complex128)
        lo = (nc - 1) // 2  # max safely representable |frequency|
        for _ in range(20):
            kx, ky, kz = rng.integers(-lo, lo + 1, size=3)
            spec[:, kx, ky, kz] = rng.normal(size=2) + 1j * rng.normal(size=2)
        fine = np.fft.ifftn(spec, axes=(1, 2, 3))
        coarse = fine[:, :: n // nc, :: n // nc, :: n // nc] \
            if n % nc == 0 else None
        if coarse is None:
            # non-integer ratio: sample the series directly on the nc grid
            spec_c = np.zeros((2, nc, nc, nc), np.complex128)
            for kx in range(-lo, lo + 1):
                for ky in range(-lo, lo + 1):
                    for kz in range(-lo, lo + 1):
                        spec_c[:, kx, ky, kz] = spec[:, kx, ky, kz]
            coarse = np.fft.ifftn(spec_c, axes=(1, 2, 3)) * (nc / n) ** 3
        u = dft.upsample_mat(nc, n, dtype=np.complex128)
        got = np.asarray(dft.resample3(jnp.asarray(coarse), jnp.asarray(u)))
        np.testing.assert_allclose(got, fine, atol=1e-12)

    # real in -> real out (Nyquist split keeps conjugate symmetry)
    xr = rng.normal(size=(2, 8, 8, 8))
    u = dft.upsample_mat(8, 20, dtype=np.complex128)
    got = np.asarray(dft.resample3(jnp.asarray(xr + 0j), jnp.asarray(u)))
    assert np.abs(got.imag).max() < 1e-12
