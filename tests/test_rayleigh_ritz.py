"""Unit tests of the TPU-safe dense-algebra kernels (rayleigh_ritz)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcx.solvers import rayleigh_ritz as rr


def _rand_herm(p, rng, degenerate=False):
    a = rng.normal(size=(p, p)) + 1j * rng.normal(size=(p, p))
    h = (a + a.conj().T) / 2
    if degenerate:
        w, v = np.linalg.eigh(h)
        w[1] = w[0]            # exact 2-fold degeneracy
        w[4] = w[3] = w[2]     # exact 3-fold degeneracy
        h = (v * w) @ v.conj().T
        h = (h + h.conj().T) / 2
    return h


def test_eigh_f64_embedding_basic(rng):
    h = _rand_herm(12, rng)
    w, vr, vi = rr.eigh_f64_embedding(jnp.asarray(h.real), jnp.asarray(h.imag))
    want = np.linalg.eigvalsh(h)
    np.testing.assert_allclose(np.asarray(w), want, atol=1e-9)
    v = np.asarray(vr) + 1j * np.asarray(vi)
    # Orthonormal eigenvectors, correct residuals.
    np.testing.assert_allclose(v.conj().T @ v, np.eye(12), atol=1e-9)
    np.testing.assert_allclose(h @ v, v * np.asarray(w), atol=1e-8)


def test_eigh_f64_embedding_degenerate(rng):
    """Exact degeneracies: the graded perturbation keeps the even-index
    pair selection sound (eigenvectors stay complex-linearly independent)."""
    h = _rand_herm(10, rng, degenerate=True)
    w, vr, vi = rr.eigh_f64_embedding(jnp.asarray(h.real), jnp.asarray(h.imag))
    v = np.asarray(vr) + 1j * np.asarray(vi)
    # Within exactly-degenerate clusters the graded split (1e-10) vs the
    # f64 eigh backward error leaves ~1e-5 mixing between pair partners -
    # harmless (any orthobasis of the cluster is valid); require it small.
    np.testing.assert_allclose(v.conj().T @ v, np.eye(10), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w), np.linalg.eigvalsh(h),
                               atol=1e-7)
    np.testing.assert_allclose(h @ v, v * np.asarray(w), atol=1e-4)


def test_gram_f64_beats_f32(rng):
    """Chunked-f64 Gram of complex64 blocks is far more accurate than the
    plain f32 Gram over a long axis."""
    p, d = 8, 400_000
    x = (rng.normal(size=(p, d)) + 1j * rng.normal(size=(p, d)))
    want = (x.conj() @ x.T)
    x32 = jnp.asarray(x.astype(np.complex64))
    g32 = np.asarray(rr.gram(x32, x32))
    re, im = rr.gram_f64(x32, x32)
    g64 = np.asarray(re) + 1j * np.asarray(im)
    # The inputs are rounded to c64, so ~1e-7 relative error is the floor;
    # the chunked-f64 version must sit at that floor.  (On CPU, XLA already
    # accumulates f32 dots widely, so only assert it never does worse.)
    err32 = np.abs(g32 - want).max() / np.abs(want).max()
    err64 = np.abs(g64 - want).max() / np.abs(want).max()
    assert err64 < 1e-7
    assert err64 <= err32


def test_masked_loewdin_orthonormal(rng):
    p, d = 6, 5000
    x = jnp.asarray((rng.normal(size=(p, d)) + 1j * rng.normal(size=(p, d)))
                    .astype(np.complex64))
    mask = jnp.asarray([1, 1, 0, 1, 1, 0], jnp.float32)
    x = x * mask[:, None].astype(x.dtype)
    q, _ = rr.masked_loewdin(x, mask, 1e-6)
    g = np.asarray(rr.gram(q, q))
    want = np.diag(np.asarray(mask))
    np.testing.assert_allclose(g, want, atol=2e-5)



def test_project_off(rng):
    p, d = 4, 3000
    basis = jnp.asarray(rng.normal(size=(p, d)) + 1j * rng.normal(size=(p, d)))
    basis, _ = rr.masked_loewdin(basis, jnp.ones(p), 1e-14)
    block = jnp.asarray(rng.normal(size=(2, d)) + 1j * rng.normal(size=(2, d)))
    out, _ = rr.project_off(block, basis)
    g = np.asarray(rr.gram(basis, out))
    np.testing.assert_allclose(g, 0, atol=1e-10)


def test_masked_mgs_twice_is_enough_on_noise_columns():
    """A column that is 99.99% inside span(X) must come out orthonormal
    after 2 passes — single-pass MGS can leave such columns nearly parallel,
    which the identity-Gram Rayleigh-Ritz turns into below-spectrum phantom
    eigenvalues (observed at N=120 complex64 on TPU)."""
    import numpy as np
    import jax.numpy as jnp
    from pcx.solvers import rayleigh_ritz as rr

    rng = np.random.default_rng(5)
    m, d = 6, 4096
    x = rng.standard_normal((m, d)) + 1j * rng.standard_normal((m, d))
    x = np.asarray(rr.masked_mgs(jnp.asarray(x, jnp.complex64),
                                 jnp.ones(m, jnp.float32), 1e-6)[0])
    # w: almost inside span(x) + tiny independent noise
    w = (x[:3] * np.array([[1.0], [1.0], [1.0]])
         + 1e-4 * (rng.standard_normal((3, d))
                   + 1j * rng.standard_normal((3, d)))).astype(np.complex64)
    for passes in (1, 2):
        q, _, ok = rr.masked_mgs(jnp.asarray(w), jnp.ones(3, jnp.float32),
                                 1e-7, against=(jnp.asarray(x),),
                                 passes=passes)
        q = np.asarray(q)[np.asarray(ok) > 0]
        if len(q) == 0:
            continue
        g = q @ q.conj().T
        basis_err = np.abs(g - np.eye(len(q))).max()
        cross = np.abs(q @ np.asarray(x).conj().T).max()
        if passes == 2:
            assert basis_err < 5e-6, basis_err
            assert cross < 5e-6, cross
