"""Interpret-mode correctness tests of the Pallas fused multi-Gram kernel
(TPU microbenchmarks pending hardware; see pcx/operators/pallas_kernels.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcx.operators.pallas_kernels import fused_gram9
from pcx.solvers import rayleigh_ritz as rr


def test_fused_gram9_matches_blockwise(rng):
    m, d = 4, 5000
    def blk():
        return jnp.asarray((rng.normal(size=(m, d))
                            + 1j * rng.normal(size=(m, d))).astype(np.complex64))
    x, w, p, hx, hw, hp = (blk() for _ in range(6))
    t_re, t_im = fused_gram9(x, w, p, hx, hw, hp, chunk=1024, interpret=True)

    want = np.zeros((3 * m, 3 * m), complex)
    for i, a in enumerate((x, w, p)):
        for j, b in enumerate((hx, hw, hp)):
            re, im = rr.gram_f64(a, b)
            want[i*m:(i+1)*m, j*m:(j+1)*m] = np.asarray(re) + 1j*np.asarray(im)
    got = np.asarray(t_re) + 1j * np.asarray(t_im)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_gram9_padding(rng):
    m, d = 3, 1537  # not a multiple of chunk
    def blk():
        return jnp.asarray((rng.normal(size=(m, d))
                            + 1j * rng.normal(size=(m, d))).astype(np.complex64))
    x, w, p, hx, hw, hp = (blk() for _ in range(6))
    t_re, t_im = fused_gram9(x, w, p, hx, hw, hp, chunk=512, interpret=True)
    re, im = rr.gram_f64(x, hx)
    np.testing.assert_allclose(np.asarray(t_re)[:m, :m], np.asarray(re),
                               rtol=1e-5, atol=1e-4)


def test_rr_gram_pallas_solver_end_to_end():
    """solver_opts={'rr_gram': 'pallas'} routes the production solver's
    Rayleigh-Ritz Gram through the fused Pallas kernel (interpret mode on
    CPU) and reproduces the XLA-Gram solve."""
    import numpy as np
    import jax.numpy as jnp
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig

    cfg = ProblemConfig(n=8, lattice="sc_curv", nev=4)
    alpha = np.array([np.pi, 0.2, 0.0])
    kw = dict(dtype=jnp.complex128, solver_impl="rs", real_boundary=True,
              refine=False)
    r_x = KPointSolver(cfg, **kw).solve(alpha, seed=3)
    r_p = KPointSolver(cfg, solver_opts={"rr_gram": "pallas"},
                       **kw).solve(alpha, seed=3)
    assert r_p.status in (1, 5)
    np.testing.assert_allclose(r_p.omega_re, r_x.omega_re, atol=5e-9)
