"""Smoke + correctness tests for the experiment runners at tiny N
(the pcx analog of the reference's manual ablation suite, SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcx.experiments import ablations, precision, structure
from pcx import plotting

N = 8
ALPHA = np.array([np.pi, np.pi, np.pi])


def test_tol_cmp_invariance():
    out = ablations.tol_cmp(N, "sc_curv", [1e-3, 1e-5], alpha=ALPHA,
                            nev=4, verbose=False)
    # Tighter tolerance must not change frequencies beyond the loose tol.
    np.testing.assert_allclose(out["omega_re"][0], out["omega_re"][1],
                               atol=2e-3)
    assert out["iters"][1][0] >= out["iters"][0][0]


def test_grid_cmp_monotone_effort():
    out = ablations.grid_cmp([6, 8], "sc_curv", alpha=ALPHA, nev=4,
                             verbose=False)
    assert np.isfinite(out["omega_re"]).all()


def test_eps_cmp_frequencies_decrease_with_eps():
    out = ablations.eps_cmp(N, "sc_curv", [5.0, 13.0], alpha=ALPHA, nev=4,
                            verbose=False)
    # Higher dielectric constant lowers the band frequencies.
    assert out["omega_re"][1][0] < out["omega_re"][0][0]


def test_scal_cmp_invariance():
    out = ablations.scal_cmp(N, "sc_curv", [1.0, 2.0], alpha=ALPHA, nev=4,
                             verbose=False)
    np.testing.assert_allclose(out["omega_re"][0], out["omega_re"][1],
                               atol=2e-4)


def test_global_precision_cmp():
    out = precision.global_precision_cmp(N, "sc_curv", alpha=ALPHA, nev=4,
                                         verbose=False)
    assert out["omega_diff"].max() < 1e-4


def test_partial_precision_cmp():
    out = precision.partial_precision_cmp(N, "sc_curv", alpha=ALPHA, nev=4,
                                          verbose=False)
    assert out["omega_diff"].max() < 1e-5


def test_eigenvector_uniqueness():
    out = structure.eigenvector_cmp(10, "sc_curv", alpha=ALPHA, nev=3,
                                    verbose=False)
    for l_diff, x_diff, r, _ in out:
        assert l_diff < 1e-5
        # Eigenvector unique up to phase: |z| ~ 1 and |x1*z - x2| small
        # (degenerate pairs may mix; allow them).
        if x_diff < 0.5:
            assert abs(r - 1.0) < 0.1


def test_edge_volume_census_small():
    out = structure.edge_volume_index_cmp(12, "sc_curv", verbose=False)
    nn = 12**3
    # Edge/volume mismatch is a small fraction (reference: ~1% at N=100).
    assert all(m / nn < 0.2 for m in out)


def test_dmat_cmp_trivial_vs_crossdof():
    rep = structure.dmat_cmp(4, ("pseudochiral_trivial",
                                 "pseudochiral_crossdof"),
                             lattice="sc_curv", verbose=False)
    # The constructions differ but only in off-diagonal coupling, with a
    # small spectral radius (reference conclusion of dmat_cmp).
    assert rep["nnz"] > 0
    assert rep["spectral_radius"] < 1.0
    # Power-method estimate agrees with the dense spectral radius.
    assert abs(rep["spectral_radius_pm"] - rep["spectral_radius"]) < 0.05


def test_check_sdd_matches_dense():
    from pcx.operators import dense as dense_mod
    from pcx.operators import dielectric as diel_mod
    n = 4
    op = diel_mod.build("pseudochiral_crossdof", n, "sc_curv")
    n_free = op.sdd_violations()
    mat = dense_mod.materialize(op, n)
    n_dense = dense_mod.check_sdd_dense(mat, verbose=False)
    assert n_free == n_dense


def test_check_component_hpd():
    eig_s = structure.check_component_hpd(4, verbose=False)
    assert eig_s[0] > 0


def test_smooth_eps_operator():
    from pcx.operators import dielectric as diel_mod
    op = diel_mod.smooth_eps_op(6)
    x = jnp.ones((1, 3, 6, 6, 6), jnp.complex128)
    y = np.asarray(op(x))
    assert y.shape == x.shape
    assert (y.real > 1 / 22.0).all() and (y.real < 1 / 4.0).all()


def test_bandgap_plotting(tmp_path):
    """Gap ratio + diagram from a reference golden library."""
    ratio, omgs = plotting.plot_bandgap(
        120, "sc_curv", output_dir="/root/reference/paper_2/output",
        save_path=str(tmp_path / "band.png"), verbose=False)
    assert (tmp_path / "band.png").exists()
    assert 0 < omgs[0] < omgs[1]


def test_compute_bandgap_simple():
    freqs = np.array([[0.1, 0.2, 0.5, 0.6], [0.15, 0.25, 0.55, 0.65]])
    omgs = plotting.compute_bandgap(freqs)
    np.testing.assert_allclose(omgs, [0.25, 0.5])
    assert plotting.gap_ratio(omgs) == pytest.approx(2 * 0.25 / 0.75)


def test_bandgap_pseudo_cmp_on_reference_goldens():
    """Statistical trivial-vs-crossdof comparison consuming the reference's
    committed band libraries directly (paper_2_test.py:299-337)."""
    stats = structure.bandgap_pseudo_cmp(
        120, "fcc", eps_opt=0,
        output_dir="/root/reference/paper_2/output", verbose=False)
    # Paper conclusion: the two discretizations agree to ~1e-2 relative.
    assert stats["mean"] < 0.05
    assert stats["iter_means"]["pseudochiral_crossdof"] > 0


def test_pack_cmp_smoke(tmp_path):
    from pcx.experiments import runtime
    out = runtime.pack_cmp(ns=[8], lattice="sc_flat1", nev=4,
                           run_cpu=False, verbose=False,
                           output_path=str(tmp_path / "runtime.json"))
    rec = out["sc_flat1_8"]
    assert rec[0] > 0 and rec[2] > 0
    assert (tmp_path / "runtime.json").exists()
