"""Geometry mask tests, incl. exact parity with the reference's committed
DoF-index fixtures (paper_2/dielectric_examples/*.bin)."""

import os

import numpy as np
import pytest

from pcx import geometry, lattices

REF_DIEL = "/root/reference/paper_2/dielectric_examples"


def test_edge_mask_shape_and_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(geometry, "CACHE_DIR", str(tmp_path))
    m1 = geometry.edge_mask(8, "sc_flat1")
    assert m1.shape == (3, 8, 8, 8) and m1.dtype == bool
    # Cache round-trip.
    m2 = geometry.edge_mask(8, "sc_flat1")
    np.testing.assert_array_equal(m1, m2)


def test_volume_mask_shape(tmp_path, monkeypatch):
    monkeypatch.setattr(geometry, "CACHE_DIR", str(tmp_path))
    m = geometry.volume_mask(8, "sc_curv")
    assert m.shape == (8, 8, 8) and m.dtype == bool
    assert 0 < m.sum() < m.size


def test_indices_roundtrip():
    rng = np.random.default_rng(3)
    mask = rng.random((3, 5, 5, 5)) < 0.3
    ind = geometry.mask_to_indices(mask)
    back = geometry.indices_to_mask(ind, 5, "edge")
    np.testing.assert_array_equal(mask, back)
    assert np.all(np.diff(ind) > 0)


@pytest.mark.skipif(not os.path.exists(f"{REF_DIEL}/edge_dofs/sc_flat1_100.bin"),
                    reason="reference fixture not available")
def test_edge_indices_match_reference_fixture_sc_flat1():
    """Exact parity with the committed reference index cache
    (paper_2/dielectric_examples/edge_dofs/sc_flat1_100.bin)."""
    ref = np.fromfile(f"{REF_DIEL}/edge_dofs/sc_flat1_100.bin", dtype=np.int64)
    mask = geometry.edge_mask(100, "sc_flat1", cache=False)
    got = geometry.mask_to_indices(mask)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_array_equal(got, np.sort(ref))


@pytest.mark.parametrize("flag", ["fcc", "bcc_dg", "sc_curv"])
@pytest.mark.skipif(not os.path.exists(f"{REF_DIEL}/volume_dofs/fcc_120.bin"),
                    reason="reference fixture not available")
def test_volume_indices_match_reference_fixture(flag):
    ref = np.fromfile(f"{REF_DIEL}/volume_dofs/{flag}_120.bin", dtype=np.int64)
    mask = geometry.volume_mask(120, flag, cache=False)
    got = geometry.mask_to_indices(mask)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_array_equal(got, np.sort(ref))


def test_all_flags_nonempty():
    for flag in geometry.FLAG_REGISTRY:
        m = geometry.edge_mask(16, flag, cache=False)
        frac = m.mean()
        assert 0.0 < frac < 1.0, f"{flag}: fill fraction {frac}"


def test_ct_transform_applied():
    """bcc/fcc masks must differ from the untransformed evaluation."""
    n = 12
    mask_t = geometry.edge_mask(n, "fcc", cache=False)
    ct_id = np.eye(3)
    flag = geometry.FLAG_REGISTRY["fcc"]
    mask_u = np.stack([
        flag(*geometry._transform(geometry.edge_coords(n, c), ct_id))
        for c in range(3)
    ])
    assert (mask_t != mask_u).any()


def test_native_engine_parity():
    """C++/OpenMP geometry engine produces bit-identical masks to numpy."""
    from pcx import native
    if not native.available():
        pytest.skip("native geometry library not built")
    for flag in geometry.FLAG_REGISTRY:
        m_nat = geometry.edge_mask(9, flag, cache=False, use_native=True)
        m_py = geometry.edge_mask(9, flag, cache=False, use_native=False)
        np.testing.assert_array_equal(m_nat, m_py)
        v_nat = geometry.volume_mask(9, flag, cache=False, use_native=True)
        v_py = geometry.volume_mask(9, flag, cache=False, use_native=False)
        np.testing.assert_array_equal(v_nat, v_py)
