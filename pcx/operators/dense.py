"""Dense materialization + structural checks of operators at small N.

Used by the structural experiments (dmat_cmp, check_sdd, HPD checks —
reference: paper_2/paper_2_test.py:233-297) and by tests.  Dense forms are
only feasible for small N; the SDD census also has a matrix-free variant
via absolute-value row sums.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def materialize(op, n: int, dtype=complex) -> np.ndarray:
    """(3n^3, 3n^3) dense matrix of an operator acting on (1, 3, n, n, n)
    blocks (columns = images of basis vectors)."""
    d = 3 * n**3
    eye = np.eye(d, dtype=dtype).reshape(d, 3, n, n, n)
    cols = np.asarray(op(jnp.asarray(eye))).reshape(d, d)
    return cols.T


def dense_diff_report(m1: np.ndarray, m2: np.ndarray, names=("A", "B"),
                      verbose: bool = True):
    """Entrywise comparison of two operator matrices + spectral radius of
    the difference (reference: dmat_cmp, paper_2_test.py:233-257)."""
    diff = m1 - m2
    nz = np.abs(diff[np.abs(diff) > 0])
    out = {
        "size": m1.shape[0],
        "nnz": int(nz.size),
        "fro": float(np.linalg.norm(diff)),
        "max_nz": float(nz.max()) if nz.size else 0.0,
        "min_nz": float(nz.min()) if nz.size else 0.0,
        "spectral_radius": float(np.abs(np.linalg.eigvals(diff)).max())
        if nz.size else 0.0,
    }
    if verbose:
        print(f"{names[0]} vs {names[1]}: size = {out['size']}, "
              f"nnz = {out['nnz']}, fro = {out['fro']:<6.3e}, "
              f"max_nz = {out['max_nz']:<6.3e}, "
              f"rho = {out['spectral_radius']:<6.3e}.")
    return out


def check_sdd_dense(mat: np.ndarray, verbose: bool = True) -> int:
    """Count rows violating strict diagonal dominance
    (reference: check_sdd, paper_2_test.py:259-269)."""
    diag = np.abs(np.diag(mat)).real
    offsum = np.sum(np.abs(mat), axis=1) - diag
    n_bad = int(np.sum(diag.real <= offsum))
    if verbose:
        print(f"SDD not satisfied n_row = {n_bad}.")
    return n_bad
