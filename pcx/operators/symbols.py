"""Fourier symbols of the discrete curl / divergence-penalty operators.

The uniform periodic grid makes every stencil matrix block-circulant, hence
diagonal in the 3-D DFT basis.  This module builds those diagonals ("symbols")
as (3, N, N, N) arrays in natural C layout with broadcasting — replacing the
reference's flat 3N^3 vectors assembled with tile/repeat
(paper_2/discretization.py:301-346).

Symbol conventions (axis a of the grid carries frequency index f_a):

* ``D1[axis a]``  — symbol of the staggered first difference along axis a,
* ``D0[axis a]``  — symbol of the staggered averaging along axis a,
* curl symbol     ``D_A[c] = sum_j CT[c,j] * D1[axis j] + i*alpha_c*D0[axis c]``
  (k-shift baked in, reference: discretization.py:338-341),
* penalty         ``B = (|D_A[c]|^2, conj(D_A[a]) D_A[b])``
  (reference: discretization.py:343-344).

The closed-form Hermitian 3x3 block inverse (reference:
discretization.py:224-295) gives the preconditioner symbol
``(A A^H + pnt B^H B + shift)^{-1}`` with zero FFTs per application.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np

import jax.numpy as jnp

from pcx import stencils
from pcx.config import SCAL


class HermSymbol(NamedTuple):
    """Hermitian 3x3 block symbol: diag (3,N,N,N) + sdiag (3,N,N,N) = (d12,d13,d23)."""
    diag: jnp.ndarray
    sdiag: jnp.ndarray


def _bcast(vec: np.ndarray, axis: int) -> np.ndarray:
    """Reshape a length-N vector so it broadcasts along grid axis 0/1/2 of
    an (N, N, N) array."""
    shape = [1, 1, 1]
    shape[axis] = vec.shape[0]
    return vec.reshape(shape)


def curl_symbols(n: int, k: int, ct: np.ndarray, scal: float = SCAL,
                 dtype=np.complex128) -> Tuple[np.ndarray, np.ndarray]:
    """k-independent symbol parts (D, Di), each (3, N, N, N) complex.

    D[c]  = sum_j CT[c,j] * D1[axis j]   (curl part),
    Di[c] = D0[axis c]                   (to be scaled by i*alpha_c).
    Reference: paper_2/discretization.py:301-335 (alpha=None branch).
    """
    h = scal / n
    d1 = stencils.symbol_1d(n, k, 1, h)
    d0 = stencils.symbol_1d(n, k, 0)

    d_axes = [_bcast(d1, a) for a in range(3)]
    d = np.zeros((3, n, n, n), dtype=dtype)
    di = np.zeros((3, n, n, n), dtype=dtype)
    for c in range(3):
        acc = (ct[c][0] * d_axes[0] + ct[c][1] * d_axes[1] + ct[c][2] * d_axes[2])
        d[c] = acc
        di[c] = _bcast(d0, c)
    return d, di


def shift_symbol(d: np.ndarray, di: np.ndarray, alpha, scal: float = SCAL):
    """Apply the k-point shift: D_A[c] = D[c] + i*(alpha_c/scal)*Di[c]
    (reference: discretization.py:337-341, numerical_experiments.py:434-436)."""
    alpha = np.asarray(alpha, dtype=np.float64) / scal
    xp = jnp if isinstance(d, jnp.ndarray) else np
    return d + 1j * alpha[:, None, None, None] * di


def penalty_symbol(d_a) -> HermSymbol:
    """B^H B block symbol from the curl symbol
    (reference: discretization.py:343-344)."""
    xp = jnp if isinstance(d_a, jnp.ndarray) else np
    diag = (d_a.conj() * d_a).real
    sdiag = xp.stack((
        d_a[0].conj() * d_a[1],
        d_a[0].conj() * d_a[2],
        d_a[1].conj() * d_a[2],
    ))
    return HermSymbol(diag, sdiag)


def inverse_3x3_block(diag, sdiag, shift: float = 0.0,
                      hermitian: bool = True) -> HermSymbol:
    """Closed-form inverse of a Hermitian 3x3 block symbol (adjugate/det).

    Reference: paper_2/discretization.py:224-270.
    """
    xp = jnp if isinstance(diag, jnp.ndarray) else np
    d0, d1, d2 = diag[0] + shift, diag[1] + shift, diag[2] + shift
    s0, s1, s2 = sdiag[0], sdiag[1], sdiag[2]

    det = (d0 * d1 * d2
           - (d0 * (s2 * s2.conj()) + d1 * (s1 * s1.conj()) + d2 * (s0 * s0.conj()))
           + 2 * (s0 * s2 * s1.conj()).real)

    f_diag = xp.stack((
        (d1 * d2 - s2 * s2.conj()) / det,
        (d0 * d2 - s1 * s1.conj()) / det,
        (d0 * d1 - s0 * s0.conj()) / det,
    ))
    if hermitian:
        f_diag = f_diag.real

    f_sdiag = xp.stack((
        (s1 * s2.conj() - s0 * d2) / det,
        (s0 * s2 - s1 * d1) / det,
        (s1 * s0.conj() - d0 * s2) / det,
    ))
    return HermSymbol(f_diag, f_sdiag)


def inverse_penalized(b: HermSymbol, pnt: float, shift: float = 0.0) -> HermSymbol:
    """Symbol of (A A^H + pnt * B^H B + shift)^{-1}.

    Given the penalty symbol B (diag |D_c|^2, sdiag conj(D_a) D_b), the
    operator A A^H + pnt B^H B has diagonal entries
    pnt*|D_c|^2 + sum_{c' != c} |D_c'|^2 and off-diagonals (pnt-1)*sdiag.
    Reference: paper_2/discretization.py:284-295.
    """
    xp = jnp if isinstance(b.diag, jnp.ndarray) else np
    b0, b1, b2 = b.diag[0], b.diag[1], b.diag[2]
    diag = xp.stack((
        pnt * b0 + b1 + b2,
        b0 + pnt * b1 + b2,
        b0 + b1 + pnt * b2,
    ))
    sdiag = (pnt - 1.0) * b.sdiag
    return inverse_3x3_block(diag, sdiag, shift=shift, hermitian=True)


def inverse_gram(d_a, shift: float = 1.0) -> HermSymbol:
    """Symbol of (A A^H + shift)^{-1} — the curl-only preconditioner
    (reference: discretization.py:272-282)."""
    xp = jnp if isinstance(d_a, jnp.ndarray) else np
    ds = (d_a.conj() * d_a).real
    diag = xp.stack((ds[1] + ds[2], ds[0] + ds[2], ds[0] + ds[1]))
    sdiag = xp.stack((
        -d_a[0].conj() * d_a[1],
        -d_a[0].conj() * d_a[2],
        -d_a[1].conj() * d_a[2],
    ))
    return inverse_3x3_block(diag, sdiag, shift=shift, hermitian=True)
