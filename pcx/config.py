"""Configuration: global defaults, precision policy, problem/solver configs.

Replaces the module-level constants + edit-the-main workflow of the reference
(paper_2/environment.py:23-55, numerical_experiments.py:498-513) with explicit
dataclasses and registries (no string ``eval`` dispatch).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Sequence

import numpy as np

# ---------------------------------------------------------------------------
# Global defaults (reference: paper_2/environment.py:23-32).
# ---------------------------------------------------------------------------

K = 1          # Stencil half-width (accuracy order 2K).
NEV = 10       # Number of desired eigenpairs.
SCAL = 1.0     # Lattice scaling constant.
TOL = 1e-4     # LOBPCG residual tolerance.
GAP = 20       # Points per Brillouin-zone path segment.

MAXITER = 500
RESTART_MAX = 100
N_SUBSPACE = 40

# Lattice type names (reference: paper_2/environment.py:35-40).
SC_F1 = "sc_flat1"
SC_F2 = "sc_flat2"
SC_C = "sc_curv"
BCC_SG = "bcc_sg"
BCC_DG = "bcc_dg"
FCC = "fcc"

ALL_LATTICES = (SC_F1, SC_F2, SC_C, BCC_SG, BCC_DG, FCC)

# Dielectric ("chiroptical") types (reference: paper_2/environment.py:43-46).
TYPE_CHIRAL = "chiral"
TYPE_PSEUDO_TRIVIAL = "pseudochiral_trivial"
TYPE_PSEUDO_CROSSDOF = "pseudochiral_crossdof"
TYPE_PSEUDO_CROSSDOF2 = "pseudochiral_crossdof2"

# Isotropic dielectric constants per lattice
# (reference: paper_2/environment.py:49).
CHIRAL_EPS_EG = {
    SC_F1: 13.0,
    SC_F2: 13.0,
    SC_C: 13.0,
    BCC_SG: 16.0,
    BCC_DG: 16.0,
    FCC: 13.0,
}

# Hermitian positive-definite 3x3 tensors stored as 6 components
# (d11, d22, d33, d12, d13, d23) (reference: paper_2/environment.py:52-55).
PSEUDOCHIRAL_EPS_LOC = [
    np.array([(1 + 0.875**2) ** 0.5, (1 + 0.875**2) ** 0.5, 1.0,
              -1j * 0.875, 0.0, 0.0]),
    np.array([(1 + 0.875**2) ** 0.5, 1.0, (1 + 0.875**2) ** 0.5,
              0.0, 1j * 0.875, 0.0]),
    np.array([1.0346, 0.5059, 0.2595,
              -0.0163 - 0.2319j, 0.027 + 0.0827j, -0.2743 - 0.0076j]),
    np.array([3.0, 3.0, 3.0,
              np.sqrt(3) + 1j, 1j, np.sqrt(2) * (1 + 1j)]) / 5.0,
]


# ---------------------------------------------------------------------------
# Precision policy.
# ---------------------------------------------------------------------------

class Precision(enum.Enum):
    """Numerical precision policy for the solve.

    The reference is complex128 end-to-end with an optional complex64
    preconditioner (paper_2/lobpcg.py:494-629).  On TPU, f64 is emulated and
    slow, so the production path is SINGLE: complex64 iterate with a
    numerically hardened Rayleigh-Ritz (column normalization + Cholesky-QR).
    """

    DOUBLE = "double"          # complex128 everywhere (CPU tests / parity).
    SINGLE = "single"          # complex64 everywhere (TPU production).
    MIXED = "mixed"            # complex128 iterate, complex64 preconditioner
                               # (reference mixed scheme, lobpcg.py:494-629).

    @property
    def complex_dtype(self):
        import jax.numpy as jnp
        return jnp.complex128 if self is Precision.DOUBLE or self is Precision.MIXED else jnp.complex64

    @property
    def real_dtype(self):
        import jax.numpy as jnp
        return jnp.float64 if self is Precision.DOUBLE or self is Precision.MIXED else jnp.float32

    @property
    def precond_complex_dtype(self):
        import jax.numpy as jnp
        return jnp.complex128 if self is Precision.DOUBLE else jnp.complex64


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """LOBPCG solver configuration (reference kwargs, lobpcg.py:325-350)."""

    nev: int = NEV
    tol: float = TOL
    maxiter: int = MAXITER
    precision: Precision = Precision.DOUBLE
    # Soft-locking: zero-out converged W/P columns via masked Rayleigh-Ritz
    # (fixed-shape analog of reference column compaction, lobpcg.py:429-437).
    locking: bool = True
    # Extra block columns ratio; m = nev + round(rlx * nev)
    # (reference: discretization.py:31-49 "opt[1]" = 0.6).
    rlx: float = 0.6
    # Orthonormalize W, P columns before Rayleigh-Ritz.  Not in the reference;
    # essential for complex64 stability on TPU.
    normalize_basis: bool = True
    # Stagnation guard (reference: lobpcg.py:408-415).
    maxstagniter: int = 50
    history: bool = False


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """One Maxwell eigenproblem instance."""

    n: int                                   # Grid size N (DoFs = 3N^3).
    lattice: str = SC_C                      # Lattice flag name.
    diel_type: str = TYPE_CHIRAL             # Dielectric operator type.
    eps_opt: int = 0                         # Preset index for pseudochiral.
    k: int = K                               # Stencil half-width.
    scal: float = SCAL                       # Lattice scaling constant.
    nev: int = NEV

    def __post_init__(self):
        if self.lattice is not None and self.lattice not in ALL_LATTICES:
            raise ValueError(f"Unknown lattice {self.lattice!r}; "
                             f"expected one of {ALL_LATTICES}.")


def set_relaxation(alpha: Sequence[float], scal: float = SCAL):
    """Spectral shift, block-relaxation ratio, and penalty gamma.

    Reference: paper_2/discretization.py:31-49.  Returns ((shift, rlx), pnt).
    The shift guarantees non-singularity at the Gamma point; the penalty
    gamma ("pnt") weights the divergence penalty B'B.
    """
    nrm_alpha = float(np.linalg.norm(np.asarray(alpha) / scal))
    if nrm_alpha > 1:
        opt = (0.0, 0.6)
        pnt = 4 * np.pi * np.pi
    elif nrm_alpha == 0:
        opt = (1.0 / np.pi, 0.6)
        pnt = 4 * np.pi * np.pi
    else:
        opt = (nrm_alpha, 0.6)
        pnt = (2 * np.pi / nrm_alpha) ** 2
    return opt, pnt


def block_width(nev: int, rlx: float = 0.6) -> int:
    """LOBPCG block width m = nev + round(rlx * nev)
    (reference: numerical_experiments.py:64)."""
    return nev + round(nev * rlx)
