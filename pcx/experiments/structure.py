"""Structural / mathematical-property experiments.

Reference: paper_2/paper_2_test.py:87-361 — eigenvector uniqueness, large-k
convergence, edge/volume index census, D-matrix cross-validation, SDD and
HPD checks, band-library statistics, the extreme anisotropic case.
"""

from __future__ import annotations

import cmath
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pcx import geometry
from pcx.bandstructure import KPointSolver
from pcx.config import NEV, ProblemConfig
from pcx.io import load_reference_band_json
from pcx.operators import dense as dense_mod
from pcx.operators import dielectric as diel_mod
from pcx.solvers import lobpcg as lob
from pcx.solvers.rayleigh_ritz import power_method

_PI = np.pi
DEFAULT_ALPHA = np.array([_PI, _PI, _PI])


def eigenvector_cmp(n: int, lattice: str, alpha=DEFAULT_ALPHA,
                    nev: int = NEV, verbose: bool = True):
    """Eigenvector uniqueness up to a unit complex phase across different
    random starts (reference: eigenvector_cmp, paper_2_test.py:87-116).
    Uses the random cold start explicitly — the study's premise is
    INDEPENDENT starting subspaces, which the deterministic plane-wave
    default would defeat."""
    cfg = ProblemConfig(n=n, lattice=lattice, nev=nev)
    solver = KPointSolver(cfg, dtype=jnp.complex128, x0_mode="random")
    r1 = solver.solve(alpha, seed=0)
    r2 = solver.solve(alpha, seed=123)
    out = []
    x1 = np.asarray(r1.x).reshape(r1.x.shape[0], -1)
    x2 = np.asarray(r2.x).reshape(r2.x.shape[0], -1)
    for i in range(nev):
        z = x2[i, 0] / x1[i, 0]
        r, c = abs(z), cmath.phase(z)
        x_diff = np.linalg.norm(x1[i] * z - x2[i])
        l_diff = abs(r1.omega_re[i] - r2.omega_re[i])
        out.append((l_diff, x_diff, r, c))
        if verbose:
            print(f"i = {i + 1:<4d}, omega_diff = {l_diff:<6.2e}, "
                  f"x_diff = {x_diff:<6.2e}, <x1,x2> = ({r:<6.2f}, "
                  f"{c / _PI:<6.2f}pi).")
    return out


def largek_cmp(ns: Sequence[int], lattice: str = "sc_curv",
               alpha=DEFAULT_ALPHA, dtype=jnp.complex128,
               verbose: bool = True):
    """High-order stencil convergence with the N-matched order policy
    k(N) = round(16.30 ln(N-10) - 58.12)
    (reference: largek_cmp, paper_2_test.py:118-144)."""
    n2k = lambda n: max(1, round(16.30 * np.log(n - 10) - 58.12))
    results = []
    for n in ns:
        k = n2k(n)
        cfg = ProblemConfig(n=n, lattice=lattice, nev=4, k=k)
        solver = KPointSolver(cfg, dtype=dtype)
        r = solver.solve(alpha, seed=0)
        results.append(r.omega_re[2])
        if verbose:
            print(f"N = {n} (k = {k}) is done computing.")
    henka = np.abs(np.diff(np.asarray(results)))
    if verbose:
        for h in henka:
            print(f"{h:<6.3e}")
    return np.asarray(results), henka


def edge_volume_index_cmp(n: int, lattice: str = "sc_curv",
                          verbose: bool = True):
    """Census of edge-vs-volume DoF membership mismatches
    (reference: edge_volume_index_cmp, paper_2_test.py:197-231)."""
    em = geometry.edge_mask(n, lattice)
    vm = geometry.volume_mask(n, lattice)
    nn = n**3
    mismatches = [int(np.sum(em[c] != vm)) for c in range(3)]
    if verbose:
        for c, label in enumerate("xyz"):
            print(f"Number/Ratio of different {label}-edge and volume "
                  f"indices: {mismatches[c]}, {mismatches[c] / nn:<6.3e}.")
        print("When volume index is True,")
        for i1 in (0, 1):
            for i2 in (0, 1):
                for i3 in (0, 1):
                    cnt = int(np.sum(vm & (em[0] == i1) & (em[1] == i2)
                                     & (em[2] == i3)))
                    print(f"({i1},{i2},{i3}), number = {cnt}.")
        ee = [int(np.sum(em[0] != em[1])), int(np.sum(em[0] != em[2])),
              int(np.sum(em[2] != em[1]))]
        print(f"Number of different edge-edge indices: {ee}.")
    return mismatches


def dmat_cmp(n: int, types: Sequence[str], lattice: str = "sc_curv",
             k: int = 1, verbose: bool = True):
    """Entrywise + spectral comparison of two eps^{-1} operator
    constructions (reference: dmat_cmp, paper_2_test.py:233-257).
    Dense at this (small) N; the operator difference norm is also bounded
    matrix-free by the power method."""
    op1 = diel_mod.build(types[0], n, lattice, k=k)
    op2 = diel_mod.build(types[1], n, lattice, k=k)
    m1 = dense_mod.materialize(op1, n)
    m2 = dense_mod.materialize(op2, n)
    report = dense_mod.dense_diff_report(m1, m2, types, verbose=verbose)

    diff_op = lambda v: op1(v) - op2(v)
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, (1, 3, n, n, n))
          + 1j * jax.random.normal(jax.random.PRNGKey(1), (1, 3, n, n, n)))
    gram_op = lambda v: diff_op(diff_op(v))  # (D1-D2)^H (D1-D2), Hermitian
    rho, _, _ = power_method(gram_op, x0, maxiter=200, tol=1e-6)
    report["spectral_radius_pm"] = float(rho) ** 0.5
    if verbose:
        print(f"Spectrum radius (power method) = {report['spectral_radius_pm']:<6.3e}.")
    return report


def check_sdd(n: int, k: int = 1, lattice: str = "sc_curv",
              diel_type: str = "pseudochiral_crossdof", eps_opt: int = 0,
              verbose: bool = True) -> int:
    """Strict-diagonal-dominance census of the eps^{-1} operator,
    matrix-free (reference: check_sdd / check_pseudochiral_crossdof_sdd,
    paper_2_test.py:259-281)."""
    op = diel_mod.build(diel_type, n, lattice, eps_opt=eps_opt, k=k)
    n_bad = op.sdd_violations()
    if verbose:
        print(f"SDD not satisfied n_row = {n_bad}.")
    return n_bad


def check_component_hpd(n: int, k: int = 1, eps_opt: int = 0,
                        lattice: str = "sc_curv", verbose: bool = True):
    """Smallest eigenvalues of the assembled eps^{-1} operator must be
    positive (reference: check_component_HPD, paper_2_test.py:283-297)."""
    op = diel_mod.build("pseudochiral_crossdof", n, lattice, eps_opt=eps_opt,
                        k=k)
    d = 3 * n**3

    def h_vec(v):
        return op(v.reshape(3, n, n, n)).reshape(-1)

    res = lob.lobpcg_default((h_vec, d), nev=2, rlx=4, maxiter=300)
    eig_s = np.asarray(res.lambdas)[:2]
    if verbose:
        print(f"Smallest eigenvalues of eps^-1: {eig_s} "
              f"({'HPD' if eig_s[0] > 0 else 'NOT PD'}).")
    return eig_s


def condition_number(op, n: int, verbose: bool = True) -> float:
    """Condition number via extreme eigenvalues
    (reference: condition_number, numerical_experiments.py:160-177)."""
    d = 3 * n**3
    h_func = lambda blk: op(blk)
    key = jax.random.PRNGKey(0)
    from pcx.operators import maxwell
    x0 = maxwell.random_block(key, n, 6, jnp.complex128)
    small = lob.lobpcg_sep_softlock(h_func, lambda v: v, x0, 2, tol=1e-6,
                                    maxiter=300)
    large = lob.lobpcg_sep_max(h_func, x0, 2, tol=1e-6, maxiter=300)
    cond = float(np.asarray(large.lambdas)[0] / np.asarray(small.lambdas)[0])
    if verbose:
        print(f"Condition number: {cond:<6.3f}.")
    return cond


def bandgap_pseudo_cmp(n: int, lattice: str, eps_opt: int = 0,
                       output_dir: str = "output", verbose: bool = True):
    """Statistical comparison of trivial vs crossdof band libraries
    (reference: bandgap_pseudo_cmp, paper_2_test.py:299-337)."""
    # The reference's comparison files always carry the eps_opt suffix
    # (paper_2_test.py:305-307).
    suffix = str(eps_opt)
    fq, it = {}, {}
    for t in ("chiral", "pseudochiral_trivial", "pseudochiral_crossdof"):
        path = f"{output_dir}/{t}/bandgap_{lattice}{suffix}.json"
        fq[t], it[t] = load_reference_band_json(path, lattice, n)
    f1 = fq["pseudochiral_trivial"]
    f2 = fq["pseudochiral_crossdof"]
    sel = np.abs(f2) > 1e-5
    fq_diff = np.abs(f1[sel] - f2[sel]) / f2[sel]
    stats = {
        "max": float(np.max(fq_diff)),
        "min": float(np.min(fq_diff)),
        "mean": float(np.mean(fq_diff)),
        "iter_means": {t: float(np.mean(it[t][:, 0])) for t in it},
        "iter_stds": {t: float(np.std(it[t][:, 0])) for t in it},
    }
    if verbose:
        print(f"max = {stats['max']:<6.3e}, min = {stats['min']:<6.3e}, "
              f"mean = {stats['mean']:<6.3e}.")
        print(f"Average iterations: {stats['iter_means']}")
        print(f"Deviation: {stats['iter_stds']}")
    return stats


def compute_extreme_case(n: int, lattice: str = "sc_curv",
                         diel_type: str = "pseudochiral_trivial",
                         nev: int = NEV, seed: int = 7,
                         output_dir: Optional[str] = None,
                         verbose: bool = True):
    """Extreme anisotropic eps with eigenvalue spread 16x..256x and a
    random unitary conjugation; tight tolerance, long history
    (reference: compute_extreme_case, paper_2_test.py:339-361)."""
    alpha = np.array([_PI / 7, 3 * _PI / 5, 4 * _PI / 13])
    rng = np.random.default_rng(seed)
    d = np.diag([1 / 16, 1 / 64, 1 / 256])
    u, _ = np.linalg.qr(rng.random((3, 3)) + 1j * rng.random((3, 3)))
    e = u @ d @ u.conj().T
    eps_mat = np.array([e[0, 0].real, e[1, 1].real, e[2, 2].real,
                        e[0, 1], e[0, 2], e[1, 2]])

    cfg = ProblemConfig(n=n, lattice=lattice, diel_type=diel_type, nev=nev)
    diel = diel_mod.build(diel_type, n, lattice, eps_mat=eps_mat)
    solver = KPointSolver(cfg, dtype=jnp.complex128, tol=1e-9, maxiter=10000,
                          diel=diel)
    r = solver.solve(alpha, seed=seed)
    if verbose:
        print(f"Extreme case: {lattice}, {diel_type}, n={n}, "
              f"iterations = {r.iterations}, runtime = {r.wall_time:<6.3f}s.")
    if output_dir:
        import os
        os.makedirs(f"{output_dir}/{diel_type}", exist_ok=True)
        np.array([r.iterations, r.wall_time]).tofile(
            f"{output_dir}/{diel_type}/info_{lattice}.bin")
    return r
