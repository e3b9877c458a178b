"""Precision & convergence-order studies.

Reference: paper_2/paper_2_test.py:22-84 (global/partial precision),
:363-401 (precision_test order study), paper_1_test.py:272-303 (full-FP32).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp

from pcx import validate
from pcx.bandstructure import KPointSolver
from pcx.config import NEV, ProblemConfig

_PI = np.pi
DEFAULT_ALPHA = np.array([_PI, _PI, _PI])


def global_precision_cmp(n: int, lattice: str, alpha=DEFAULT_ALPHA,
                         nev: int = NEV, verbose: bool = True):
    """Full double vs full single precision solve
    (reference: global_precision_cmp, paper_2_test.py:22-55)."""
    cfg = ProblemConfig(n=n, lattice=lattice, nev=nev)
    r64 = KPointSolver(cfg, dtype=jnp.complex128).solve(alpha, seed=0)
    r32 = KPointSolver(cfg, dtype=jnp.complex64).solve(alpha, seed=0)
    l_diff = np.abs(r64.omega_re - r32.omega_re)
    if verbose:
        print(f"Double: ({r64.iterations}, {r64.wall_time:<6.3f}s).")
        print(f"Single: ({r32.iterations}, {r32.wall_time:<6.3f}s).")
        for i in range(nev):
            print(f"i = {i + 1:<4d}, omega_diff = {l_diff[i]:<6.3e}")
    return {"double": r64, "single": r32, "omega_diff": l_diff}


def partial_precision_cmp(n: int, lattice: str, alpha=DEFAULT_ALPHA,
                          nev: int = NEV, verbose: bool = True):
    """Double iterate with single-precision preconditioner (the reference's
    validated mixed scheme, lobpcg.py:494-629 / paper_2_test.py:57-84)."""
    import jax
    from pcx.operators import maxwell
    from pcx.operators.blocks import h_block
    from pcx.solvers import lobpcg as lob

    cfg = ProblemConfig(n=n, lattice=lattice, nev=nev)
    solver = KPointSolver(cfg, dtype=jnp.complex128)
    full = solver.solve(alpha, seed=0)

    d_a, b, inv, shift = solver.symbols_for(alpha)
    inv32 = (inv.diag.astype(jnp.float32), inv.sdiag.astype(jnp.complex64))
    m = solver.block_width(alpha)
    x0 = maxwell.random_block(jax.random.PRNGKey(0), n, m, jnp.complex128)
    h = lambda v: maxwell.ama_bb(v, d_a, b, solver.diel, shift)
    p32 = lambda v: h_block(v.astype(jnp.complex64), inv32).astype(
        jnp.complex128)
    res = jax.jit(lambda x: lob.lobpcg_sep(h, p32, x, nev))(x0)
    rep = validate.recompute(np.asarray(res.lambdas)[:nev], res.x[:nev],
                             lambda v: maxwell.ama(v, d_a, solver.diel),
                             shift=shift)
    diff = np.abs(rep.omega_re - full.omega_re)
    if verbose:
        print(f"Full double:   iters = {full.iterations}")
        print(f"Mixed precond: iters = {int(res.iterations)}")
        print(f"max omega diff = {diff.max():<6.3e}")
    return {"full": full, "mixed_iters": int(res.iterations),
            "omega_diff": diff}


def precision_test(ns: Sequence[int] = (16, 32, 64, 128),
                   lattice: str = "sc_curv", alpha=DEFAULT_ALPHA,
                   diel_type: str = "pseudochiral_crossdof", k: int = 5,
                   nev: int = NEV, dtype=jnp.complex128,
                   verbose: bool = True):
    """Grid-refinement order study at high stencil order
    (reference: precision_test, paper_2_test.py:363-401)."""
    freqs = {}
    iters = {}
    for n in ns:
        cfg = ProblemConfig(n=n, lattice=lattice, diel_type=diel_type,
                            nev=nev, k=k)
        solver = KPointSolver(cfg, dtype=dtype)
        r = solver.solve(alpha, seed=0)
        freqs[n] = r.omega_re
        iters[n] = (r.iterations, r.wall_time)
        if verbose:
            print(f"n = {n}, iterations = {r.iterations}, "
                  f"runtime = {r.wall_time:<5.2f}s.")
    if verbose:
        print("\nPrecision results:")
        ns_l = list(ns)
        for i in range(nev):
            diffs = [abs(freqs[ns_l[j + 1]][i] - freqs[ns_l[j]][i])
                     for j in range(len(ns_l) - 1)]
            line = ", ".join(f"{d:<10.2e}" for d in diffs)
            if len(diffs) >= 2 and diffs[-1] > 0:
                order = np.log(diffs[0] / diffs[-1]) / np.log(2) / (len(ns_l) - 2)
            else:
                order = float("nan")
            print(f"{i + 1:<4d}: {line}, average order = {order:<6.2f}.")
    return freqs, iters


def largek_smooth_cmp(ns: Sequence[int] = (16, 32, 64, 128),
                      k: int = 5, nev: int = 8, dtype=jnp.complex128,
                      verbose: bool = True):
    """Order study with a SMOOTH dielectric and high-order stencils, where
    the full stencil order is observable
    (reference: largek_smooth_cmp, paper_2_test.py:146-190)."""
    import jax
    from pcx.operators import dielectric as diel_mod
    from pcx.bandstructure import KPointSolver

    alpha = DEFAULT_ALPHA
    freqs = {}
    for n in ns:
        cfg = ProblemConfig(n=n, lattice="sc_curv", nev=nev, k=k)
        diel = diel_mod.smooth_eps_op(n)
        solver = KPointSolver(cfg, dtype=dtype, diel=diel)
        r = solver.solve(alpha, seed=0)
        freqs[n] = r.omega_re
        if verbose:
            print(f"N = {n} is done computing ({r.iterations} iters).")
    if verbose:
        validate.observed_order(freqs)
    return freqs
