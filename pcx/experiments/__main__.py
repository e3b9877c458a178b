"""Run ablation/structural experiments from the command line.

Replaces the reference's edit-the-main-function workflow for the test
modules (README.md:134, paper_1_test.py / paper_2_test.py) with:

    python -m pcx.experiments tol_cmp --n 16 --lattice sc_curv --values 1e-3,1e-5
    python -m pcx.experiments grid_cmp --values 8,12,16
    python -m pcx.experiments check_sdd --n 8
    python -m pcx.experiments precision_test --values 16,32,64
    python -m pcx.experiments pack_cmp --values 32,48
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pcx.experiments", description=__doc__)
    ap.add_argument("name", help="experiment name (see module docstring)")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--lattice", default="sc_curv")
    ap.add_argument("--nev", type=int, default=10)
    ap.add_argument("--eps-opt", type=int, default=0)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--alpha", default="1,1,1", help="units of pi")
    ap.add_argument("--values", default=None,
                    help="comma-separated sweep values (tols, Ns, ...)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--output", default="output")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from pcx.experiments import ablations, precision, structure, runtime

    alpha = np.array([float(v) for v in args.alpha.split(",")]) * np.pi
    vals = ([v for v in args.values.split(",")] if args.values else None)
    fvals = [float(v) for v in vals] if vals else None
    ivals = [int(float(v)) for v in vals] if vals else None

    name = args.name
    if name == "tol_cmp":
        ablations.tol_cmp(args.n, args.lattice, fvals or [1e-3, 1e-4, 1e-5],
                          alpha=alpha, nev=args.nev)
    elif name == "pnt_cmp":
        ablations.pnt_cmp(args.n, args.lattice, fvals or [0.5, 1.0, 2.0],
                          alpha=alpha, nev=args.nev)
    elif name == "rela_cmp":
        ablations.rela_cmp(args.n, args.lattice, fvals or [0.3, 0.6, 1.0],
                           alpha=alpha, nev=args.nev)
    elif name == "scal_cmp":
        ablations.scal_cmp(args.n, args.lattice, fvals or [1.0, 2.0],
                           alpha=alpha, nev=args.nev)
    elif name == "eps_cmp":
        ablations.eps_cmp(args.n, args.lattice, fvals or [5.0, 13.0, 16.0],
                          alpha=alpha, nev=args.nev)
    elif name == "grid_cmp":
        ablations.grid_cmp(ivals or [8, 16, 24], args.lattice, alpha=alpha,
                           nev=args.nev)
    elif name == "library_cmp":
        ablations.library_cmp(args.n, args.lattice, alpha=alpha)
    elif name == "global_precision_cmp":
        precision.global_precision_cmp(args.n, args.lattice, alpha=alpha,
                                       nev=args.nev)
    elif name == "partial_precision_cmp":
        precision.partial_precision_cmp(args.n, args.lattice, alpha=alpha,
                                        nev=args.nev)
    elif name == "precision_test":
        precision.precision_test(ivals or (16, 32, 64), args.lattice,
                                 alpha=alpha, nev=args.nev, k=args.k or 5)
    elif name == "largek_smooth_cmp":
        precision.largek_smooth_cmp(ivals or (16, 32, 64), k=args.k or 5)
    elif name == "eigenvector_cmp":
        structure.eigenvector_cmp(args.n, args.lattice, alpha=alpha,
                                  nev=args.nev)
    elif name == "largek_cmp":
        structure.largek_cmp(ivals or [32, 64], args.lattice, alpha=alpha)
    elif name == "edge_volume_index_cmp":
        structure.edge_volume_index_cmp(args.n, args.lattice)
    elif name == "dmat_cmp":
        structure.dmat_cmp(args.n, ("pseudochiral_trivial",
                                    "pseudochiral_crossdof"),
                           lattice=args.lattice, k=args.k)
    elif name == "check_sdd":
        structure.check_sdd(args.n, k=args.k, lattice=args.lattice,
                            eps_opt=args.eps_opt)
    elif name == "check_component_hpd":
        structure.check_component_hpd(args.n, k=args.k,
                                      eps_opt=args.eps_opt)
    elif name == "bandgap_pseudo_cmp":
        structure.bandgap_pseudo_cmp(args.n, args.lattice,
                                     eps_opt=args.eps_opt,
                                     output_dir=args.output)
    elif name == "compute_extreme_case":
        structure.compute_extreme_case(args.n, args.lattice,
                                       output_dir=args.output)
    elif name == "pack_cmp":
        runtime.pack_cmp(ivals or [32, 48], args.lattice, nev=args.nev,
                         output_path=f"{args.output}/runtime_{args.lattice}.json")
    else:
        print(f"unknown experiment {name!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
