#!/usr/bin/env python
"""Produce pcx's three-N runtime table mirroring the reference's
``runtime_sc_curv.json`` (reference: paper_2/output/chiral/
runtime_sc_curv.json; driver paper_1_python/run_PCs_mfd.py:526-575).

Schema: {"pack_cmp_<N>": [iters, cpu_seconds, accel_seconds, speedup]}
  * iters / accel_seconds: pcx on the real TPU chip, warm-compiled timed
    solve at alpha=(pi,pi,pi) with the production lever stack — the same
    protocol as the reference's GPU column (their CUDA context is warm).
  * cpu_seconds: null unless --run-cpu.  This container exposes ONE CPU
    core; a complex128 N=100 solve alone takes >2000 s here and says
    nothing comparable to the reference's multicore CPU column, so the
    honest default is to omit it.
  * speedup: reference RTX-4090 seconds / pcx TPU seconds for the same N
    (NOT cpu/accel as in the reference file — their CPU column is from
    their machine; documented here and in BENCH_NOTES).

N=150 is attempted with the HBM-fit stack validated by
tools/tpu_n150_diag.py (rp_layout=cm, w_cap=8, apply_chunk=8); a device
OOM records null and the table still writes.

Usage: python tools/tpu_runtime_table.py [--ns 100 120 150]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

REF_GPU = {100: 13.745473623275757, 120: 24.230411529541016,
           150: 49.20356345176697}


def one_n(n: int, maxiter: int):
    import numpy as np
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.solvers.lobpcg import Status

    alpha = np.array([np.pi, np.pi, np.pi])
    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=10)
    opts = {"lam_tol": 2e-6, "floor_patience": 3, "col_patience": 3,
            "w_cap": "auto"}
    kw = {}
    if n >= 150:
        opts = {"rr_gram": "xla9", "w_cap": 8, "col_patience": 6,
                "rp_layout": "cm"}
        kw["apply_chunk"] = 8
    solver = KPointSolver(cfg, dtype=jnp.complex64, maxiter=maxiter,
                          solver_opts=opts, **kw)
    warm = solver.solve(alpha, seed=0, validate_result=False)
    print(f"# N={n} warmup: status={Status(warm.status).name} "
          f"iters={warm.iterations} t={warm.wall_time:.1f}s", flush=True)
    timed = solver.solve(alpha, seed=1, validate_result=False)
    rep = solver.validate_solution(alpha, timed, raise_on_spurious=False)
    import numpy as np
    dev = float(np.abs(rep.omega_pnt - rep.omega_re).max())
    print(f"# N={n} timed: status={Status(timed.status).name} "
          f"iters={timed.iterations} t={timed.wall_time:.2f}s "
          f"validation={dev:.2e}", flush=True)
    if timed.status not in (Status.CONVERGED, Status.FLOOR) or dev > 1e-3:
        raise RuntimeError(f"N={n} timed solve not validated "
                           f"(status {timed.status}, dev {dev:.2e})")
    return int(timed.iterations), float(timed.wall_time)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*", default=[100, 120, 150])
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--out",
                    default="output_c64/chiral/runtime_sc_curv.json")
    args = ap.parse_args()

    table = {}
    if os.path.exists(args.out):
        table = json.load(open(args.out))
    for n in args.ns:
        t0 = time.time()
        try:
            iters, secs = one_n(n, args.maxiter)
        except Exception as e:  # noqa: BLE001 — one N must not kill the table
            print(f"# N={n} FAILED after {time.time()-t0:.0f}s: "
                  f"{str(e)[:200]}", flush=True)
            table[f"pack_cmp_{n}"] = [None, None, None, None]
            continue
        table[f"pack_cmp_{n}"] = [
            float(iters), None, round(secs, 3),
            round(REF_GPU[n] / secs, 3) if n in REF_GPU else None]
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(table, f, indent=4)
        print(f"# wrote {args.out}: {table[f'pack_cmp_{n}']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
