#!/usr/bin/env python
"""Post-recovery TPU diagnostic: isolate whether solve faults are
data-dependent (near-Gamma k-point) or infrastructural.

Runs in one process: (1) known-good mid-path solve, (2) bounded near-Gamma
solve, (3) full near-Gamma solve — the first sweep point that faulted."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

import jax.numpy as jnp
from pcx.bandstructure import KPointSolver
from pcx.config import ProblemConfig
from pcx.solvers.lobpcg import Status


def attempt(tag, solver, alpha, **kw):
    t0 = time.time()
    try:
        r = solver.solve(np.asarray(alpha, float), seed=0,
                         validate_result=False, **kw)
        print(f"[{tag}] OK status={Status(r.status).name} "
              f"iters={r.iterations} t={r.wall_time:.2f}s "
              f"(total {time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"[{tag}] FAIL after {time.time()-t0:.0f}s: "
              f"{str(e)[:200]}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = ProblemConfig(n=120, lattice="sc_curv", nev=10)

    s_full = KPointSolver(cfg, dtype=jnp.complex64)
    ok1 = attempt("mid-path [pi,0,0]", s_full, [np.pi, 0, 0])

    s_short = KPointSolver(cfg, dtype=jnp.complex64, maxiter=80)
    ok2 = attempt("near-Gamma maxiter=80", s_short, [np.pi / 20, 0, 0])

    ok3 = attempt("near-Gamma full", s_full, [np.pi / 20, 0, 0])

    print(f"RESULT: mid={ok1} nearG80={ok2} nearGfull={ok3}", flush=True)
    sys.exit(0 if (ok1 and ok3) else 3)


if __name__ == "__main__":
    main()
