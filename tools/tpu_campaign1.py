#!/usr/bin/env python
"""TPU campaign phase 1: validate round-2 code on the chip, then A/B the
auto column-chunked apply at N=120 against the unchunked apply.

Writes progress lines to stdout (run under tee/tmux)."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
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

ALPHA = np.array([np.pi, 0.0, 0.0])


def phase(name):
    print(f"\n=== {name} [{time.strftime('%H:%M:%S')}] ===", flush=True)


def one(cfg, reps=2, warm=True, **kw):
    solver = KPointSolver(cfg, dtype=jnp.complex64, **kw)
    r = solver.solve(ALPHA, seed=0, validate_result=False)
    print(f"  warmup: {Status(r.status).name} iters={r.iterations} "
          f"t={r.wall_time:.2f}s", flush=True)
    times = []
    for i in range(reps):
        r = solver.solve(ALPHA, seed=i + 1, validate_result=False)
        times.append(r.wall_time)
        print(f"  rep {i}: {r.wall_time:.3f}s iters={r.iterations} "
              f"{Status(r.status).name}", flush=True)
    rep = solver.validate_solution(ALPHA, r)
    dev = float(np.abs(rep.omega_pnt - rep.omega_re).max())
    print(f"  validation dev={dev:.2e} omega={np.round(rep.omega_re, 5)}",
          flush=True)
    return min(times), dev, r


def main():
    print("devices:", jax.devices(), flush=True)

    phase("A: N=32 validation (new dev-symbol path + plane-wave start)")
    t, dev, _ = one(ProblemConfig(n=32, lattice="sc_curv", nev=10))
    assert dev < 1e-3, dev

    phase("A2: N=32 random start (iteration comparison)")
    one(ProblemConfig(n=32, lattice="sc_curv", nev=10), reps=1,
        x0_mode="random")

    phase("B1: N=120 auto chunk (chunk=4)")
    t_auto, dev, _ = one(ProblemConfig(n=120, lattice="sc_curv", nev=10))
    assert dev < 1e-3, dev

    phase("B2: N=120 unchunked")
    t_full, dev, _ = one(ProblemConfig(n=120, lattice="sc_curv", nev=10),
                         apply_chunk=0)
    assert dev < 1e-3, dev

    print(json.dumps({"n120_auto_chunk_s": round(t_auto, 3),
                      "n120_unchunked_s": round(t_full, 3)}), flush=True)


if __name__ == "__main__":
    main()
