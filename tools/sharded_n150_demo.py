#!/usr/bin/env python
"""N=150 grid-sharded solve on a virtual CPU mesh — the memory-scaling
leg of SURVEY.md section 5.7 (VERDICT r3 item 3 fallback): N=150
(3*150^3 = 10.1M complex DoFs) exceeds one v5e chip's HBM for the full
LOBPCG state (runtime RESOURCE_EXHAUSTED, bench_logs/n150_diag.log), so
the single-k-point path that NEEDS more than one chip is the grid
(TP/SP) axis.  This runs solve_kpoint_sharded at N=150/c64 over
Mesh(grid=6) on virtual CPU devices for a few iterations: evidence the
sharded program compiles, executes, and iterates finitely at this scale.
(Convergence parity of the sharded path is pinned separately at N=64:
max_rel_dev 1.6e-9, bench_logs/sharded_demo.jsonl.)

grid=6 because 150 = 2*3*5^3 — the pencil decomposition needs the shard
axis to divide N (8 does not).

CPU-pinned: safe to run during a TPU campaign.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=6")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # never touch the tunnel
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def main(n=150, nev=6, m=8, tol=1e-4, maxiter=3):
    from jax.sharding import Mesh
    from pcx.bandstructure import KPointSolver
    from pcx.config import CHIRAL_EPS_EG, ProblemConfig
    from pcx.operators import maxwell
    from pcx.parallel.solve import solve_kpoint_sharded
    from pcx import geometry

    alpha = np.array([np.pi, 0.0, 0.0])
    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=nev)
    solver = KPointSolver(cfg, dtype=jnp.complex64)
    d_a, b, inv, shift = solver.symbols_for(alpha)
    x0 = maxwell.random_block(jax.random.PRNGKey(0), n, m, jnp.complex64)

    mesh = Mesh(np.array(jax.devices()[:6]).reshape(6), ("grid",))
    mask = geometry.edge_mask(n, "sc_curv")
    scale = jnp.asarray(
        np.where(mask, 1.0 / CHIRAL_EPS_EG["sc_curv"], 1.0), jnp.float32)
    t0 = time.time()
    r = solve_kpoint_sharded(mesh, d_a, b, inv, scale, shift, x0, nev,
                             tol=tol, maxiter=maxiter)
    lam = np.asarray(r.lambdas, np.float64)[:nev] - float(shift)
    t = time.time() - t0
    from pcx.utils import sqrt_robust
    omega = [float(sqrt_robust(v) * cfg.scal / (2 * np.pi)) for v in lam]
    rec = {"demo": "sharded_n150", "n": n, "nev": nev, "m": m,
           "mesh": "grid=6 (virtual CPU)", "dtype": "complex64",
           "iters": int(r.iterations), "status": int(r.status),
           "seconds": round(t, 1),
           "lambdas": [float(f"{v:.6g}") for v in lam],
           "omega": [float(f"{v:.6g}") for v in omega],
           "finite": bool(np.isfinite(lam).all())}
    os.makedirs("bench_logs", exist_ok=True)
    with open("bench_logs/sharded_demo.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    assert rec["finite"], lam
    assert int(r.iterations) >= min(maxiter, 2) - 1
    return rec


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxiter", type=int, default=3,
                    help="3 = compile-and-iterate demo; ~200 with "
                         "--tol 1e-4 runs the solve to CONVERGENCE on the "
                         "virtual mesh (hours on this 1-core host)")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--nev", type=int, default=6)
    a = ap.parse_args()
    main(nev=a.nev, m=a.m, tol=a.tol, maxiter=a.maxiter)
