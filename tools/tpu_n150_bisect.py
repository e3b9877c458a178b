#!/usr/bin/env python
"""Bisect the N=150 compile-time HBM OOM (bench_matrix row sc_curv_chiral_150).

The failed compile (bench_logs/bench_matrix.log) shows 18.77G needed vs
15.75G HBM, dominated by four 1.8G f32[48, D] temps — the stacked [X|W|P]
Rayleigh-Ritz Gram concatenations (lobpcg_rs stacked path) plus their
padded copies.  Candidate fixes, tried in order on one solve each:

  1. rr_gram=xla9      concat-free blockwise Gram (divisor chunks, no pads)
  2. rr_gram=pallas    streaming Pallas gram9 (no concat either)
  3. xla9 + XLA fuses  (rp_fuse/dft_fuse off, in case the Pallas kernels'
                       VMEM staging is the marginal 3G)

First variant that compiles AND validates writes the missing
sc_curv_chiral_150 row (reps=2, same protocol as tools/bench_matrix.py).
"""

import json
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

ALPHA = np.array([np.pi, 0.0, 0.0])
BASELINE = 49.20  # RTX-4090, runtime_sc_curv.json:14-19 (pack_cmp_150)

VARIANTS = [
    ("xla9", {"rr_gram": "xla9"}),
    # xla9 + a static W/P width cap: besides the Gram concats, each
    # iteration materializes svqb temporaries of the full (16, D) W and P
    # blocks (~1.3 GB each at N=150); w_cap=8 halves every W/P-sized
    # temp for more iterations (test_rs_w_cap_compacted_converges), and
    # col_patience lets columns lock at their c64 floor so the smaller
    # bucket loses little in practice.
    ("xla9_wcap8", {"rr_gram": "xla9", "w_cap": 8, "col_patience": 6}),
    ("gram_pallas", {"rr_gram": "pallas"}),
    ("xla9_nofuse", {"rr_gram": "xla9", "rp_fuse": "xla",
                     "dft_fuse": "xla"}),
]


def try_variant(name, opts, reps=2, maxiter=500):
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.solvers.lobpcg import Status

    cfg = ProblemConfig(n=150, lattice="sc_curv", diel_type="chiral", nev=10)
    solver = KPointSolver(cfg, dtype=jnp.complex64, maxiter=maxiter,
                          solver_opts=dict(opts))
    r = solver.solve(ALPHA, seed=0, validate_result=False)
    print(f"#   [{name}] warmup: {Status(r.status).name} "
          f"iters={r.iterations} t={r.wall_time:.2f}s", flush=True)
    times, iters = [], []
    for i in range(reps):
        r = solver.solve(ALPHA, seed=i + 1, validate_result=False)
        if r.status not in (Status.CONVERGED, Status.FLOOR, Status.MAXITER):
            raise RuntimeError(f"status {Status(r.status).name}")
        times.append(r.wall_time)
        iters.append(int(r.iterations))
        print(f"#   [{name}] rep {i}: {r.wall_time:.3f}s "
              f"iters={r.iterations}", flush=True)
    rep = solver.validate_solution(ALPHA, r)
    dev = float(np.abs(rep.omega_pnt - rep.omega_re).max())
    if dev > 1e-3:
        raise RuntimeError(f"spurious: dev={dev:.2e}")
    value = float(min(times))
    return {"row": "sc_curv_chiral_150", "lattice": "sc_curv",
            "diel": "chiral", "n": 150, "seconds": round(value, 3),
            "iters": iters[-1], "validation": float(f"{dev:.3e}"),
            "baseline_gpu_s": BASELINE,
            "vs_baseline": round(BASELINE / value, 3),
            "solver_opts": dict(opts)}


def main():
    out = "bench_logs/bench_matrix.jsonl"
    print("devices:", jax.devices(), flush=True)
    for name, opts in VARIANTS:
        print(f"# === n150 variant {name} {opts} "
              f"[{time.strftime('%H:%M:%S')}] ===", flush=True)
        try:
            rec = try_variant(name, opts)
        except Exception as e:
            msg = str(e)
            print(f"# VARIANT FAILED {name}: {msg[:500]}", flush=True)
            # A compile failure doesn't wedge the device session, but give
            # the helper a breather before the next attempt.
            time.sleep(60)
            continue
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        return 0
    print("# ALL VARIANTS FAILED", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
