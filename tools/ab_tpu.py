#!/usr/bin/env python
"""A/B microbench of the Pallas hot-path kernels on the real TPU
(VERDICT round-1 item 4: measure the fused kernels' effect on ms/iter,
or commit a negative result with numbers).

Variants, all SC-CURV chiral N=<n> single k-point, same seeds:
  base        — production defaults (XLA-fused jnp)
  gram_pallas — solver_opts {"rr_gram": "pallas"} (fused 9-Gram streaming)
  rp_pallas   — solver_opts {"rp_fuse": "pallas"} (fused residual+precond)
  both        — both kernels on

Each variant: 1 warmup solve + --reps timed solves; reports min wall,
iterations, ms/iter, and max |omega - omega_base| as a correctness check.
Appends JSONL to --out (resumable).  ONE process (tunnel warmup).
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if "--cpu-smoke" in sys.argv:
    # Pin the CPU platform BEFORE any array op: the axon plugin ignores
    # JAX_PLATFORMS and would attach to (and wedge) the exclusive tunnel.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

import jax.numpy as jnp

ALPHA = np.array([np.pi, 0.0, 0.0])

VARIANTS = [
    # NOTE (round 2): rp_fuse+dft_fuse Pallas became the accelerator
    # DEFAULT after the 19:15 A/B (bench_logs/ab_tpu2.jsonl, -9% ms/iter),
    # so "base" now means both fuses ON and "no_fuse" is the old base.
    # Ordered safest-first: an unsupported-Mosaic-feature wedge on the
    # tunneled backend poisons every later variant in the process, so the
    # all-f32 kernels run before the f64-accumulating gram9.
    ("base", {}),
    ("no_fuse", {"rp_fuse": "xla", "dft_fuse": "xla"}),
    ("dft_pallas", {"rp_fuse": "xla", "dft_fuse": "pallas"}),
    ("rp_pallas", {"rp_fuse": "pallas", "dft_fuse": "xla"}),
    ("rp_dft", {"rp_fuse": "pallas", "dft_fuse": "pallas"}),
    # Next per-iteration levers (round-2 follow-up; compare on ms_per_iter
    # AND total seconds — refresh/ortho change both the per-iteration cost
    # and the convergence path):
    # xla9: concat-free blockwise Gram — kills the four (3m, D) stacked
    # concat materializations (~4 GB HBM traffic per iteration at N=120).
    ("xla9", {"rr_gram": "xla9"}),
    # refresh_every: each refresh = 2 extra operator applies; 8 -> 12/16
    # saves ~8/12% of matvecs IF the recombination drift stays benign.
    ("refresh12", {"refresh_every": 12}),
    ("refresh16", {"refresh_every": 16}),
    # ortho_passes: the second SVQB Gram-NS pass costs ~2 extra Gram+mix
    # passes over W/P per iteration.
    ("ortho1", {"ortho_passes": 1}),
    # floor_patience: iterations past the best residual are pure tail
    # overhead at the c64 floor (validation ~1e-7 << the 1e-3 gate).
    ("patience3", {"floor_patience": 3}),
    ("gram_pallas", {"rr_gram": "pallas"}),
    ("all3", {"rr_gram": "pallas", "rp_fuse": "pallas",
              "dft_fuse": "pallas"}),
    # rp_cm: component-major (3, m, Dp) rp_fuse HBM buffers — removes the
    # T(4,128) 3->4 sublane padding (the N=150 OOM driver); candidate new
    # default if ms_per_iter is not worse than base.
    ("rp_cm", {"rp_layout": "cm"}),
    # Per-column floor locking + adaptive W/P width buckets (round 2):
    # at the c64 floor no column ever reaches res < tol, so the
    # reference-style tol locking never engages; col_patience locks a
    # column at ITS attainable floor and w_cap="auto" converts the locked
    # columns into smaller operator/ortho/RR shapes via the segmented
    # trampoline's bucket re-entry (lobpcg_rs.rs_solver_parts docstring).
    ("colfloor", {"col_patience": 6}),
    ("colfloor_wauto", {"col_patience": 6, "w_cap": "auto"}),
    ("colfloor_wauto_p3", {"col_patience": 3, "w_cap": "auto"}),
    # full stack: short global tail + per-column locking + width buckets
    ("stack_p3", {"floor_patience": 3, "col_patience": 3, "w_cap": "auto"}),
    # Ritz-movement stop (lobpcg_rs.rs_solver_parts docstring): eigenvalue
    # error is O(res^2/gap), so the tracked frequencies stabilize many
    # iterations before the residual floors — stop when they stop moving.
    # 2e-6 sits just above the measured c64 Ritz jitter band (4e-7..1.6e-6
    # per iteration, tools/iter_tail.py trace); 1e-7 never fires in c64.
    ("lam2e6", {"lam_tol": 2e-6}),
    ("stack_lam2e6", {"floor_patience": 3, "col_patience": 3,
                      "w_cap": "auto", "lam_tol": 2e-6}),
]


def run_variant(name, opts, n, reps, maxiter):
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.solvers.lobpcg import Status

    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=10)
    kw = ({"real_boundary": True} if "--cpu-smoke" in sys.argv else {})
    solver = KPointSolver(cfg, dtype=jnp.complex64, maxiter=maxiter,
                          solver_opts=dict(opts), **kw)
    r = solver.solve(ALPHA, seed=0, validate_result=False)
    print(f"#   [{name}] warmup: {Status(r.status).name} "
          f"iters={r.iterations} t={r.wall_time:.2f}s", flush=True)
    times, iters = [], []
    for i in range(reps):
        r = solver.solve(ALPHA, seed=i + 1, validate_result=False)
        if r.status not in (Status.CONVERGED, Status.FLOOR):
            raise RuntimeError(f"status {Status(r.status).name}")
        times.append(r.wall_time)
        iters.append(int(r.iterations))
        print(f"#   [{name}] rep {i}: {r.wall_time:.3f}s "
              f"iters={r.iterations}", flush=True)
    rep = solver.validate_solution(ALPHA, r)
    best = int(np.argmin(times))
    # ms_per_iter over ALL reps: iteration counts are seed-noisy (42-62
    # observed for one config), so the per-iteration rate is the stable
    # throughput comparator; min seconds stays the headline.
    rate = 1e3 * float(np.sum(times)) / max(int(np.sum(iters)), 1)
    return {"variant": name, "n": n, "seconds": round(float(min(times)), 3),
            "iters": iters[best], "all_iters": iters,
            "all_seconds": [round(t, 3) for t in times],
            "ms_per_iter": round(rate, 1),
            "validation": float(f"{np.abs(rep.omega_pnt - rep.omega_re).max():.3e}"),
            "omega": [float(w) for w in rep.omega_pnt]}


def run_kbatch(n, batch, maxiter):
    """k-batch throughput: `batch` distinct path points in one vmapped
    program vs the serial baseline — the evidence VERDICT round-1
    'weak #6' asked for."""
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig

    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=10)
    kw = ({"real_boundary": True} if "--cpu-smoke" in sys.argv else {})
    solver = KPointSolver(cfg, dtype=jnp.complex64, maxiter=maxiter, **kw)
    alphas = [ALPHA * (1.0 - 0.1 * i) for i in range(batch)]
    out = solver.solve_batch(alphas, seed=0, validate_result=False)  # warmup
    t0 = time.time()
    out = solver.solve_batch(alphas, seed=1, validate_result=True)
    wall = time.time() - t0
    dev = max(float(np.abs(r.report.omega_pnt - r.report.omega_re).max())
              for r in out if r.report is not None)
    return {"variant": f"kbatch{batch}", "n": n,
            "seconds_per_point": round(wall / batch, 3),
            "seconds_total": round(wall, 3),
            "iters": [int(r.iterations) for r in out],
            "validation": float(f"{dev:.3e}")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--kbatch", type=int, default=2,
                    help="0 disables the k-batch throughput row")
    ap.add_argument("--kbatch-n", type=int, default=96,
                    help="grid for the k-batch row (2 blocks at N=120 "
                         "exceed the v5e HBM budget)")
    ap.add_argument("--out", default="bench_logs/ab_tpu.jsonl")
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="CPU-pinned correctness smoke (forces the rs/pair "
                         "real-boundary path; Pallas runs in interpret mode)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these variant names")
    args = ap.parse_args()
    if args.only is not None:
        global VARIANTS
        VARIANTS = [(n_, o) for n_, o in VARIANTS if n_ in set(args.only)]

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(ln)["variant"] for ln in f if ln.strip()}

    print("devices:", jax.devices(), flush=True)
    base_omega = None
    for name, opts in VARIANTS:
        if name in done:
            print(f"# skip {name} (done)", flush=True)
            continue
        print(f"# === {name} [{time.strftime('%H:%M:%S')}] ===", flush=True)
        try:
            rec = run_variant(name, opts, args.n, args.reps, args.maxiter)
        except Exception as e:
            print(f"# VARIANT FAILED {name}: {type(e).__name__}: {e}",
                  flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps({"variant": name, "n": args.n,
                                    "error": f"{type(e).__name__}: {e}"})
                        + "\n")
            continue
        if name == "base":
            base_omega = np.asarray(rec["omega"])
        elif base_omega is not None:
            rec["max_domega_vs_base"] = float(
                f"{np.abs(np.asarray(rec['omega']) - base_omega).max():.3e}")
        rec.pop("omega", None)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    if args.kbatch and f"kbatch{args.kbatch}" not in done:
        if f"serial_n{args.kbatch_n}" not in done:
            print(f"# === serial baseline (N={args.kbatch_n}) ===", flush=True)
            try:
                rec = run_variant(f"serial_n{args.kbatch_n}", {},
                                  args.kbatch_n, args.reps, args.maxiter)
                rec.pop("omega", None)
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
            except Exception as e:
                print(f"# SERIAL BASELINE FAILED: {type(e).__name__}: {e}",
                      flush=True)
        print(f"# === kbatch{args.kbatch} (N={args.kbatch_n}) ===", flush=True)
        try:
            rec = run_kbatch(args.kbatch_n, args.kbatch, args.maxiter)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(f"# KBATCH FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
