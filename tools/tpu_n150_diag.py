#!/usr/bin/env python
"""Bisect the N=150 remote-compile failure by PROGRAM SCOPE.

Every solver-lever variant of tools/tpu_n150_bisect.py now dies the same
way: `tpu_compile_helper subprocess exit code 1` (HTTP 500) — including the
Pallas-free xla9_nofuse, so the failure is not the fused kernels.  This
tool compiles a LADDER of ever-larger subprograms at N=150, each in its own
subprocess (a failed compile can poison the attached process), to find the
smallest program the helper cannot build:

  1. elementwise   (x + 1).sum() on (3, 150, 150, 150) f32
  2. axis_dft      one fused-Pallas axis DFT pass (m=16 pair block)
  3. dft3_xla      stacked-dot 3-axis DFT, XLA path
  4. dft3_pallas   fused-Pallas 3-axis DFT
  5. iter1_xla     lobpcg_rs solve, maxiter=1, XLA fusions (one full
                   iteration: apply + rp + gram + RR + update)
  6. iter1_pallas  same with the Pallas rp/dft fusions (production config)
  7. solve         the production solve (maxiter=500) — the known failure

Run on the TPU: python tools/tpu_n150_diag.py [--n 150] [--m 16]
Appends records to bench_logs/n150_diag.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STAGES = ["elementwise", "axis_dft", "dft3_xla", "dft3_pallas",
          "iter1_xla", "iter1_pallas", "solve"]


def run_stage(stage: str, n: int, m: int) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import numpy as np
    import jax
    if os.environ.get("PCX_DIAG_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp

    t0 = time.time()

    if stage == "elementwise":
        x = jnp.zeros((3, n, n, n), jnp.float32)
        v = jax.jit(lambda a: (a + 1.0).sum())(x)
        v.block_until_ready()
        return {"ok": True, "value": float(v)}

    from pcx.operators import dft as dft_mod
    from pcx.operators import pallas_kernels as pk

    mats = dft_mod.dft_mats(n, np.complex64)
    w = (jnp.asarray(mats.fwd.real, jnp.float32),
         jnp.asarray(mats.fwd.imag, jnp.float32))

    interp = jax.default_backend() == "cpu"

    if stage == "axis_dft":
        xr = jnp.zeros((3 * m, n, n, n), jnp.float32)
        w2 = pk.stacked_twiddle(w)
        f = jax.jit(lambda a, b: pk.axis_dft_pairs(
            (a, b), w2, interpret=interp)[0].sum())
        v = f(xr, xr)
        v.block_until_ready()
        return {"ok": True, "value": float(v)}

    if stage in ("dft3_xla", "dft3_pallas"):
        from pcx.operators import rs
        xr = jnp.zeros((m, 3, n, n, n), jnp.float32)
        if stage == "dft3_xla":
            f = jax.jit(lambda a, b: rs.dft3_p((a, b), w)[0].sum())
        else:
            f = jax.jit(lambda a, b: pk.dft3_pairs_fused(
                (a, b), w, interpret=interp)[0].sum())
        v = f(xr, xr)
        v.block_until_ready()
        return {"ok": True, "value": float(v)}

    # Solver stages share the KPointSolver assembly.
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.solvers.lobpcg import Status

    alpha = np.array([np.pi, 0.0, 0.0])
    # rp_layout="cm": component-major rp_fuse buffers — removes the 2x206MB
    # sublane padding that put iter1_pallas 27.6MB over HBM (n150_diag.log).
    opts = {"rr_gram": "xla9", "w_cap": 8, "col_patience": 6,
            "rp_layout": "cm"}
    if stage == "iter1_xla":
        opts["dft_fuse"] = "xla"
        opts["rp_fuse"] = "xla"

    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=10)
    maxiter = 1 if stage.startswith("iter1") else 500
    kw = {}
    if jax.default_backend() == "cpu":   # CPU harness test of this tool
        kw = dict(real_boundary=True, solver_impl="rs")
    # apply_chunk=8: with the cm layout the N=150 program COMPILES but
    # the execution still exhausted HBM (runtime RESOURCE_EXHAUSTED in
    # seg_run, n150_diag.log 20:44-20:57); chunking the operator apply to
    # 8 columns halves the largest in-flight DFT temporaries.
    solver = KPointSolver(cfg, dtype=jnp.complex64, maxiter=maxiter,
                          solver_opts=opts, apply_chunk=8, **kw)
    res = solver.solve(alpha, seed=0, validate_result=False)
    if stage.startswith("iter1"):
        return {"ok": True, "status": Status(int(res.status)).name,
                "iters": int(res.iterations)}
    ok = res.status in (Status.CONVERGED, Status.FLOOR, Status.MAXITER)
    rec = {"ok": ok, "status": Status(int(res.status)).name,
           "iters": int(res.iterations),
           "seconds_solve": round(res.wall_time, 2)}
    if ok and n == 150:
        # Timed warm rep + validation; on success write the
        # sc_curv_chiral_150 row the sweep queue gates on
        # (same schema as tools/tpu_n150_bisect.try_variant).
        r2 = solver.solve(alpha, seed=1, validate_result=False)
        rep = solver.validate_solution(alpha, r2)
        dev = float(np.abs(rep.omega_pnt - rep.omega_re).max())
        rec["validation"] = float(f"{dev:.3e}")
        if dev < 1e-3:
            row = {"row": "sc_curv_chiral_150", "lattice": "sc_curv",
                   "diel": "chiral", "n": 150,
                   "seconds": round(float(r2.wall_time), 3),
                   "iters": int(r2.iterations),
                   "validation": rec["validation"],
                   "baseline_gpu_s": 49.20,
                   "vs_baseline": round(49.20 / float(r2.wall_time), 3),
                   "solver_opts": dict(opts)}
            with open("bench_logs/bench_matrix.jsonl", "a") as f:
                f.write(json.dumps(row) + "\n")
            rec["bench_row"] = True
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--stage", default=None, help="(internal) run one stage")
    ap.add_argument("--out", default="bench_logs/n150_diag.jsonl")
    ap.add_argument("--per-timeout", type=int, default=2400)
    args = ap.parse_args()

    if args.stage:
        t0 = time.time()
        rec = run_stage(args.stage, args.n, args.m)
        rec.update(stage=args.stage, n=args.n,
                   seconds=round(time.time() - t0, 2))
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return 0 if rec.get("ok") else 1

    results = {}
    for stage in STAGES:
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--n", str(args.n), "--m", str(args.m),
               "--stage", stage, "--out", args.out]
        print(f"# === stage {stage} [{time.strftime('%H:%M:%S')}] ===",
              flush=True)
        try:
            rc = subprocess.run(cmd, timeout=args.per_timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -1
            with open(args.out, "a") as f:
                f.write(json.dumps({"stage": stage, "n": args.n,
                                    "ok": False, "error": "timeout"}) + "\n")
        results[stage] = rc
        print(f"# stage {stage}: rc={rc}", flush=True)
        time.sleep(45)   # compile-helper breather
        if stage == "solve" and rc == 0:
            break
    print("# summary:", json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
