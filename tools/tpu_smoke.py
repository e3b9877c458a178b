#!/usr/bin/env python
"""Accelerator smoke of the non-production solver variants (VERDICT
round-1 item 7: max-mode / GEP / Davidson must RUN on the TPU, not only
in the CPU suite).

All variants solve the assembled SC-CURV chiral Maxwell problem at small N
in complex64.  Every dense contraction in these solvers routes through the
real-split GEMM helpers (rayleigh_ritz._csplit_dot) and the f64
real-embedding eigh/pencil, so no complex dot_general / complex Cholesky /
host callback reaches the backend (all three are unimplemented there).

Variants:
  softlock   lobpcg_sep_softlock, the complex-layout primary solver
  nolock     lobpcg_sep_nolock (reference paper_2/lobpcg.py:76-193)
  mixed      lobpcg_sep_mixedprecision (c64 preconditioner, ref :494-629)
  max        lobpcg_sep_max (largest eigenvalues; embedding pencil)
  gep        lobpcg_gep on H x = lambda M x with M = the HPD
             preconditioner symbol apply (embedding pencil)
  descent    descent_sep (two-term steepest descent, ref :847-974)
  descent_gep descent_gep (ref :976-1100)
  default    lobpcg_default on an explicit Hermitian matrix
             (ref paper_2/lobpcg.py:28-61)
  davidson   davidson_sep (fixed-capacity thick restart)
  jd         jd_sep (Jacobi-Davidson, CG correction equation)

Appends one JSON line per variant to --out; prints a PASS/FAIL table.
Run with --cpu-smoke to pin the CPU backend (harness test; never attach
to the tunnel while a TPU job is live).
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
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

import jax.numpy as jnp

ALPHA = np.array([np.pi, 0.0, 0.0])


def build(n, dtype):
    from pcx.config import ProblemConfig
    from pcx.operators import maxwell
    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=6)
    prob = maxwell.assemble_problem(cfg, ALPHA, dtype=dtype)
    x0 = maxwell.random_block(jax.random.PRNGKey(7), n, 10, dtype)
    return prob, x0


def run_variants(n, dtype, tol, maxiter, names):
    from pcx.solvers import lobpcg as lob
    from pcx.solvers import davidson as dav
    from pcx.solvers.lobpcg import Status

    prob, x0 = build(n, dtype)
    h, p = prob.h_apply, prob.p_apply
    ok_status = (Status.CONVERGED, Status.FLOOR, Status.MAXITER)

    def final_residual(res, h_func, nev, m_func=None):
        # only the requested nev pairs are contractual — the extra block
        # columns are unconverged by design
        x = res.x[:nev]
        lam = res.lambdas[:nev]
        lamb = lam.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        mx = m_func(x) if m_func is not None else x
        r = h_func(x) - lamb * mx
        num = jnp.sqrt(jnp.sum(jnp.abs(r.reshape(nev, -1)) ** 2, 1))
        den = jnp.sqrt(jnp.sum(jnp.abs(x.reshape(nev, -1)) ** 2, 1))
        return float(jnp.max(num / ((jnp.abs(lam) + 1.0) * den)))

    def softlock():
        r = lob.lobpcg_sep_softlock(h, p, x0, 6, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 6)

    def maxmode():
        r = lob.lobpcg_sep_max(h, x0[:6], 2, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 2)

    def gep():
        # H x = lambda M x with M = I + pnt-normalized penalty symbol —
        # HPD with spectrum in [1, 2] (well-conditioned pencil on the
        # same operator stack, zero extra FFTs).
        from pcx.operators import blocks
        bmax = float(jnp.max(jnp.abs(prob.b.diag)).real) or 1.0
        m_func = lambda v: v + blocks.h_block(v, prob.b) * (1.0 / bmax)
        r = lob.lobpcg_gep(h, m_func, p, x0[:8], 4, tol=tol,
                           maxiter=maxiter)
        return r, final_residual(r, h, 4, m_func=m_func)

    def davidson():
        r = dav.davidson_sep(h, p, x0[:6], 4, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 4)

    def jd():
        r = dav.jd_sep(h, p, x0[:6], 4, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 4)

    def nolock():
        r = lob.lobpcg_sep_nolock(h, p, x0, 6, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 6)

    def mixed():
        r = lob.lobpcg_sep_mixedprecision(h, p, x0, 6, tol=tol,
                                          maxiter=maxiter)
        return r, final_residual(r, h, 6)

    def descent():
        r = lob.descent_sep(h, p, x0, 6, tol=tol, maxiter=maxiter)
        return r, final_residual(r, h, 6)

    def descent_gep():
        from pcx.operators import blocks
        bmax = float(jnp.max(jnp.abs(prob.b.diag)).real) or 1.0
        m_func = lambda v: v + blocks.h_block(v, prob.b) * (1.0 / bmax)
        r = lob.descent_gep(h, m_func, p, x0[:8], 4, tol=tol,
                            maxiter=maxiter)
        return r, final_residual(r, h, 4, m_func=m_func)

    def default():
        # explicit Hermitian matrix path (ref paper_2/lobpcg.py:28-61):
        # a shifted 1D Laplacian, eigenvalues 2 - 2 cos(k pi / (nd+1)) + 1
        nd = 64
        key = jax.random.PRNGKey(3)
        a = (jnp.diag(jnp.full((nd,), 3.0 + 0j))
             - jnp.diag(jnp.ones((nd - 1,), jnp.complex64), 1)
             - jnp.diag(jnp.ones((nd - 1,), jnp.complex64), -1)
             ).astype(dtype)
        r = lob.lobpcg_default(a, nev=4, tol=tol, maxiter=maxiter,
                               seed=int(key[0]))
        exact = 3.0 - 2.0 * np.cos(np.arange(1, 5) * np.pi / (nd + 1))
        resid = float(np.max(np.abs(
            np.asarray(r.lambdas[:4], np.float64) - exact)))
        return r, resid

    table = {"softlock": softlock, "nolock": nolock, "mixed": mixed,
             "max": maxmode, "gep": gep, "descent": descent,
             "descent_gep": descent_gep, "default": default,
             "davidson": davidson, "jd": jd}
    records = []
    for name in names:
        t0 = time.time()
        try:
            res, resid = table[name]()
            lam = np.asarray(res.lambdas, dtype=np.float64)
            rec = {"variant": name, "n": n, "ok": bool(
                       (res.status in ok_status) and np.isfinite(lam).all()),
                   "status": Status(int(res.status)).name,
                   "iters": int(res.iterations),
                   "seconds": round(time.time() - t0, 2),
                   "rel_residual": float(f"{resid:.3e}"),
                   "lambdas": [float(f"{v:.6g}") for v in lam[:6]]}
        except Exception as e:  # noqa: BLE001 — smoke must report, not die
            rec = {"variant": name, "n": n, "ok": False,
                   "error": str(e)[:300],
                   "seconds": round(time.time() - t0, 2)}
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--out", default="bench_logs/tpu_smoke.jsonl")
    ap.add_argument("--cpu-smoke", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    dtype = jnp.complex128 if args.cpu_smoke else jnp.complex64
    names = args.only or ["softlock", "nolock", "mixed", "max", "gep",
                          "descent", "descent_gep", "default",
                          "davidson", "jd"]
    print("devices:", jax.devices(), flush=True)
    records = run_variants(args.n, dtype, args.tol, args.maxiter, names)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for rec in records:
            rec["backend"] = jax.default_backend()
            f.write(json.dumps(rec) + "\n")
    bad = [r["variant"] for r in records if not r.get("ok")]
    print(f"# {'ALL PASS' if not bad else 'FAIL: ' + ', '.join(bad)}",
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
