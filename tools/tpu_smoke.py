#!/usr/bin/env python
"""Accelerator smoke of the non-production solver variants (VERDICT
round-2 item 4: max/GEP/mixed/descent/Davidson/JD/lobpcg_default must RUN
on the TPU, not only in the CPU suite).

Two routes, both using the real-boundary encoding (the axon backend cannot
TRANSFER complex buffers; complex arithmetic inside programs is fine):

* softlock/nolock/mixed/descent/davidson/jd go through KPointSolver with
  ``solver_impl="complex"`` — the production plumbing (real boundary,
  matmul DFT, plane-wave start, f64 validation recompute) around the
  complex-layout solver family.
* max/gep/descent_gep/default have no KPointSolver notion, so they run as
  one boundary-wrapped jitted core each: host-built NUMPY symbols cross as
  (..., 2) real pairs, the residual is computed in-program, and only real
  scalars/vectors cross back.

Variants (reference locations):
  softlock     lobpcg_sep_softlock           paper_2/lobpcg.py:325-492
  nolock       lobpcg_sep_nolock             paper_2/lobpcg.py:76-193
  mixed        lobpcg_sep_mixedprecision     paper_2/lobpcg.py:494-629
  max          lobpcg_sep_max                paper_2/lobpcg.py:196-323
  gep          lobpcg_gep                    paper_2/lobpcg.py:688-838
  descent      descent_sep                   paper_2/lobpcg.py:847-974
  descent_gep  descent_gep                   paper_2/lobpcg.py:976-1100
  default      lobpcg_default                paper_2/lobpcg.py:28-61
  davidson     davidson_sep                  paper_1_python/eigen_solver.py:848-983
  jd           jd_sep                        paper_1_python/eigen_solver.py:985-1124

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
LATTICE = "sc_curv"


def build_np(n, dtype):
    """Host-side (numpy) symbol assembly — the assemble_problem chain
    without the device placement, so complex leaves can cross the real
    boundary as split pairs."""
    from pcx import lattices
    from pcx.config import ProblemConfig, set_relaxation
    from pcx.operators import dft as dft_mod
    from pcx.operators import dielectric as diel_mod
    from pcx.operators import symbols as sym

    cfg = ProblemConfig(n=n, lattice=LATTICE, diel_type="chiral", nev=6)
    (shift, _), pnt = set_relaxation(ALPHA)
    ct = lattices.ct_matrix(cfg.lattice)
    d, di = sym.curl_symbols(n, cfg.k, ct, scal=1.0)
    d_a = np.asarray(sym.shift_symbol(d, di, ALPHA, scal=1.0), dtype)
    b_raw = sym.penalty_symbol(d_a)
    inv = sym.inverse_penalized(b_raw, pnt, shift=shift)
    rdt = np.float32 if dtype == np.complex64 else np.float64
    b = sym.HermSymbol(np.asarray(pnt * b_raw.diag.real, rdt),
                       np.asarray(pnt * b_raw.sdiag, dtype))
    inv = sym.HermSymbol(np.asarray(inv.diag.real, rdt),
                         np.asarray(inv.sdiag, dtype))
    diel = diel_mod.build(cfg.diel_type, n, cfg.lattice, k=cfg.k,
                          dtype=dtype)
    mats = dft_mod.dft_mats(n, dtype=dtype)
    rng = np.random.default_rng(7)
    x0 = (rng.standard_normal((10, 3, n, n, n))
          + 1j * rng.standard_normal((10, 3, n, n, n))).astype(dtype)
    return dict(d_a=d_a, b=b, inv=inv, diel=diel, mats=mats,
                shift=float(shift), x0=x0)


def _abs2(z):
    """|z|^2 via real/imag split: complex-dtype stablehlo.abs is the ONE
    op the axon backend refuses that the production solvers never emit —
    it is what killed every direct-route variant (max/gep/descent_gep and
    the diag ladder's direct_softlock) while the KPointSolver-routed twins
    of the same solvers compiled fine (bench_logs/variant_diag.jsonl n=32;
    dtype-aware StableHLO diff: 'abs' on complex<f32> was the only
    complex-op delta between the failing and passing programs)."""
    return jnp.real(z) ** 2 + jnp.imag(z) ** 2


def _resid_in_trace(h, x, lam, nev, m_func=None):
    xs = x[:nev]
    lamb = lam[:nev].reshape((-1,) + (1,) * (xs.ndim - 1)).astype(xs.dtype)
    mx = m_func(xs) if m_func is not None else xs
    r = h(xs) - lamb * mx
    num = jnp.sqrt(jnp.sum(_abs2(r.reshape(nev, -1)), 1))
    den = jnp.sqrt(jnp.sum(_abs2(xs.reshape(nev, -1)), 1))
    return jnp.max(num / ((jnp.abs(lam[:nev]) + 1.0) * den))


def run_variants(n, dtype, tol, maxiter, names):
    from pcx import boundary
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.operators import maxwell
    from pcx.operators.blocks import h_block
    from pcx.solvers import lobpcg as lob
    from pcx.solvers.lobpcg import Status

    kps_route = {"softlock", "nolock", "mixed", "descent", "davidson", "jd"}
    env = None
    cores = {}

    def get_env():
        nonlocal env
        if env is None:
            env = build_np(n, dtype)
        return env

    def run_kps(name):
        cfg = ProblemConfig(n=n, lattice=LATTICE, diel_type="chiral", nev=6)
        # Round-5: every KPointSolver-routed variant runs the PAIR layer
        # (solver_impl="rs") — the complex-layout family cannot execute on
        # this backend at all (complex-in-while_loop is UNIMPLEMENTED,
        # BENCH_NOTES round-5).  softlock/nolock/descent/mixed map onto
        # lobpcg_sep_rs (use_p / bf16-preconditioner levers); davidson/jd
        # run their pair twins (davidson._davidson_p).
        impl = "rs"
        s = KPointSolver(cfg, dtype=jnp.dtype(dtype), tol=tol,
                         maxiter=maxiter, solver=name,
                         solver_impl=impl)
        res = s.solve(ALPHA, verbose=False)
        dev = float(np.max(np.abs(np.asarray(res.omega)
                                  - np.asarray(res.omega_re))))
        lam = np.asarray(res.omega, np.float64) ** 2  # report freq^2 scale
        return (res.status, res.iterations, dev, np.asarray(res.omega))

    def direct_core(name):
        """One jitted core per direct variant, PAIR-layout end to end.

        Round-5 rewiring: the complex-layout route can NEVER run on this
        backend — the on-device ladder proved any complex arithmetic
        inside lax.while_loop is UNIMPLEMENTED (r0: carry x*0.999
        refused; BENCH_NOTES round-5) — so max/gep/descent_gep run their
        pair twins (lobpcg_sep_max_rs / lobpcg_gep_rs / descent_gep_rs)
        on the pair Maxwell apply (rs.ama_bb_p), the same operator stack
        as the production solver.  This is TPU execution of the VARIANT
        ALGORITHM, not a CPU fallback."""
        from pcx.config import ProblemConfig, set_relaxation
        from pcx.bandstructure import KPointSolver
        from pcx.operators import rs
        from pcx.solvers import lobpcg_rs as lrs

        cfg = ProblemConfig(n=n, lattice=LATTICE, diel_type="chiral",
                            nev=6)
        s = KPointSolver(cfg, dtype=jnp.dtype(dtype), tol=tol,
                         maxiter=maxiter, solver_impl="rs",
                         real_boundary=True, refine=False)
        m = 10
        funcs = s._rs_hp_builder(m, 0, fusions=False)
        sym_args = s._seg_sym_args(ALPHA)
        rng = np.random.default_rng(7)
        x0c = (rng.standard_normal((m, 3, n, n, n))
               + 1j * rng.standard_normal((m, 3, n, n, n)))
        x0 = jnp.asarray(x0c.astype(
            np.complex64 if dtype == np.complex64 else np.complex128))

        def pnorm2(v):
            return jnp.sum(v[0] ** 2 + v[1] ** 2)

        def core(d1, d0, ct, alpha, pnt, shift, x0_, diel, dft):
            rdt = x0_.real.dtype
            h_func, p_func, _ = funcs(d1, d0, ct, alpha, pnt, shift,
                                      rdt, diel, dft)
            xp = (x0_.real, x0_.imag)
            if name == "max":
                r = lrs.lobpcg_sep_max_rs(
                    h_func, (xp[0][:6], xp[1][:6]), 2, tol=tol,
                    maxiter=maxiter)
                # Validate lam_max against an INDEPENDENT pair power
                # method (the penalized operator's top cluster is
                # penalty-dominated; see the complex smoke's rationale).
                v = (xp[0][0], xp[1][0])
                nrm = jnp.sqrt(pnorm2(v))
                v = (v[0] / nrm, v[1] / nrm)

                def pm_body(_, vv):
                    w = h_func(vv)
                    nw = jnp.sqrt(pnorm2(w))
                    return (w[0] / nw, w[1] / nw)

                v = jax.lax.fori_loop(0, 200, pm_body, v)
                hv = h_func(v)
                lam_pm = (jnp.sum(v[0] * hv[0] + v[1] * hv[1])
                          / pnorm2(v))
                rel = jnp.abs(r.lambdas[0] - lam_pm) / lam_pm
                return (r.status, r.iterations, r.lambdas[:2], rel)
            # M = I + B/bmax on pairs (same pencil as the complex smoke)
            d_a64 = rs.build_curl_p(d1, d0, ct, alpha)
            bd64, bs64 = rs.penalty_p(d_a64, pnt)
            bmax = jnp.max(bd64) + 1e-30
            b_diag = (bd64 / bmax).astype(rdt)
            b_sd = ((bs64[0] / bmax).astype(rdt),
                    (bs64[1] / bmax).astype(rdt))

            def m_func(v):
                bv = rs.h_block_p(v, b_diag, b_sd)
                return (v[0] + bv[0], v[1] + bv[1])

            solver = (lrs.lobpcg_gep_rs if name == "gep"
                      else lrs.descent_gep_rs)
            r = solver(h_func, m_func, p_func,
                       (xp[0][:8], xp[1][:8]), 4, tol=tol,
                       maxiter=maxiter)
            # relative residual of the returned block, in-trace on pairs
            xs = (r.x[0][:4].reshape(4, -1), r.x[1][:4].reshape(4, -1))
            lamb = r.lambdas[:4][:, None]
            mx = m_func((r.x[0][:4], r.x[1][:4]))
            hx = h_func((r.x[0][:4], r.x[1][:4]))
            rr_ = (hx[0].reshape(4, -1) - lamb * mx[0].reshape(4, -1),
                   hx[1].reshape(4, -1) - lamb * mx[1].reshape(4, -1))
            num = jnp.sqrt(jnp.sum(rr_[0] ** 2 + rr_[1] ** 2, axis=1))
            den = jnp.sqrt(jnp.sum(xs[0] ** 2 + xs[1] ** 2, axis=1))
            resid = jnp.max(num / ((jnp.abs(r.lambdas[:4]) + 1.0) * den))
            return (r.status, r.iterations, r.lambdas[:4], resid)

        # real_boundary: complex buffers cannot TRANSFER on this backend;
        # x0 crosses as (..., 2) pairs and is rebuilt (outside the loop).
        return jax.jit(boundary.real_boundary(core)), (sym_args, x0, s)

    def run_direct(name):
        fn, (sym_args, x0, s) = direct_core(name)
        st, it, lam, resid = fn(*sym_args, x0, s.diel, s.dft)
        return (int(st), int(it), float(resid),
                np.asarray(lam, np.float64))

    def run_default():
        """Explicit-matrix path: shifted 1D Laplacian, exact eigenvalues
        3 - 2 cos(k pi/(nd+1)).  Round-5: runs the PAIR solver on the
        split-real matrix (the complex lobpcg_default body cannot execute
        inside while_loop on this backend); reference lobpcg_default,
        paper_2/lobpcg.py:28-61."""
        from pcx import boundary as bd
        from pcx.solvers import lobpcg_rs as lrs
        nd = 64
        a = (np.diag(np.full(nd, 3.0))
             - np.diag(np.ones(nd - 1), 1)
             - np.diag(np.ones(nd - 1), -1))
        rdt = jnp.float32 if dtype == np.complex64 else jnp.float64
        rng = np.random.default_rng(11)
        x0 = rng.standard_normal((7, nd))

        def core(ar, x0r):
            h = lambda v: (v[0] @ ar.T, v[1] @ ar.T)
            r = lrs.lobpcg_sep_rs(h, lambda v: v,
                                  (x0r, jnp.zeros_like(x0r)), 4,
                                  tol=tol, maxiter=maxiter)
            return r.status, r.iterations, r.lambdas[:4]

        st, it, lam = jax.jit(core)(jnp.asarray(a, rdt),
                                    jnp.asarray(x0, rdt))
        exact = 3.0 - 2.0 * np.cos(np.arange(1, 5) * np.pi / (nd + 1))
        dev = float(np.max(np.abs(np.asarray(lam, np.float64) - exact)))
        return int(st), int(it), dev, np.asarray(lam, np.float64)

    records = []
    for name in names:
        t0 = time.time()
        try:
            if name in kps_route:
                st, it, resid, lam = run_kps(name)
            elif name == "default":
                st, it, resid, lam = run_default()
            else:
                st, it, resid, lam = run_direct(name)
            lam = np.asarray(lam, np.float64)
            # MAXITER alone is NOT a pass (VERDICT r3 weak #7): it only
            # counts when the run's accuracy metric clears a gate —
            # omega-vs-omega_re deviation < 1e-3 for KPointSolver-routed
            # variants (the production spurious gate), relative residual
            # < 10*tol for the direct/explicit cores (slow-by-design
            # variants like descent legitimately end MAXITER at high
            # accuracy within the smoke's iteration budget).
            gate = 1e-3 if name in kps_route else 10.0 * tol
            converged = int(st) in (int(Status.CONVERGED), int(Status.FLOOR))
            validated = bool(np.isfinite(resid) and resid < gate)
            if name == "max":
                # Ritz movement stops max-mode almost immediately inside
                # the penalty cluster; only the power-method cross-check
                # (resid = |lam0 - lam_pm|/lam_pm) counts as validation.
                gate = 1e-2
                validated = bool(np.isfinite(resid) and resid < gate)
                converged = converged and validated
            rec = {"variant": name, "n": n,
                   "ok": bool((converged or
                               (int(st) == int(Status.MAXITER) and validated))
                              and np.isfinite(lam).all()),
                   "status": Status(int(st)).name,
                   "iters": int(it),
                   "seconds": round(time.time() - t0, 2),
                   ("validation" if name in kps_route else
                    "lam_vs_power" if name == "max" else "rel_residual"):
                       float(f"{resid:.3e}"),
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
    ap.add_argument("--per-timeout", type=int, default=1200,
                    help="per-variant subprocess timeout (TPU mode)")
    ap.add_argument("--breather", type=int, default=30,
                    help="pause between variant subprocesses (the remote "
                         "compile helper has failed under back-to-back "
                         "large compiles)")
    args = ap.parse_args()

    dtype = np.complex128 if args.cpu_smoke else np.complex64
    names = args.only or ["softlock", "nolock", "mixed", "max", "gep",
                          "descent", "descent_gep", "default",
                          "davidson", "jd"]

    if not args.cpu_smoke and len(names) > 1:
        # One SUBPROCESS per variant: a single UNIMPLEMENTED compile poisons
        # the whole attached process (observed: instant failures of every
        # variant after the first genuine one), so isolation is the only way
        # to get one honest verdict per variant.
        import subprocess
        bad = []
        for name in names:
            cmd = [sys.executable, "-u", os.path.abspath(__file__),
                   "--n", str(args.n), "--tol", str(args.tol),
                   "--maxiter", str(args.maxiter), "--out", args.out,
                   "--only", name]
            try:
                rc = subprocess.run(cmd, timeout=args.per_timeout).returncode
            except subprocess.TimeoutExpired:
                rc = -1
                with open(args.out, "a") as f:
                    f.write(json.dumps({
                        "variant": name, "n": args.n, "ok": False,
                        "error": f"subprocess timeout {args.per_timeout}s",
                        "backend": "tpu"}) + "\n")
            if rc != 0:
                bad.append(name)
            time.sleep(args.breather)
        print(f"# {'ALL PASS' if not bad else 'FAIL: ' + ', '.join(bad)}",
              flush=True)
        return 1 if bad else 0

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
