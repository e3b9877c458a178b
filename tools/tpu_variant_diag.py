#!/usr/bin/env python
"""Bisect the UNIMPLEMENTED compile refusal of the direct-route solver
variants (max/gep/descent_gep — bench_logs/tpu_smoke.jsonl).

All TPU-passing smoke variants ran through KPointSolver; all failing ones
ran through the direct boundary-wrapped cores, and their StableHLO op sets
are IDENTICAL to a direct-route softlock program (tools/hlo_opdiff.py), so
static analysis cannot split "direct-route plumbing is refused" from
"lobpcg_gep's loop is refused".  This ladder runs the discriminating
programs on the chip, one subprocess each (a refused compile poisons the
attached process):

  1. direct_softlock  the KNOWN-GOOD solver through the direct route
                      (isolates the boundary/symbol plumbing)
  2. pencil           jitted rs.pencil_f64_embedding alone, 24x24 pair
                      (the only dense-algebra piece unique to gep)
  3. gep_tiny         lobpcg_gep on a diagonal operator, maxiter=2
                      (the gep while_loop alone; wts passed as an arg)
  4. gep_full         the smoke's gep core, full solve
  5. max_full         lobpcg_sep_max (inverse-pencil largest modes)
  6. descent_gep_full descent_gep, full solve

Round-3 root cause (dtype-aware StableHLO diff + this ladder on-chip):
complex-dtype stablehlo.abs — emitted only by the old _resid_in_trace —
is refused by the axon backend; closure-captured device arrays (old
gep_tiny wts) are a second independent refusal.  Both fixed; the ladder
re-validates every direct-route variant.

Appends records to bench_logs/variant_diag.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STAGES = ["direct_softlock", "pencil", "gep_tiny", "gep_full",
          "max_full", "descent_gep_full"]


def run_stage(stage: str, n: int) -> dict:
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

    from pcx import boundary
    from pcx.solvers import lobpcg as lob
    from pcx.solvers.lobpcg import Status

    if stage == "pencil":
        from pcx.operators import rs
        rng = np.random.default_rng(3)
        m = 24
        a = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
        t = a + a.conj().T
        c = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
        g = c @ c.conj().T + m * np.eye(m)

        def core(tr, ti, gr, gi):
            theta, (cr, ci) = rs.pencil_f64_embedding((tr, ti), (gr, gi))
            return theta

        theta = jax.jit(core)(t.real, t.imag, g.real, g.imag)
        theta = np.asarray(theta)
        import scipy.linalg as sla
        ref = np.sort(sla.eigh(t, g, eigvals_only=True))
        dev = float(np.max(np.abs(np.sort(theta) - ref)))
        return {"ok": bool(dev < 1e-8), "dev": float(f"{dev:.3e}")}

    if stage == "gep_tiny":
        # lobpcg_gep's while_loop with a trivial spectral operator:
        # diagonal H (f32 weights), M = I + 0.5 diag, no symbols/DFT.
        # wts crosses as an ARGUMENT — a closure-captured device array
        # becomes a lowered constant, which the axon backend refuses
        # (same constraint that makes KPointSolver pass diel as a pytree
        # arg, bandstructure._jitted docstring).
        d = n ** 3
        rng = np.random.default_rng(5)
        wts = np.asarray(1.0 + np.arange(3 * d) % 7, np.float32)
        x0 = np.asarray(rng.standard_normal((8, 3 * d))
                        + 1j * rng.standard_normal((8, 3 * d)),
                        np.complex64)

        def core(x0_, wts_):
            h = lambda v: v * wts_
            m_f = lambda v: v + 0.5 * v * (wts_ / jnp.max(wts_))
            p = lambda v: v
            r = lob.lobpcg_gep(h, m_f, p, x0_, 4, tol=1e-3, maxiter=2)
            return r.status, r.iterations, r.lambdas[:4].real

        st, it, lam = jax.jit(boundary.real_boundary(core))(x0, wts)
        return {"ok": bool(np.isfinite(np.asarray(lam)).all()),
                "status": Status(int(st)).name, "iters": int(it),
                "lambdas": [float(f"{v:.5g}") for v in np.asarray(lam)]}

    # direct_softlock / gep_full / max_full / descent_gep_full share the
    # smoke env (and validate the complex-abs fix in _resid_in_trace).
    from tools.tpu_smoke import build_np, _resid_in_trace
    from pcx.operators import maxwell
    from pcx.operators.blocks import h_block

    e = build_np(n, np.complex64)
    shift = e["shift"]
    tol, maxiter = 1e-3, 300

    def core(d_a, b, inv, x0, diel, mats):
        h = lambda v: maxwell.ama_bb(v, d_a, b, diel, shift=shift,
                                     dft=mats)
        p = lambda v: h_block(v, inv)
        if stage == "direct_softlock":
            r = lob.lobpcg_sep_softlock(h, p, x0[:8], 4, tol=tol,
                                        maxiter=maxiter)
            return (r.status, r.iterations, r.lambdas[:4].real,
                    _resid_in_trace(h, r.x, r.lambdas, 4))
        if stage == "max_full":
            r = lob.lobpcg_sep_max(h, x0[:6], 2, tol=tol, maxiter=maxiter)
            return (r.status, r.iterations, r.lambdas[:2].real,
                    _resid_in_trace(h, r.x, r.lambdas, 2))
        bmax = jnp.max(jnp.abs(b.diag)) + 1e-30
        m_func = lambda v: v + h_block(v, b) * (1.0 / bmax)
        fn = (lob.descent_gep if stage == "descent_gep_full"
              else lob.lobpcg_gep)
        r = fn(h, m_func, p, x0[:8], 4, tol=tol, maxiter=maxiter)
        return (r.status, r.iterations, r.lambdas[:4].real,
                _resid_in_trace(h, r.x, r.lambdas, 4, m_func=m_func))

    st, it, lam, resid = jax.jit(boundary.real_boundary(core))(
        e["d_a"], e["b"], e["inv"], e["x0"], e["diel"], e["mats"])
    lam = np.asarray(lam, np.float64)
    return {"ok": bool(np.isfinite(lam).all()),
            "status": Status(int(st)).name, "iters": int(it),
            "rel_residual": float(f"{float(resid):.3e}"),
            "lambdas": [float(f"{v:.6g}") for v in lam]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--stages", default=None,
                    help="comma list of stages to run (default: all)")
    ap.add_argument("--stage", default=None)
    ap.add_argument("--out", default="bench_logs/variant_diag.jsonl")
    ap.add_argument("--per-timeout", type=int, default=1500)
    ap.add_argument("--breather", type=int, default=30)
    args = ap.parse_args()

    if args.stage:
        t0 = time.time()
        try:
            rec = run_stage(args.stage, args.n)
        except Exception as ex:  # noqa: BLE001 — diag must record, not die
            rec = {"ok": False, "error": str(ex)[:300]}
        rec.update(stage=args.stage, n=args.n,
                   backend="cpu" if os.environ.get("PCX_DIAG_CPU") else "tpu",
                   seconds=round(time.time() - t0, 2))
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return 0 if rec.get("ok") else 1

    rcs = {}
    stages = (args.stages.split(",") if args.stages else STAGES)
    for stage in stages:
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--stage", stage, "--n", str(args.n), "--out", args.out]
        print(f"# === stage {stage} ===", flush=True)
        try:
            rcs[stage] = subprocess.run(
                cmd, timeout=args.per_timeout).returncode
        except subprocess.TimeoutExpired:
            rcs[stage] = -1
        print(f"# stage {stage}: rc={rcs[stage]}", flush=True)
        time.sleep(args.breather)
    print("# summary:", json.dumps(rcs), flush=True)
    return 0 if all(v == 0 for v in rcs.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
