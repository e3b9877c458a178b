#!/usr/bin/env python
"""On-device bisection of the max/gep/descent_gep TPU refusal.

The dtype+rank-aware StableHLO diff (tools/hlo_opdiff.py) shows NO op
delta between the failing direct-route variants and the TPU-passing
programs — the refusal is structural.  The one component ALL THREE
failing variants share and NO passing program contains is
``rs.pencil_f64_embedding`` (the GEP small-pencil solver).  This ladder
compiles ever-larger pieces of it on the chip, each in a subprocess:

  p0_eigh_f64        jnp.linalg.eigh on a plain f64 matrix (baseline —
                     the production RR uses this and passes)
  p1_emb_eigh        eigh of the 2mx2m *-algebra embedding
  p2_whiten          + Loewdin inverse-sqrt whitening (two f64 matmuls)
  p3_pencil_full     rs.pencil_f64_embedding end to end
  p4_gep_tiny        lobpcg_gep on an explicit 48x48 pencil (no Maxwell
                     apply) — pencil in its real calling context
  p5_gep_chol        same but rr_pencil="chol" (complex Cholesky path,
                     expected refused; recorded for the parity table)

Appends to bench_logs/pencil_probe.jsonl.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STAGES = ["p0_eigh_f64", "p1_emb_eigh", "p2_whiten", "p3_pencil_full",
          "p4_gep_tiny", "p5_gep_chol"]

# Round-5 second ladder (after p3 PASSED standalone while p4 refused: the
# refusal is in the solve-loop CONTEXT, not the pencil itself):
#   p6_pencil_fori  pencil_f64_embedding inside a fori_loop — is
#                   "pencil in a loop" alone the trigger?
#   p7_gep_whiten   lobpcg_gep with rr_pencil="whiten"
#                   (rayleigh_ritz.eigh_pencil_whiten: G-whitening via the
#                   TPU-PROVEN eigh_f64_embedding + p x p pair GEMMs, no
#                   2m-embedding matmuls) — the candidate FIX
#   p8_gep_stub     lobpcg_gep with a trivial callable pencil (no eigh at
#                   all) — does the REST of the gep body compile?
STAGES_R5 = ["p7_gep_whiten", "p6_pencil_fori", "p8_gep_stub"]


def run_stage(stage: str) -> dict:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import numpy as np
    import jax
    if os.environ.get("PCX_PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    import jax.numpy as jnp
    from pcx import boundary
    from pcx.operators import rs

    m = 12
    rng = np.random.default_rng(3)
    a = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    b = rng.standard_normal((m, m)) + 1j * rng.standard_normal((m, m))
    t_h = (a @ a.conj().T + np.eye(m)).astype(np.complex128)
    g_h = (b @ b.conj().T + 10 * np.eye(m)).astype(np.complex128)
    tp = (jnp.asarray(t_h.real), jnp.asarray(t_h.imag))
    gp = (jnp.asarray(g_h.real), jnp.asarray(g_h.imag))

    emb = lambda p: jnp.block([[p[0], -p[1]], [p[1], p[0]]])

    if stage == "p0_eigh_f64":
        fn = jax.jit(lambda g: jnp.linalg.eigh(emb(g))[0].sum())
        v = fn(gp)
        return {"ok": True, "value": float(v)}

    if stage == "p1_emb_eigh":
        def core(g):
            ge = emb(g)
            lam, u = jnp.linalg.eigh(ge)
            return lam.sum() + jnp.abs(u).max()
        return {"ok": True, "value": float(jax.jit(core)(gp))}

    if stage == "p2_whiten":
        def core(g, t):
            ge, te = emb(g), emb(t)
            lam, u = jnp.linalg.eigh(ge)
            alive = lam > 1e-12 * jnp.max(lam)
            inv_sqrt = jnp.where(
                alive, 1.0 / jnp.sqrt(jnp.maximum(lam, 1e-30)), 0.0)
            s = (u * inv_sqrt[None, :]) @ u.T
            tw = s @ te @ s
            return jnp.abs(tw).max()
        return {"ok": True, "value": float(jax.jit(core)(gp, tp))}

    if stage == "p3_pencil_full":
        def core(g, t):
            theta, c = rs.pencil_f64_embedding(t, g)
            return theta.sum() + jnp.abs(c[0]).max()
        return {"ok": True, "value": float(jax.jit(core)(gp, tp))}

    if stage == "p9_dynslice":
        # The gep body's dead-column compaction slices theta/C at a
        # DATA-DEPENDENT offset (lobpcg.py:569-570) — no TPU-passing pcx
        # program does that (res_his.at[it].set is dynamic-UPDATE, which
        # passes).  Tiny standalone probe of both ranks.
        def core(v, m2, i):
            a = jax.lax.dynamic_slice(v, (i,), (3,))
            b = jax.lax.dynamic_slice(m2, (jnp.int32(0), i), (4, 3))
            return a.sum() + b.sum()
        v = jnp.arange(12, dtype=jnp.float32)
        m2 = jnp.arange(48, dtype=jnp.float32).reshape(4, 12)
        val = jax.jit(core)(v, m2, jnp.asarray(2, jnp.int32))
        return {"ok": True, "value": float(val)}

    if stage == "p10_norm_c":
        # jnp.linalg.norm of a complex matrix (gep body dead_val,
        # lobpcg.py:565).
        def core(g):
            ge = jax.lax.complex(g[0], g[1]).astype(jnp.complex64)
            return jnp.linalg.norm(ge)
        gp32 = (gp[0].astype(jnp.float32), gp[1].astype(jnp.float32))
        return {"ok": True, "value": float(jax.jit(core)(gp32))}

    if stage == "p11_pencil_while":
        # p6 proved pencil-in-FORI passes; the round-5 re-smoke (max/gep
        # still refused after the one-hot fix while davidson — same body
        # minus the pencil — passed) points at pencil inside a genuine
        # WHILE loop (data-dependent trip count) + lax.cond, the exact
        # solver shape.
        def core(g, t):
            def cond(s):
                return s[0] < 3

            def body(s):
                i, acc = s
                def run(_):
                    theta, c = rs.pencil_f64_embedding(t, g)
                    return acc + theta.sum() + jnp.abs(c[0]).max()
                acc2 = jax.lax.cond(acc < 1e12, run, lambda _: acc, None)
                return i + 1, acc2
            return jax.lax.while_loop(cond, body,
                                      (jnp.asarray(0, jnp.int32), 0.0))[1]
        return {"ok": True, "value": float(jax.jit(core)(gp, tp))}

    if stage == "p12_gep_rs_tiny":
        # Round-5 close: after the one-hot fix, max/gep/descent_gep STILL
        # refuse over the Maxwell pair apply while (a) davidson with the
        # same compaction, (b) one-shot lobpcg_sep_rs (the on-chip
        # 'default' variant), and (c) pencil-inside-while (p11) all
        # compile.  This stage runs lobpcg_gep_rs itself on a tiny
        # EXPLICIT split-real pencil: if it passes, the refusal is an
        # interaction between gep_rs's body and the production
        # h_func/p_func closures; if it refuses, bisect gep_rs's body
        # directly (cat / scale / triple-upd / M-residual chain).
        from pcx.solvers import lobpcg_rs as lrs
        n2, nev2 = 48, 3
        aa = rng.standard_normal((n2, n2)) + 1j * rng.standard_normal(
            (n2, n2))
        bb2 = rng.standard_normal((n2, n2)) + 1j * rng.standard_normal(
            (n2, n2))
        a_h = (aa @ aa.conj().T + np.eye(n2))
        b_h = (bb2 @ bb2.conj().T + 10 * np.eye(n2))
        x0 = rng.standard_normal((nev2 + 3, n2))
        x0i = rng.standard_normal((nev2 + 3, n2))

        def pair_apply(mr, mi):
            def f(v):
                return (v[0] @ mr.T + v[1] @ mi.T,
                        v[1] @ mr.T - v[0] @ mi.T)
            return f

        def core(ar, ai, br, bi, xr, xi):
            r = lrs.lobpcg_gep_rs(pair_apply(ar, ai), pair_apply(br, bi),
                                  lambda v: v, (xr, xi), nev2,
                                  tol=1e-4, maxiter=60)
            return r.status, r.iterations, r.lambdas[:nev2]

        f32 = jnp.float32
        st, it, lam = jax.jit(core)(
            jnp.asarray(a_h.real, f32), jnp.asarray(a_h.imag, f32),
            jnp.asarray(b_h.real, f32), jnp.asarray(b_h.imag, f32),
            jnp.asarray(x0, f32), jnp.asarray(x0i, f32))
        import scipy.linalg as sla
        want = np.sort(sla.eigh(a_h, b_h, eigvals_only=True))[:nev2]
        dev = float(np.max(np.abs(np.sort(np.asarray(lam, np.float64))
                                  - want) / np.abs(want)))
        return {"ok": dev < 1e-2, "status": int(st), "iters": int(it),
                "rel_dev": float(f"{dev:.3e}")}

    if stage == "p6_pencil_fori":
        def core(g, t):
            def body(_, acc):
                theta, c = rs.pencil_f64_embedding(t, g)
                return acc + theta.sum() + jnp.abs(c[0]).max()
            return jax.lax.fori_loop(0, 3, body, 0.0)
        return {"ok": True, "value": float(jax.jit(core)(gp, tp))}

    # p4/p5/p7/p8: gep on an explicit pencil, no Maxwell operator.
    from pcx.solvers import lobpcg as lob
    n, nev = 48, 3
    aa = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    bb = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a_h = (aa @ aa.conj().T + np.eye(n)).astype(np.complex64)
    b_h = (bb @ bb.conj().T + 10 * np.eye(n)).astype(np.complex64)
    x0 = (rng.standard_normal((nev + 3, n))
          + 1j * rng.standard_normal((nev + 3, n))).astype(np.complex64)
    if stage == "p5_gep_chol":
        pencil_kind = "chol"
    elif stage == "p7_gep_whiten":
        pencil_kind = "whiten"
    elif stage == "p8_gep_stub":
        def pencil_kind(gh, g):  # trivial callable: no eigh at all
            theta = jnp.sort(jnp.real(jnp.diag(gh)))
            return theta.astype(jnp.float32), jnp.eye(
                gh.shape[0], dtype=gh.dtype)
    else:
        pencil_kind = "embedding"

    def matvec(mat):
        # Split-real GEMM: complex dot_general is UNIMPLEMENTED on the
        # axon backend (same fix as lobpcg_default) — without this, p4/p5
        # refuse on the operator apply itself, not the pencil, and the
        # probe mislocalizes (round-5 re-read of the p4 design).
        mr, mi = jnp.real(mat).T, jnp.imag(mat).T

        def apply(v):
            vr, vi = jnp.real(v), jnp.imag(v)
            return jax.lax.complex(vr @ mr - vi @ mi,
                                   vr @ mi + vi @ mr).astype(v.dtype)
        return apply

    def core(a_, b_, x_):
        r = lob.lobpcg_gep(matvec(a_), matvec(b_),
                           lambda v: v, x_, nev, tol=1e-4, maxiter=60,
                           rr_pencil=pencil_kind)
        return r.status, r.iterations, r.lambdas[:nev].real

    st, it, lam = jax.jit(boundary.real_boundary(core))(a_h, b_h, x0)
    import scipy.linalg as sla
    want = np.sort(sla.eigh(np.asarray(a_h, np.complex128),
                            np.asarray(b_h, np.complex128),
                            eigvals_only=True))[:nev]
    dev = float(np.max(np.abs(np.sort(np.asarray(lam, np.float64))
                              - want) / np.abs(want)))
    # p8's stub pencil has garbage numerics by design — it probes whether
    # the REST of the gep body compiles; ok = ran to completion.
    ok = True if stage == "p8_gep_stub" else dev < 1e-2
    return {"ok": ok, "status": int(st), "iters": int(it),
            "rel_dev": float(f"{dev:.3e}")}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--out", default="bench_logs/pencil_probe.jsonl")
    ap.add_argument("--per-timeout", type=int, default=420)
    ap.add_argument("--stages", nargs="*", default=None)
    args = ap.parse_args()

    if args.stage:
        t0 = time.time()
        try:
            rec = run_stage(args.stage)
        except Exception as e:  # noqa: BLE001
            rec = {"ok": False, "error": str(e)[:300]}
        rec.update(stage=args.stage, seconds=round(time.time() - t0, 2))
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return 0 if rec.get("ok") else 1

    for stage in (args.stages or STAGES):
        cmd = [sys.executable, "-u", os.path.abspath(__file__),
               "--stage", stage, "--out", args.out]
        print(f"# === {stage} [{time.strftime('%H:%M:%S')}] ===", flush=True)
        try:
            rc = subprocess.run(cmd, timeout=args.per_timeout).returncode
        except subprocess.TimeoutExpired:
            rc = -1
            with open(args.out, "a") as f:
                f.write(json.dumps({"stage": stage, "ok": False,
                                    "error": "timeout"}) + "\n")
        print(f"# {stage}: rc={rc}", flush=True)
        time.sleep(20)
    return 0


if __name__ == "__main__":
    sys.exit(main())
