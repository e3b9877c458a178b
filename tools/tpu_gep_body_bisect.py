#!/usr/bin/env python
"""Stepwise on-device bisection of the lobpcg_gep body refusal.

Round-5 pencil-probe findings (bench_logs/pencil_probe.jsonl):
  * rs.pencil_f64_embedding passes standalone AND inside fori_loop (p3, p6)
  * lobpcg_gep refuses even with a STUB pencil (no eigh at all, p8) and a
    split-real h_func (p4 re-run)
  -> the refusal is in the gep BODY structure itself, not the pencil.

Each stage here rebuilds the body incrementally inside a lax.while_loop
with a complex carry on a tiny 48x48 explicit pencil; the first stage that
refuses localizes the offending construct.

  q0_carry       while_loop with complex (x, hx, p) carry + split-real
                 apply + axpy updates (lobpcg_sep-like skeleton)
  q1_gram        + concatenate (x,w,p), split-real gram, hermitize,
                 keep-mask, diag(dead) complex converts
  q2_slice_mix   + stub theta/c + dynamic slices at traced offset + mix
                 back-transforms (everything except pencil/cond)
  q3_cond        + the lax.cond(finish, step) two-branch structure and
                 res_his dynamic update (the full p8 shape minus pencil)

Appends to bench_logs/gep_body_bisect.jsonl.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

STAGES = ["q0_carry", "q1_gram", "q2_slice_mix", "q3_cond"]

# After q0 REFUSED (the minimal complex-carry skeleton!), isolate further:
#   r0_carry_min   while_loop whose carry is ONE complex array, body is a
#                  pure complex scale — is the complex CARRY the trigger?
#   r1_pair_carry  identical math to q0 but the carry is (re, im) REAL
#                  pairs, complex rebuilt/split INSIDE the body — the
#                  candidate mechanical fix for the whole complex-solver
#                  family
STAGES_R = ["r0_carry_min", "r1_pair_carry"]


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
    from jax import lax
    from pcx import boundary
    from pcx.solvers import rayleigh_ritz as rr_mod
    from pcx.utils import norms

    n, m = 48, 6
    rng = np.random.default_rng(5)
    aa = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a_h = (aa @ aa.conj().T + np.eye(n)).astype(np.complex64)
    x0 = (rng.standard_normal((m, n))
          + 1j * rng.standard_normal((m, n))).astype(np.complex64)

    ar, ai = np.real(aa @ aa.conj().T + np.eye(n)), \
        np.imag(aa @ aa.conj().T + np.eye(n))

    def apply(v, mr, mi):
        vr, vi = jnp.real(v), jnp.imag(v)
        return jax.lax.complex(vr @ mr.T - vi @ mi.T,
                               vr @ mi.T + vi @ mr.T).astype(v.dtype)

    cdt = jnp.complex64
    rdt = jnp.float32
    ones_m = jnp.ones((m,), rdt)

    if stage == "r0_carry_min":
        def core_r0(x_):
            def body(s):
                it, x = s
                return it + 1, x * jnp.asarray(0.999, cdt)
            it, x = jax.lax.while_loop(lambda s: s[0] < 5, body,
                                       (jnp.asarray(0, jnp.int32), x_))
            return it, jnp.abs(x).max()
        it, mx = jax.jit(boundary.real_boundary(core_r0))(x0)
        return {"ok": True, "it": int(it), "maxabs": float(mx)}

    if stage == "r1_pair_carry":
        def core_r1(a_r, a_i, x_):
            h = lambda v: apply(v, a_r, a_i)

            def body(s):
                it, xr, xi, hr, hi, pr, pi, his = s
                x = jax.lax.complex(xr, xi)
                hx = jax.lax.complex(hr, hi)
                p = jax.lax.complex(pr, pi)
                lam = jnp.sum(jnp.real(jnp.conj(x) * hx), axis=1)
                r = lam[:, None].astype(cdt) * x - hx
                res = norms(r) / jnp.maximum(norms(x), 1e-20)
                w = r * (res > 1e-9).astype(rdt)[:, None].astype(cdt)
                x2 = x - 0.1 * w
                hx2 = h(x2)
                p2 = p + 0.01 * w
                return (it + 1, x2.real, x2.imag, hx2.real, hx2.imag,
                        p2.real, p2.imag,
                        his.at[it].set(jnp.linalg.norm(res)))

            hx0 = h(x_)
            z = jnp.zeros_like(x_.real)
            state = (jnp.asarray(0, jnp.int32), x_.real, x_.imag,
                     hx0.real, hx0.imag, z, z,
                     jnp.full((8,), jnp.nan, rdt))
            fin = jax.lax.while_loop(lambda s: s[0] < 5, body, state)
            return fin[0], jnp.abs(fin[1]).max()
        it, mx = jax.jit(boundary.real_boundary(core_r1))(
            jnp.asarray(ar, jnp.float32), jnp.asarray(ai, jnp.float32), x0)
        return {"ok": True, "it": int(it), "maxabs": float(mx)}

    def core(a_r, a_i, x_):
        h = lambda v: apply(v, a_r, a_i)
        x = x_
        hx = h(x)
        p = jnp.zeros_like(x)
        res_his = jnp.full((8,), jnp.nan, rdt)
        state = (jnp.asarray(0, jnp.int32), x, hx, p, res_his)

        def cond_fun(s):
            return s[0] < 5

        def body(s):
            it, x, hx, p, res_his = s
            lam = jnp.sum(jnp.real(jnp.conj(x) * hx), axis=1)
            r = lam[:, None].astype(cdt) * x - hx
            res = norms(r) / jnp.maximum(norms(x), 1e-20)

            if stage == "q0_carry":
                w = r * (res > 1e-9).astype(rdt)[:, None].astype(cdt)
                x2 = x - 0.1 * w
                return (it + 1, x2, h(x2), p + 0.01 * w,
                        res_his.at[it].set(jnp.linalg.norm(res)))

            active = (res > 1e-9).astype(rdt)
            amask = active[:, None].astype(cdt)
            w = r * amask
            hw = h(w)
            p_act = active * (it > 0)
            pmask = p_act[:, None].astype(cdt)
            pp, hp = p * pmask, h(p) * pmask
            s_all = jnp.concatenate((x, w, pp), axis=0)
            hs_all = jnp.concatenate((hx, hw, hp), axis=0)
            basis_mask = jnp.concatenate((ones_m, active, p_act))
            keep = basis_mask[:, None] * basis_mask[None, :]
            dead = 1.0 - basis_mask
            g = rr_mod.hermitize(rr_mod.gram(s_all, s_all)) * keep \
                + jnp.diag(dead).astype(cdt)
            gh = rr_mod.hermitize(rr_mod.gram(s_all, hs_all)) * keep
            dead_val = jnp.linalg.norm(gh) + 1.0
            gh = gh - dead_val * jnp.diag(dead).astype(cdt)

            if stage == "q1_gram":
                x2 = x - 0.1 * w + 0.0 * jnp.sum(g + gh).real.astype(
                    rdt).astype(cdt) * x
                return (it + 1, x2, h(x2), pp,
                        res_his.at[it].set(jnp.linalg.norm(res)))

            # stub pencil: theta = diag(gh).real sorted, c = eye
            theta_all = jnp.sort(jnp.real(jnp.diag(gh))).astype(rdt)
            c_all = jnp.eye(3 * m, dtype=cdt)
            n_dead = (3 * m - jnp.sum(basis_mask)).astype(jnp.int32)
            theta = lax.dynamic_slice(theta_all, (n_dead,), (m,))
            c = lax.dynamic_slice(c_all, (jnp.int32(0), n_dead), (3 * m, m))
            c = c * basis_mask[:, None]
            c_x, c_w, c_p = c[:m], c[m:2 * m], c[2 * m:]
            pn = rr_mod.mix(c_w, s_all[m:2 * m]) \
                + rr_mod.mix(c_p, s_all[2 * m:])
            xn = rr_mod.mix(c_x, s_all[:m]) + pn
            hpn = rr_mod.mix(c_w, hs_all[m:2 * m]) \
                + rr_mod.mix(c_p, hs_all[2 * m:])
            hxn = rr_mod.mix(c_x, hs_all[:m]) + hpn

            if stage == "q2_slice_mix":
                return (it + 1, xn + 0.0 * theta.sum().astype(cdt) * xn,
                        hxn, pn, res_his.at[it].set(jnp.linalg.norm(res)))

            # q3_cond: the full two-branch cond structure
            status = jnp.where(jnp.isnan(res).any(), 3,
                               jnp.where(jnp.max(res) < 1e-12, 1, 0)
                               ).astype(jnp.int32)

            def finish(_):
                return (jnp.asarray(99, jnp.int32), x, hx, p, res_his)

            def step(_):
                return (it + 1, xn, hxn, pn,
                        res_his.at[it].set(jnp.linalg.norm(res)))

            return lax.cond(status != 0, finish, step, None)

        fin = lax.while_loop(cond_fun, body, state)
        return fin[0], jnp.abs(fin[1]).max(), fin[4]

    it, mx, his = jax.jit(boundary.real_boundary(core))(
        jnp.asarray(ar, jnp.float32), jnp.asarray(ai, jnp.float32), x0)
    # ok = COMPILED AND RAN.  The synthetic updates diverge numerically by
    # design (q1/q2 overflow in a few iterations); the bisect only asks
    # whether the structure is accepted by the backend.
    return {"ok": True, "it": int(it), "maxabs": float(mx)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None)
    ap.add_argument("--out", default="bench_logs/gep_body_bisect.jsonl")
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
