"""Unrolled lobpcg_sep_rs iteration with per-phase NaN/magnitude probes.

Replicates the body of pcx.solvers.lobpcg_rs.lobpcg_sep_rs as a Python loop
of ONE jitted iteration that also returns per-phase diagnostics, to localize
where NaN first appears on the axon TPU (the while_loop version only reports
the final status).  Usage: python tools/debug_nan_rs.py [N] [maxit]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from pcx.bandstructure import KPointSolver
from pcx.config import ProblemConfig
from pcx.operators import rs
from pcx.solvers import rayleigh_ritz as rr


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    maxit = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = ProblemConfig(n=n, lattice="sc_curv", nev=10)
    ks = KPointSolver(cfg, dtype=jnp.complex64)
    alpha = np.array([np.pi, 0.0, 0.0])
    m = ks.block_width(alpha)
    nev, tol = cfg.nev, ks.tol

    d_a, b, inv, shift = ks.symbols_for(alpha)
    put = jax.device_put

    def pair(x):
        """CArr (rb mode) or complex ndarray -> device pair."""
        from pcx import boundary
        if isinstance(x, boundary.CArr):
            ri = np.asarray(x.ri)
            return (put(ri[..., 0]), put(ri[..., 1]))
        x = np.asarray(x)
        return (put(np.ascontiguousarray(x.real)),
                put(np.ascontiguousarray(x.imag)))

    d_ap = pair(d_a)
    b_diag = put(np.asarray(b.diag))
    b_sd = pair(b.sdiag)
    inv_diag = put(np.asarray(inv.diag))
    inv_sd = pair(inv.sdiag)
    wf = pair(ks.dft.fwd)
    wi = pair(ks.dft.inv)
    diel = ks.diel
    sh = np.float32(shift)

    rng = np.random.default_rng(0)
    x0h = rng.standard_normal((m, 3, n, n, n), dtype=np.float32)
    y0h = rng.standard_normal((m, 3, n, n, n), dtype=np.float32)
    x0 = (put(x0h), put(y0h))

    rdtype = jnp.float32
    dim = 3 * n**3
    noise_floor = 30.0 * (dim**0.5) * float(jnp.finfo(rdtype).eps)
    tiny = float(jnp.finfo(rdtype).tiny ** 0.5)
    shape = (m, 3, n, n, n)
    ones_m = jnp.ones((m,), rdtype)
    rr_split = rr.split_for(rdtype)

    def h_func(v):
        return rs.ama_bb_p(v, d_ap, b_diag, b_sd, diel, wf, wi, shift=sh)

    def p_func(v):
        return rs.h_block_p(v, inv_diag, inv_sd)

    def flat(a):
        return (a[0].reshape(m, -1), a[1].reshape(m, -1))

    def unflat(a):
        return (a[0].reshape(shape), a[1].reshape(shape))

    def nanmax(t, x):
        t[f"nan"] = t.get("nan", False) | bool(jnp.isnan(x).any())

    @jax.jit
    def init(x):
        n0 = rr.colnorms_p(flat(x), axis_name=None)
        x = rr.scale_cols_p(x, 1.0 / jnp.maximum(n0, tiny))
        xf, _, _ = rr.masked_svqb_drop_p(flat(x), ones_m, noise_floor,
                                         axis_name=None, passes=1)
        hxf = flat(h_func(unflat(xf)))
        t_re, t_im = rr.gram_f64_p(xf, hxf, axis_name=None)
        theta0, v_re, v_im = rr.eigh_f64_embedding(
            0.5 * (t_re + t_re.T), 0.5 * (t_im - t_im.T), split=rr_split)
        c0 = (v_re.astype(rdtype), v_im.astype(rdtype))
        xf = rr.mix_pair(c0, xf)
        hxf = rr.mix_pair(c0, hxf)
        return xf, hxf, theta0.astype(rdtype)

    @jax.jit
    def iteration(xf, hxf, pf_, hpf_, lambdas, it):
        diag = {}
        lam_col = lambdas[:, None]
        r = (lam_col * xf[0] - hxf[0], lam_col * xf[1] - hxf[1])
        res = rr.colnorms_p(r, axis_name=None)
        diag["res_max_nev"] = jnp.max(res[:nev])
        diag["nan_r"] = jnp.isnan(res).any()

        active = (res > tol).astype(rdtype)
        acol = active[:, None]
        w = p_func(unflat((acol * r[0], acol * r[1])))
        wfl = flat(w)
        wfl = (acol * wfl[0], acol * wfl[1])
        diag["nan_w_pre"] = (jnp.isnan(wfl[0]).any() | jnp.isnan(wfl[1]).any())
        diag["w_absmax"] = jnp.maximum(jnp.max(jnp.abs(wfl[0])),
                                       jnp.max(jnp.abs(wfl[1])))
        wn = rr.colnorms_p(wfl, axis_name=None)
        diag["wn_min"] = jnp.min(wn)
        diag["wn_max"] = jnp.max(wn)
        wfl = rr.scale_cols_p(wfl, 1.0 / jnp.maximum(wn, tiny))
        w_pre = wfl
        wfl, _, w_ok = rr.masked_svqb_drop_p(
            wfl, active, noise_floor, against=(xf,), axis_name=None, passes=2)
        diag["nan_w_svqb"] = (jnp.isnan(wfl[0]).any()
                              | jnp.isnan(wfl[1]).any())
        diag["w_ok_sum"] = jnp.sum(w_ok)
        hwf = flat(h_func(unflat(wfl)))
        diag["nan_hw"] = jnp.isnan(hwf[0]).any() | jnp.isnan(hwf[1]).any()

        p_act = active * (it > 0)
        pc = p_act[:, None]
        pf = (pc * pf_[0], pc * pf_[1])
        hpf = (pc * hpf_[0], pc * hpf_[1])
        pn = rr.colnorms_p(pf, axis_name=None)
        diag["pn_min"] = jnp.min(pn)
        inv_pn = (1.0 / jnp.maximum(pn, tiny))[:, None]
        pf = (inv_pn * pf[0], inv_pn * pf[1])
        hpf = (inv_pn * hpf[0], inv_pn * hpf[1])
        diag["nan_p_norm"] = jnp.isnan(pf[0]).any() | jnp.isnan(hpf[0]).any()
        pf, hpf, p_ok = rr.masked_svqb_drop_p(
            pf, p_act, noise_floor, hblock=hpf,
            against=(xf, wfl), h_against=(hxf, hwf),
            axis_name=None, passes=2)
        diag["nan_p_svqb"] = (jnp.isnan(pf[0]).any()
                              | jnp.isnan(hpf[0]).any())
        diag["p_ok_sum"] = jnp.sum(p_ok)

        basis_mask = jnp.concatenate((ones_m, w_ok, p_ok))
        blocks = (xf, wfl, pf)
        hblocks = (hxf, hwf, hpf)
        rows_re = [[None] * 3 for _ in range(3)]
        rows_im = [[None] * 3 for _ in range(3)]
        for i, bi in enumerate(blocks):
            for jj, hbj in enumerate(hblocks):
                tre, tim = rr.gram_f64_p(bi, hbj, axis_name=None)
                rows_re[i][jj] = tre
                rows_im[i][jj] = tim
        t_re = jnp.block(rows_re)
        t_im = jnp.block(rows_im)
        keep64 = (basis_mask[:, None] * basis_mask[None, :]).astype(
            jnp.float64)
        t_re = 0.5 * (t_re + t_re.T) * keep64
        t_im = 0.5 * (t_im - t_im.T) * keep64
        diag["nan_T"] = jnp.isnan(t_re).any() | jnp.isnan(t_im).any()
        diag["T_absmax"] = jnp.max(jnp.abs(t_re)) + jnp.max(jnp.abs(t_im))
        dead_val = jnp.sqrt(jnp.sum(t_re**2) + jnp.sum(t_im**2)) + 1.0
        t_re = t_re - dead_val * jnp.diag(1.0 - basis_mask).astype(jnp.float64)
        theta_all, v_re, v_im = rr.eigh_f64_embedding(t_re, t_im,
                                                      split=rr_split)
        diag["nan_eigh"] = (jnp.isnan(theta_all).any()
                            | jnp.isnan(v_re).any() | jnp.isnan(v_im).any())
        theta_all = theta_all.astype(rdtype)
        bm = basis_mask[:, None].astype(rdtype)
        c_all = (v_re.astype(rdtype) * bm, v_im.astype(rdtype) * bm)
        n_dead = (3 * m - jnp.sum(basis_mask)).astype(jnp.int32)
        theta = jax.lax.dynamic_slice(theta_all, (n_dead,), (m,))
        c_re = jax.lax.dynamic_slice(c_all[0], (jnp.int32(0), n_dead),
                                     (3 * m, m))
        c_im = jax.lax.dynamic_slice(c_all[1], (jnp.int32(0), n_dead),
                                     (3 * m, m))
        cx = (c_re[:m], c_im[:m])
        cw = (c_re[m:2 * m], c_im[m:2 * m])
        cp = (c_re[2 * m:], c_im[2 * m:])
        pw = rr.mix_pair(cw, wfl)
        pp = rr.mix_pair(cp, pf)
        p_new = (pw[0] + pp[0], pw[1] + pp[1])
        hw = rr.mix_pair(cw, hwf)
        hp2 = rr.mix_pair(cp, hpf)
        hp_new = (hw[0] + hp2[0], hw[1] + hp2[1])
        xc = rr.mix_pair(cx, xf)
        x_new = (xc[0] + p_new[0], xc[1] + p_new[1])
        hxc = rr.mix_pair(cx, hxf)
        hx_new = (hxc[0] + hp_new[0], hxc[1] + hp_new[1])
        diag["nan_xnew"] = jnp.isnan(x_new[0]).any() | jnp.isnan(x_new[1]).any()
        diag["theta_min"] = jnp.min(theta)
        diag["theta_max"] = jnp.max(theta)
        return (x_new, hx_new, p_new, hp_new, theta, res, diag,
                (t_re, t_im), (w_pre, xf, active))

    xf, hxf, lambdas = init(x0)
    zeros = (jnp.zeros_like(xf[0]), jnp.zeros_like(xf[1]))
    pf, hpf = zeros, zeros
    print(f"init: lambdas[:4]={np.asarray(lambdas)[:4]}")
    for it in range(maxit):
        xf, hxf, pf, hpf, lambdas, res, diag, tmat, svqb_in = iteration(
            xf, hxf, pf, hpf, lambdas, it)
        d = {k: (float(v) if v.dtype != jnp.bool_ else bool(v))
             for k, v in diag.items()}
        nans = [k for k, v in d.items() if k.startswith("nan") and v]
        print(f"it {it:3d} res={d['res_max_nev']:9.3e} "
              f"wn=[{d['wn_min']:.1e},{d['wn_max']:.1e}] "
              f"pn_min={d['pn_min']:.1e} ok=({d['w_ok_sum']:.0f},"
              f"{d['p_ok_sum']:.0f}) T={d['T_absmax']:.2e} "
              f"th=[{d['theta_min']:.2e},{d['theta_max']:.2e}]"
              + (f"  NAN: {nans}" if nans else ""), flush=True)
        if nans:
            np.savez("/tmp/nan_T.npz", t_re=np.asarray(tmat[0]),
                     t_im=np.asarray(tmat[1]))
            w_pre, xf_s, act = svqb_in
            np.savez("/tmp/nan_svqb.npz",
                     w_re=np.asarray(w_pre[0]), w_im=np.asarray(w_pre[1]),
                     x_re=np.asarray(xf_s[0]), x_im=np.asarray(xf_s[1]),
                     active=np.asarray(act))
            print("saved offending T + svqb inputs", flush=True)
            break


if __name__ == "__main__":
    main()
