"""Block Davidson and Jacobi-Davidson eigensolvers (archive parity).

Reference: paper_1_python/eigen_solver.py:848-983 (davidson_sep) and
:985-1124 (jd_sep) — these exist only in the Paper-1 archive.  TPU-native
redesign: a FIXED-capacity subspace with a fill mask under one jit'd
``lax.while_loop`` (no dynamic basis growth); when the basis is full it
restarts from the current Ritz block.  The Jacobi-Davidson variant expands
with approximate solutions of the projected correction equation
    (I - X X^H)(H - theta)(I - X X^H) t = -r
by a fixed number of preconditioned CG steps.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pcx.config import MAXITER, N_SUBSPACE, TOL
from pcx.solvers import rayleigh_ritz as rr_mod
from pcx.solvers.lobpcg import SolveResult, Status, _col_normalize
from pcx.utils import norms


class _DState(NamedTuple):
    it: jnp.ndarray
    status: jnp.ndarray
    lambdas: jnp.ndarray
    x: jnp.ndarray          # (m, D...) current Ritz block
    hx: jnp.ndarray
    v: jnp.ndarray          # (cap, D...) basis storage
    hv: jnp.ndarray
    fill: jnp.ndarray       # (cap,) 0/1 fill mask
    res_his: jnp.ndarray


def _davidson(h_func: Callable, p_func: Callable, x0: jnp.ndarray, nev: int,
              correction: str, tol: float, maxiter: int, cap: int,
              inner_steps: int) -> SolveResult:
    m = x0.shape[0]
    cdtype = x0.dtype
    rdtype = jnp.zeros((), cdtype).real.dtype
    tiny = float(jnp.finfo(rdtype).tiny ** 0.5)
    jitter = 100.0 * float(jnp.finfo(rdtype).eps)
    bshape = (-1,) + (1,) * (x0.ndim - 1)
    shape_rest = x0.shape[1:]

    def flat(a):
        return a.reshape(a.shape[0], -1)

    # Init: orthonormal X, Ritz rotate.
    x, _ = _col_normalize(x0, tiny)
    xf, _ = rr_mod.masked_loewdin(flat(x), jnp.ones(m, rdtype), jitter)
    hxf = flat(h_func(xf.reshape(x.shape)))
    t_re, t_im = rr_mod.gram_f64(xf, hxf)
    theta0, vr, vi = rr_mod.eigh_f64_embedding(0.5 * (t_re + t_re.T),
                                               0.5 * (t_im - t_im.T))
    c0 = jax.lax.complex(vr.astype(rdtype), vi.astype(rdtype)).astype(cdtype)
    x = rr_mod.mix(c0, xf).reshape(x.shape)
    hx = rr_mod.mix(c0, hxf).reshape(x.shape)

    v0 = jnp.zeros((cap,) + shape_rest, cdtype)
    hv0 = jnp.zeros_like(v0)
    v0 = v0.at[:m].set(x)
    hv0 = hv0.at[:m].set(hx)
    fill0 = jnp.concatenate([jnp.ones(m, rdtype), jnp.zeros(cap - m, rdtype)])

    state0 = _DState(jnp.asarray(0, jnp.int32),
                     jnp.asarray(Status.RUNNING, jnp.int32),
                     theta0[:m].astype(rdtype), x, hx, v0, hv0, fill0,
                     jnp.full((maxiter,), jnp.nan, rdtype))

    def correction_block(r, x, lambdas):
        """New search directions from the residual block."""
        if correction == "davidson":
            # Diagonal/preconditioned Davidson correction t = P r.
            return p_func(r)
        # Jacobi-Davidson: approximately solve the projected correction
        # equation with `inner_steps` preconditioned CG iterations.
        xf = flat(x)

        def proj(z):
            zf = flat(z)
            coeff = rr_mod.gram(xf, zf)
            return (zf - rr_mod.mix(coeff, xf)).reshape(z.shape)

        lam = lambdas.reshape(bshape).astype(cdtype)

        def a_op(z):
            return proj(h_func(proj(z)) - lam * proj(z))

        b = proj(-r)
        t = jnp.zeros_like(b)
        res = b - a_op(t)
        z = proj(p_func(res))
        p = z
        rz = jnp.sum((res.conj() * z).real, axis=tuple(range(1, b.ndim)))

        def cg_body(_, carry):
            t, res, p, rz = carry
            ap = a_op(p)
            pap = jnp.sum((p.conj() * ap).real,
                          axis=tuple(range(1, b.ndim)))
            alpha = (rz / jnp.where(jnp.abs(pap) > tiny, pap, 1.0))
            alpha_c = alpha.reshape(bshape).astype(cdtype)
            t = t + alpha_c * p
            res = res - alpha_c * ap
            z = proj(p_func(res))
            rz_new = jnp.sum((res.conj() * z).real,
                             axis=tuple(range(1, b.ndim)))
            beta = rz_new / jnp.where(jnp.abs(rz) > tiny, rz, 1.0)
            p = z + beta.reshape(bshape).astype(cdtype) * p
            return t, res, p, rz_new

        t, _, _, _ = lax.fori_loop(0, inner_steps, cg_body, (t, res, p, rz))
        return t

    def cond_fun(s):
        return (s.status == Status.RUNNING) & (s.it < maxiter)

    def body_fun(s):
        it = s.it
        r = s.lambdas.reshape(bshape).astype(cdtype) * s.x - s.hx
        res = norms(r)
        res_his = s.res_his.at[it].set(jnp.linalg.norm(res[:nev]))
        converged = jnp.max(res[:nev]) < tol
        is_nan = jnp.isnan(res).any()
        status = jnp.where(is_nan, Status.NAN,
                           jnp.where(converged, Status.CONVERGED,
                                     Status.RUNNING)).astype(jnp.int32)

        def finish(_):
            return s._replace(it=it, status=status, res_his=res_his)

        def step(_):
            n_fill = jnp.sum(s.fill).astype(jnp.int32)
            restart = n_fill + m > cap

            # On restart the basis collapses to the current Ritz block.
            v = jnp.where(restart, jnp.zeros_like(s.v),
                          s.v)
            hv = jnp.where(restart, jnp.zeros_like(s.hv), s.hv)
            v = jnp.where(restart, v.at[:m].set(s.x), v)
            hv = jnp.where(restart, hv.at[:m].set(s.hx), hv)
            fill = jnp.where(restart,
                             jnp.concatenate([jnp.ones(m, rdtype),
                                              jnp.zeros(cap - m, rdtype)]),
                             s.fill)
            n_fill = jnp.sum(fill).astype(jnp.int32)

            # New directions: correction block, orthogonalized against the
            # filled basis, Loewdin-orthonormalized, written at n_fill.
            t = correction_block(r, s.x, s.lambdas)
            tf, _ = _col_normalize(flat(t), tiny)
            vf = flat(v) * fill[:, None].astype(cdtype)
            tf, _ = rr_mod.project_off(tf, vf)
            rho = norms(tf)
            ok = (rho > 1e3 * jnp.finfo(rdtype).eps).astype(rdtype)
            tf = tf * ok[:, None].astype(cdtype)
            tf, _ = rr_mod.masked_loewdin(tf, ok, jitter, passes=2)
            ht = h_func(tf.reshape(s.x.shape))

            # Scatter the new columns into the storage at [n_fill, ...).
            idx = n_fill + jnp.cumsum(ok).astype(jnp.int32) - 1
            idx = jnp.where(ok > 0, idx, cap - 1)  # dead cols -> overwrite
            v = flat(v).at[idx].set(
                jnp.where(ok[:, None] > 0, tf, flat(v)[idx])).reshape(v.shape)
            hv = flat(hv).at[idx].set(
                jnp.where(ok[:, None] > 0, flat(ht),
                          flat(hv)[idx])).reshape(hv.shape)
            fill = fill.at[idx].set(jnp.where(ok > 0, 1.0, fill[idx]))

            # Rayleigh-Ritz over the filled basis (phantom-masked).
            vf, hvf = flat(v), flat(hv)
            keep = fill[:, None] * fill[None, :]
            t_re, t_im = rr_mod.gram_f64(vf * fill[:, None].astype(cdtype),
                                         hvf)
            t_re = 0.5 * (t_re + t_re.T) * keep.astype(jnp.float64)
            t_im = 0.5 * (t_im - t_im.T) * keep.astype(jnp.float64)
            dead_val = jnp.sqrt(jnp.sum(t_re**2) + jnp.sum(t_im**2)) + 1.0
            t_re = t_re - dead_val * jnp.diag(1.0 - fill).astype(jnp.float64)
            theta_all, u_re, u_im = rr_mod.eigh_f64_embedding(t_re, t_im)
            n_dead = (cap - jnp.sum(fill)).astype(jnp.int32)
            theta = lax.dynamic_slice(theta_all, (n_dead,), (m,))
            c = lax.dynamic_slice(
                jax.lax.complex(u_re.astype(rdtype),
                                u_im.astype(rdtype)).astype(cdtype),
                (jnp.int32(0), n_dead), (cap, m))
            c = c * fill[:, None].astype(cdtype)
            x_new = rr_mod.mix(c, vf).reshape(s.x.shape)
            hx_new = rr_mod.mix(c, hvf).reshape(s.x.shape)

            return _DState(it + 1, jnp.asarray(Status.RUNNING, jnp.int32),
                           theta.astype(rdtype), x_new, hx_new, v, hv, fill,
                           res_his)

        return lax.cond(status != Status.RUNNING, finish, step, None)

    final = lax.while_loop(cond_fun, body_fun, state0)
    status = jnp.where(final.status == Status.RUNNING, Status.MAXITER,
                       final.status).astype(jnp.int32)
    return SolveResult(final.lambdas, final.x, final.it, status,
                       final.res_his)


def davidson_sep(h_func, p_func, x0, nev, tol: float = TOL,
                 maxiter: int = MAXITER, subspace: int = N_SUBSPACE,
                 **_) -> SolveResult:
    """Preconditioned block Davidson (reference: davidson_sep,
    paper_1_python/eigen_solver.py:848-983)."""
    return _davidson(h_func, p_func, x0, nev, "davidson", tol, maxiter,
                     max(subspace, 3 * x0.shape[0]), 0)


def jd_sep(h_func, p_func, x0, nev, tol: float = TOL,
           maxiter: int = MAXITER, subspace: int = N_SUBSPACE,
           inner_steps: int = 5, **_) -> SolveResult:
    """Block Jacobi-Davidson with CG-solved correction equation
    (reference: jd_sep, paper_1_python/eigen_solver.py:985-1124)."""
    return _davidson(h_func, p_func, x0, nev, "jd", tol, maxiter,
                     max(subspace, 3 * x0.shape[0]), inner_steps)
