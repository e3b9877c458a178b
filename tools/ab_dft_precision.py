#!/usr/bin/env python
"""A/B the matmul-DFT dot precision (HIGHEST 6-pass vs HIGH 3-pass) for the
pair operator apply: time and added-noise measurement on the device.

Usage: python tools/ab_dft_precision.py [--n 96] [--m 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

from pcx import boundary
from pcx.bandstructure import KPointSolver
from pcx.config import ProblemConfig
from pcx.operators import rs


@jax.jit
def _probe(leaves):
    return sum(jnp.sum(l.ravel()[:8].astype(jnp.float32)) for l in leaves)


def _force(out):
    float(_probe([l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "ravel")]))


def timeit(name, fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:9.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--m", type=int, default=16)
    args = ap.parse_args()
    n, m = args.n, args.m

    cfg = ProblemConfig(n=n, lattice="sc_curv", diel_type="chiral", nev=10)
    solver = KPointSolver(cfg, dtype=jnp.complex64)
    d_a, b, inv, shift = solver.symbols_for(np.array([np.pi, 0.0, 0.0]))
    put = jax.device_put

    def pair(x):
        if isinstance(x, boundary.CArr):
            ri = np.asarray(x.ri)
            return (put(ri[..., 0]), put(ri[..., 1]))
        x = np.asarray(x)
        return (put(np.ascontiguousarray(x.real)),
                put(np.ascontiguousarray(x.imag)))

    d_ap = pair(d_a)
    b_diag = put(np.asarray(b.diag))
    b_sd = pair(b.sdiag)
    wfm = pair(solver.dft.fwd)
    wim = pair(solver.dft.inv)
    diel = solver.diel
    sh = np.float32(shift)

    r = np.random.default_rng(0)
    shape = (m, 3, n, n, n)
    x5 = (put(r.standard_normal(shape, dtype=np.float32)),
          put(r.standard_normal(shape, dtype=np.float32)))

    def h(prec):
        def f(v):
            return rs.ama_bb_p(v, d_ap, b_diag, b_sd, diel, wfm, wim,
                               shift=sh, precision=prec)
        return jax.jit(f)

    h_hi = h(lax.Precision.HIGHEST)
    h_med = h(lax.Precision.HIGH)
    h_lo = h(lax.Precision.DEFAULT)

    timeit("ama_bb_p HIGHEST (6-pass)", h_hi, x5)
    timeit("ama_bb_p HIGH (3-pass)", h_med, x5)
    timeit("ama_bb_p DEFAULT (1-pass bf16)", h_lo, x5)

    y_hi = h_hi(x5)
    y_med = h_med(x5)
    y_lo = h_lo(x5)

    @jax.jit
    def reldiff(a, bb):
        num = jnp.sqrt(jnp.sum((a[0]-bb[0])**2 + (a[1]-bb[1])**2))
        den = jnp.sqrt(jnp.sum(a[0]**2 + a[1]**2))
        return num / den
    print(f"HIGH  vs HIGHEST rel err: {float(reldiff(y_hi, y_med)):.3e}",
          flush=True)
    print(f"DEFLT vs HIGHEST rel err: {float(reldiff(y_hi, y_lo)):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
