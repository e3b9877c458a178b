"""Pallas TPU kernels for the bandwidth-critical fused multi-Gram.

The Rayleigh-Ritz matrix T = S^H (HS) over the blocked basis S = [X|W|P]
needs 9 (m x m) block Grams.  As independent XLA dot_generals each pair
re-reads its operands from HBM (X is read 3x, HX 3x, ...).  This kernel
streams each of the six (m, D) blocks through VMEM ONCE per D-chunk and
accumulates all 9 complex blocks in float64 on the fly — the reads drop
from ~18 block-passes to 6, and the f64 accumulation (complex128 is
unsupported on TPU) happens in-register instead of via (nc, p, q) partial
stacks.

Complex data travels as split (re, im) f32 planes (complex dot_general is
unimplemented on the target backend).  Correctness is tested in interpret
mode on CPU; enable on TPU via solver_opts={"rr_gram": "pallas"} once
microbenchmarked.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gram9_kernel(*refs):
    """Grid: (num_chunks,).  refs = 12 inputs (x/w/p re+im, hx/hw/hp re+im,
    each (m, C) VMEM block) + 2 outputs (t_re, t_im, (3m, 3m) f64)."""
    (xr, xi, wr, wi, pr, pi,
     hxr, hxi, hwr, hwi, hpr, hpi, out_re, out_im) = refs
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_re[:, :] = jnp.zeros_like(out_re)
        out_im[:, :] = jnp.zeros_like(out_im)

    a_blocks = ((xr, xi), (wr, wi), (pr, pi))
    b_blocks = ((hxr, hxi), (hwr, hwi), (hpr, hpi))
    m = xr.shape[0]
    dims = (((1,), (1,)), ((), ()))

    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    for i, (ar, ai) in enumerate(a_blocks):
        arv, aiv = ar[:, :], ai[:, :]
        for j, (br, bi) in enumerate(b_blocks):
            brv, biv = br[:, :], bi[:, :]
            # conj(a) . b^T  =  (ar - i ai) (br + i bi)^T
            re = dot(arv, brv) + dot(aiv, biv)
            im = dot(arv, biv) - dot(aiv, brv)
            sl = (pl.ds(i * m, m), pl.ds(j * m, m))
            out_re[sl] += re.astype(jnp.float64)
            out_im[sl] += im.astype(jnp.float64)


def fused_gram9_pairs(x, w, p, hx, hw, hp, chunk: int = 2048,
                      interpret: bool = False):
    """Pair-input entry point: each argument is an (re, im) tuple of f32
    (m, D) planes (the lobpcg_rs layout — no complex split needed)."""
    m, d = x[0].shape
    nc = -(-d // chunk)
    pad = nc * chunk - d

    def prep_plane(a):
        a = a.astype(jnp.float32)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a

    planes = [prep_plane(pl_) for blk in (x, w, p, hx, hw, hp)
              for pl_ in blk]
    return _gram9_call(planes, m, nc, chunk, interpret)


def fused_gram9(x, w, p, hx, hw, hp, chunk: int = 2048,
                interpret: bool = False):
    """T = [X|W|P]^H [HX|HW|HP] with f64 accumulation, one HBM pass per
    block.  Inputs: complex64/128 (m, D) row-blocks.  Returns (t_re, t_im)
    float64 (3m, 3m)."""
    m, d = x.shape
    nc = -(-d // chunk)
    pad = nc * chunk - d

    def prep(a):
        a32 = a.astype(jnp.complex64)
        re, im = a32.real, a32.imag
        if pad:
            re = jnp.pad(re, ((0, 0), (0, pad)))
            im = jnp.pad(im, ((0, 0), (0, pad)))
        return re, im

    planes = []
    for a in (x, w, p, hx, hw, hp):
        planes.extend(prep(a))
    return _gram9_call(planes, m, nc, chunk, interpret)


def _gram9_call(planes, m, nc, chunk, interpret):

    in_spec = pl.BlockSpec((m, chunk), lambda c: (0, c))
    out_spec = pl.BlockSpec((3 * m, 3 * m), lambda c: (0, 0))
    t_re, t_im = pl.pallas_call(
        _gram9_kernel,
        grid=(nc,),
        in_specs=[in_spec] * 12,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((3 * m, 3 * m), jnp.float64),
                   jax.ShapeDtypeStruct((3 * m, 3 * m), jnp.float64)),
        interpret=interpret,
    )(*planes)
    return t_re, t_im


def gram9_pairs_auto(x, w, p, hx, hw, hp, chunk: int = 2048):
    """fused_gram9_pairs with interpret mode auto-selected: compiled Pallas
    on TPU, interpreter on CPU (tests/virtual meshes)."""
    interpret = jax.default_backend() == "cpu"
    return fused_gram9_pairs(x, w, p, hx, hw, hp, chunk=chunk,
                             interpret=interpret)
