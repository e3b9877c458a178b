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
    each (m, C) VMEM block) + 2 outputs (PER-CHUNK f32 partials
    (1, 3m, 3m); the caller reduces them in f64 — Mosaic has no 64-bit
    vector types on this backend, and per-chunk-f32 + cross-chunk-f64 is
    exactly the incumbent XLA path's chunked accumulation semantics)."""
    (xr, xi, wr, wi, pr, pi,
     hxr, hxi, hwr, hwi, hpr, hpi, out_re, out_im) = refs

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
            sl = (0, pl.ds(i * m, m), pl.ds(j * m, m))
            out_re[sl] = re
            out_im[sl] = im


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

    # Index-map zeros are derived from the (i32) grid index: under
    # jax_enable_x64, literal 0s trace as i64 and Mosaic refuses the mixed
    # i32/i64 index tuple ("failed to legalize func.return", observed on
    # the v5e AOT compiler 2026-08-17).
    in_spec = pl.BlockSpec((m, chunk), lambda c: (c * 0, c))
    out_spec = pl.BlockSpec((1, 3 * m, 3 * m), lambda c: (c, c * 0, c * 0))
    t_re, t_im = pl.pallas_call(
        _gram9_kernel,
        grid=(nc,),
        in_specs=[in_spec] * 12,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nc, 3 * m, 3 * m), jnp.float32),
                   jax.ShapeDtypeStruct((nc, 3 * m, 3 * m), jnp.float32)),
        interpret=interpret,
    )(*planes)
    # Cross-chunk reduction in f64 (outside the kernel).
    return (jnp.sum(t_re.astype(jnp.float64), axis=0),
            jnp.sum(t_im.astype(jnp.float64), axis=0))


def gram9_pairs_auto(x, w, p, hx, hw, hp, chunk: int = 2048):
    """fused_gram9_pairs with interpret mode auto-selected: compiled Pallas
    on TPU, interpreter on CPU (tests/virtual meshes)."""
    interpret = jax.default_backend() == "cpu"
    return fused_gram9_pairs(x, w, p, hx, hw, hp, chunk=chunk,
                             interpret=interpret)


# -- fused residual + preconditioner + column sum-squares ---------------------

def _resid_precond_kernel(cm, *refs):
    """Grid: (num_chunks,).  One HBM pass computing, per spatial chunk:
    the residual pair r = lam*x - hx, its per-column sum-of-squares
    (f64-accumulated), and the preconditioned block w = Hinv r (Hermitian
    3x3 symbol multiply).  Unfused XLA needs ~4 passes over the block
    (r materialize, colnorms read, precond read, w write); this reads x/hx
    once and writes w once.

    ``cm``: blocks arrive component-major (3, m, chunk) instead of
    (m, 3, chunk) — see :func:`fused_resid_precond`."""
    (xr, xi, hxr, hxi, lam, idiag, isdr, isdi,
     wr, wi, ss) = refs
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        ss[:, :] = jnp.zeros_like(ss)

    lam_c = lam[:, 0:1]                      # (m, 1) broadcast column
    comp = ((lambda ref, k: ref[k]) if cm
            else (lambda ref, k: ref[:, k, :]))
    m = xr.shape[1] if cm else xr.shape[0]
    chunk = xr.shape[2]
    r_re, r_im = [], []
    acc = jnp.zeros((m, chunk), jnp.float32)
    for k in range(3):
        rr_ = lam_c * comp(xr, k) - comp(hxr, k)
        ri_ = lam_c * comp(xi, k) - comp(hxi, k)
        r_re.append(rr_)
        r_im.append(ri_)
        acc = acc + (rr_ * rr_ + ri_ * ri_)
    # fold the chunk into 128 lanes; the caller sums the lanes.  f32
    # accumulation matches the incumbent colnorms_p semantics (and Mosaic
    # f64 vector support is not guaranteed on all TPU generations).
    ss[:, :] += acc.reshape(m, chunk // 128, 128).sum(axis=1)

    # Hermitian 3x3 block multiply with the inverse-penalty symbol:
    # diag REAL (3, C), sdiag = (s12, s13, s23) pair (3, C); row pattern
    #   y0 = d0 r0 + s12 r1 + s13 r2
    #   y1 = conj(s12) r0 + d1 r1 + s23 r2
    #   y2 = conj(s13) r0 + conj(s23) r1 + d2 r2   (operators/rs.h_block_p)
    d = [idiag[k, :] for k in range(3)]
    sr = [isdr[k, :] for k in range(3)]
    si = [isdi[k, :] for k in range(3)]

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    rows = ((0, (None, 0, 1), (False, False, False)),
            (1, (0, None, 2), (True, False, False)),
            (2, (1, 2, None), (True, True, False)))
    for row, ss_idx, conj_f in rows:
        yr = d[row] * r_re[row]
        yi = d[row] * r_im[row]
        for col in range(3):
            j = ss_idx[col]
            if j is None:
                continue
            sgn = -1.0 if conj_f[col] else 1.0
            pr_, pi_ = cmul(sr[j], sgn * si[j], r_re[col], r_im[col])
            yr = yr + pr_
            yi = yi + pi_
        if cm:
            wr[row] = yr
            wi[row] = yi
        else:
            wr[:, row, :] = yr
            wi[:, row, :] = yi


def fused_resid_precond(x, hx, lam, inv_diag, inv_sd, chunk: int = 2048,
                        interpret: bool = False, layout: str = "mc"):
    """(w_raw, res_sumsq) from pair blocks x, hx of shape (m, 3, D) f32,
    Ritz values lam (m,), and the preconditioner symbol (diag REAL (3, D),
    sdiag pair (3, D)).  w_raw = Hinv (lam x - hx) UNMASKED (the
    per-column locking mask commutes with the column-local precondition);
    res_sumsq is the per-column ||r||^2 (f32, as colnorms_p).

    ``layout="cm"`` stages the HBM buffers component-major (3, m, Dp): a
    (m, 3, Dp) buffer tiles T(4, 128) and pads the 3-axis to 4 — +33% on
    the largest allocations in the program (the N=150 iter1 compile OOMed
    by 27.6 MB while two such 824 MB buffers carried 206 MB of pure
    padding each).  Component-major keeps the (m, Dp) trailing dims on the
    native T(8, 128) tile at <0.01% padding.  "cm" is the production
    default since the on-device A/B validated it (bench_logs/ab_tpu7:
    452.9 vs 467.2 ms/iter, validation 8.3e-8) — it also reclaims the
    ~412 MB of tile padding that kept N=150 27.6 MB over the v5e HBM
    budget; "mc" remains selectable via solver_opts {"rp_layout": "mc"}."""
    cm = layout == "cm"
    m, three, d = x[0].shape
    assert three == 3
    assert chunk % 128 == 0
    nc = -(-d // chunk)
    pad = nc * chunk - d

    def prep(a, transpose=True):
        a = a.astype(jnp.float32)
        if cm and transpose:               # (m, 3, D) -> (3, m, D)
            a = a.transpose(1, 0, 2)
        if pad:
            width = ((0, 0),) * (a.ndim - 1) + ((0, pad),)
            a = jnp.pad(a, width)
        return a

    planes = [prep(a) for a in (x[0], x[1], hx[0], hx[1])]
    lam128 = jnp.broadcast_to(lam.astype(jnp.float32)[:, None], (m, 128))
    syms = [prep(a, transpose=False) for a in (inv_diag, inv_sd[0],
                                               inv_sd[1])]

    bshape = (3, m, chunk) if cm else (m, 3, chunk)
    wshape = (3, m, nc * chunk) if cm else (m, 3, nc * chunk)
    # i32-derived index-map zeros: see _gram9_call.
    blk = pl.BlockSpec(bshape, lambda c: (c * 0, c * 0, c))
    sblk = pl.BlockSpec((3, chunk), lambda c: (c * 0, c))
    lamblk = pl.BlockSpec((m, 128), lambda c: (c * 0, c * 0))
    ssblk = pl.BlockSpec((m, 128), lambda c: (c * 0, c * 0))
    wr, wi, ss = pl.pallas_call(
        partial(_resid_precond_kernel, cm),
        grid=(nc,),
        in_specs=[blk, blk, blk, blk, lamblk, sblk, sblk, sblk],
        out_specs=(blk, blk, ssblk),
        out_shape=(jax.ShapeDtypeStruct(wshape, jnp.float32),
                   jax.ShapeDtypeStruct(wshape, jnp.float32),
                   jax.ShapeDtypeStruct((m, 128), jnp.float32)),
        interpret=interpret,
    )(*planes, lam128, *syms)
    if pad:
        wr, wi = wr[:, :, :d], wi[:, :, :d]
    if cm:
        wr, wi = wr.transpose(1, 0, 2), wi.transpose(1, 0, 2)
    return (wr, wi), jnp.sum(ss, axis=1)


def resid_precond_auto(x, hx, lam, inv_diag, inv_sd, chunk: int = 2048,
                       layout: str = "mc"):
    """fused_resid_precond with interpret mode auto-selected."""
    interpret = jax.default_backend() == "cpu"
    return fused_resid_precond(x, hx, lam, inv_diag, inv_sd, chunk=chunk,
                               interpret=interpret, layout=layout)


# -- fused DFT-with-transpose (one axis pass) ---------------------------------
#
# The matmul-DFT (operators/dft.py, rs.dft3_p) contracts the -3rd spatial
# axis per pass; XLA lowers that to transpose-then-GEMM, materializing a
# relayout of the full block in HBM per axis (the dominant per-iteration
# cost in the round-1 ablation profile — the apply runs ~3x its traffic
# roofline).  This kernel fuses the transpose INTO the blocked VMEM DMA:
# each grid step loads an (A, jt, K) brick of the (B, A, J, K) input
# (strided read — the relayout rides the DMA, overlapped with compute),
# contracts A on the MXU, and writes the cyclic-permuted (jt, K, A') brick.
# One HBM read + one write per axis pass, no separate transpose pass.
#
# Complex arithmetic is ONE stacked real matmul per brick row:
# [Xre; Xim]^T (K, 2A) @ [[wr, wi], [-wi, wr]] (2A, 2A') = [Yre | Yim]
# (the same 2A-deep MXU trick as rs.dft3_p's stacked dot, here per-tile).


def _axis_dft_kernel(xr, xi, w2, outr, outi):
    """Grid: (B, J // jt).  xr/xi: (1, A, jt, K) VMEM bricks; w2: (2A, 2A')
    stacked twiddle; outr/outi: (1, jt, K, A')."""
    jt = xr.shape[2]
    a2 = w2.shape[1] // 2
    w2v = w2[:, :]
    dims = (((0,), (0,)), ((), ()))
    for t in range(jt):
        x2 = jnp.concatenate([xr[0, :, t, :], xi[0, :, t, :]], axis=0)
        y = jax.lax.dot_general(x2, w2v, dims,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        outr[0, t, :, :] = y[:, :a2]
        outi[0, t, :, :] = y[:, a2:]


def _jt_for(j: int, target: int = 8) -> int:
    """TPU-legal brick row count.  The Mosaic lowering requires the block's
    second-to-last dim to be a multiple of 8 or the full axis, so a divisor
    of j is NOT sufficient (N=150 -> jt=6 refused to compile; N=100 -> 5
    likewise).  j <= target: take the whole axis (always legal); else
    bricks of ``target`` rows on a cdiv grid — the trailing brick is
    hardware-padded, and since every output row is independent (the DFT
    contracts the A axis, never J), the dropped out-of-bounds rows are
    harmless."""
    return j if j <= target else target


def stacked_twiddle(w):
    """(2A, 2A') f32 stacked twiddle from an (A, A') complex-pair tuple:
    [[wr, wi], [-wi, wr]] — one real matmul applies the complex DFT."""
    wr, wi = (a.astype(jnp.float32) for a in w)
    return jnp.block([[wr, wi], [-wi, wr]])


def axis_dft_pairs(x, w2, jt: int = 0, interpret: bool = False):
    """One DFT axis pass on an f32 pair: (B, A, J, K) -> (B, J, K, A'),
    contracting A (the -3rd axis) and appending the transformed axis last
    (the cyclic layout of rs.dft3_p)."""
    xr, xi = x
    b, a, j, k = xr.shape
    jt = jt or _jt_for(j)
    a2 = w2.shape[1] // 2
    # i32-derived index-map zeros: see _gram9_call.
    in_spec = pl.BlockSpec((1, a, jt, k),
                           lambda bb, jj: (bb, jj * 0, jj, jj * 0))
    w_spec = pl.BlockSpec((2 * a, 2 * a2),
                          lambda bb, jj: (jj * 0, jj * 0))
    out_spec = pl.BlockSpec((1, jt, k, a2),
                            lambda bb, jj: (bb, jj, jj * 0, jj * 0))
    outr, outi = pl.pallas_call(
        _axis_dft_kernel,
        grid=(b, -(-j // jt)),
        in_specs=[in_spec, in_spec, w_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, j, k, a2), jnp.float32),
                   jax.ShapeDtypeStruct((b, j, k, a2), jnp.float32)),
        interpret=interpret,
    )(xr.astype(jnp.float32), xi.astype(jnp.float32), w2)
    return outr, outi


def dft3_pairs_fused(x, w, jt: int = 0, interpret: bool = False):
    """3-D DFT over the last three axes of an f32 pair via three fused
    axis passes (drop-in for rs.dft3_p on f32 pairs; leading dims are
    flattened to one batch axis and restored)."""
    xr, xi = x
    lead = xr.shape[:-3]
    n3 = xr.shape[-3:]
    b = 1
    for s in lead:
        b *= s
    cur = (xr.reshape((b,) + n3), xi.reshape((b,) + n3))
    w2 = stacked_twiddle(w)
    for _ in range(3):
        cur = axis_dft_pairs(cur, w2, jt=jt, interpret=interpret)
    return (cur[0].reshape(lead + n3), cur[1].reshape(lead + n3))


def dft3_pairs_auto(x, w, jt: int = 0):
    """dft3_pairs_fused with interpret mode auto-selected."""
    interpret = jax.default_backend() == "cpu"
    return dft3_pairs_fused(x, w, jt=jt, interpret=interpret)
