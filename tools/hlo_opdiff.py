#!/usr/bin/env python
"""StableHLO op-set diff between TPU-passing and TPU-failing smoke variants.

The axon remote compiler reports a bare ``UNIMPLEMENTED: TPU backend error``
with no op name, so the only cheap way to localize the refused op is static:
lower each variant's smoke core to StableHLO on CPU (lowering is platform-
independent at this level), collect the op mnemonics, and print what the
failing programs contain that every passing program does not.

Runs entirely on CPU; never attaches to the tunnel.
"""

import os
import sys
from collections import defaultdict

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import re

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from tools.tpu_smoke import build_np  # noqa: E402

PASSING = ["softlock", "mixed", "descent"]
FAILING = ["max", "gep", "descent_gep", "default"]


def core_for(name, n=16, tol=1e-3, maxiter=50):
    from pcx import boundary
    from pcx.operators import maxwell
    from pcx.operators.blocks import h_block
    from pcx.solvers import lobpcg as lob

    e = build_np(n, np.complex64)
    shift = e["shift"]

    def mk(solver):
        def core(d_a, b, inv, x0, diel, mats):
            h = lambda v: maxwell.ama_bb(v, d_a, b, diel, shift=shift,
                                         dft=mats)
            p = lambda v: h_block(v, inv)
            if solver == "softlock":
                r = lob.lobpcg_sep_softlock(h, p, x0[:8], 4, tol=tol,
                                            maxiter=maxiter)
            elif solver == "mixed":
                r = lob.lobpcg_sep_mixedprecision(h, p, x0[:8], 4, tol=tol,
                                                  maxiter=maxiter)
            elif solver == "descent":
                r = lob.descent_sep(h, p, x0[:8], 4, tol=tol,
                                    maxiter=maxiter)
            elif solver == "max":
                r = lob.lobpcg_sep_max(h, x0[:6], 2, tol=tol,
                                       maxiter=maxiter)
            else:
                bmax = jnp.max(jnp.abs(b.diag)) + 1e-30
                m_func = lambda v: v + h_block(v, b) * (1.0 / bmax)
                fn = lob.lobpcg_gep if solver == "gep" else lob.descent_gep
                r = fn(h, m_func, p, x0[:8], 4, tol=tol, maxiter=maxiter)
            return r.status, r.iterations, r.lambdas[:2].real
        return core

    if name == "default":
        from pcx import boundary as bd
        nd = 32
        a = (np.diag(np.full(nd, 3.0 + 0j))
             - np.diag(np.ones(nd - 1), 1)
             - np.diag(np.ones(nd - 1), -1)).astype(np.complex64)

        def core(a_):
            r = lob.lobpcg_default(a_, nev=4, tol=tol, maxiter=maxiter)
            return r.status, r.iterations, r.lambdas[:4].real
        return jax.jit(boundary.real_boundary(core)), (a,)

    args = (e["d_a"], e["b"], e["inv"], e["x0"], e["diel"], e["mats"])
    return jax.jit(boundary.real_boundary(mk(name))), args


OP_RE = re.compile(r"(?:^|[= ])(stablehlo\.[a-z_0-9]+|chlo\.[a-z_0-9]+)")
ELEM_RE = re.compile(r"tensor<(?:([0-9x?]+)x)?([a-z0-9<>]+)>")


def _sig(line):
    """Element types + ranks on the line (dims themselves dropped):
    'f64r2' for tensor<8x8xf64>."""
    out = set()
    for dims, elem in ELEM_RE.findall(line):
        rank = 0 if not dims else dims.count("x") + 1
        out.add(f"{elem}r{rank}")
    return ",".join(sorted(out))


def opset(name):
    """Dtype-aware op keys: the axon backend refuses OP+DTYPE combos
    (e.g. stablehlo.abs on complex<f32> while real abs is fine — the
    round-3 direct-route failure), so a pure mnemonic diff can come back
    empty against passing programs that use the same mnemonic on other
    dtypes.  Key = 'op:elemtypes' with elemtypes the sorted set of
    element types on the op's line."""
    fn, args = core_for(name)
    txt = fn.lower(*args).as_text()
    ops = defaultdict(int)
    for line in txt.splitlines():
        m = OP_RE.search(line)
        if not m:
            continue
        ops[f"{m.group(1)}:{_sig(line)}"] += 1
    return dict(ops)


def main():
    sets = {}
    for name in PASSING + FAILING:
        try:
            sets[name] = opset(name)
            print(f"# {name}: {len(sets[name])} distinct ops", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"# {name}: LOWERING FAILED: {ex}", flush=True)
    good = set()
    for name in PASSING:
        good |= set(sets.get(name, {}))
    print(f"\n## union of passing-variant ops ({len(good)}):")
    print("  " + " ".join(sorted(good)))
    for name in FAILING:
        if name not in sets:
            continue
        extra = sorted(set(sets[name]) - good)
        print(f"\n## {name}: ops NOT in any passing program "
              f"({len(extra)}):")
        for op in extra:
            print(f"  {op}  x{sets[name][op]}")


if __name__ == "__main__":
    main()
