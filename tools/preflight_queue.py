#!/usr/bin/env python
"""CPU pre-flight of the TPU library-recovery queue (campaign11/13).

Most queue configs (bcc pseudochiral rows, the eps_opt=1 variants, the
flats) have never been run end-to-end through `bandgap`; a latent
assembly/name-mapping bug would burn a scarce TPU attempt.  This runs
each config at N=16 for 2 k-points on the CPU backend — the exact worker
code path (checkpoint write, validation gate, warm start) — and reports
pass/fail plus that the mapped reference golden file+key exists.

Usage: python tools/preflight_queue.py [--n 16] [--points 2]
"""

import argparse
import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

# (lattice, diel, eps_opt) — the queue minus configs already produced at
# reference resolution (sc_curv/fcc chiral) or committed as examples
# (sc_flat1 chiral, sc_curv crossdof).
CONFIGS = [
    ("sc_curv",  "pseudochiral_trivial",  0),
    ("bcc_sg",   "chiral",                0),
    ("bcc_dg",   "chiral",                0),
    ("fcc",      "pseudochiral_crossdof", 0),
    ("fcc",      "pseudochiral_trivial",  0),
    ("bcc_sg",   "pseudochiral_crossdof", 0),
    ("bcc_dg",   "pseudochiral_crossdof", 0),
    ("bcc_sg",   "pseudochiral_trivial",  0),
    ("bcc_dg",   "pseudochiral_trivial",  0),
    ("sc_flat2", "chiral",                0),
    ("sc_curv",  "pseudochiral_crossdof", 1),
    ("sc_curv",  "pseudochiral_trivial",  1),
    ("fcc",      "pseudochiral_crossdof", 1),
    ("fcc",      "pseudochiral_trivial",  1),
]


def golden_exists(lattice, diel, eps_opt):
    """Mirror tools/golden_diff.py's reference name mapping."""
    from tools.golden_diff import reference_candidates
    for path, key in reference_candidates(lattice, 120, diel, eps_opt):
        if os.path.exists(path):
            lib = json.load(open(path))
            if key in lib:
                return os.path.basename(path)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--points", type=int, default=2)
    args = ap.parse_args()

    from pcx.bandstructure import bandgap

    failures = []
    for lattice, diel, eps_opt in CONFIGS:
        golden = golden_exists(lattice, diel, eps_opt)
        with tempfile.TemporaryDirectory() as tmp:
            try:
                bandgap(n=args.n, lattice=lattice, diel_type=diel,
                        eps_opt=eps_opt, output_dir=tmp, gap=20,
                        dtype=jnp.complex128, maxiter=300, nev=10,
                        k_batch=1, indices=list(range(args.points)))
                suf = str(eps_opt) if eps_opt else ""
                lib = json.load(open(
                    os.path.join(tmp, diel, f"bandgap_{lattice}{suf}.json")))
                it = lib[f"{lattice}_{args.n}_iterations"]
                done = [r for r in it if r[0] > 0]
                bad = [r for r in it if r[0] == -1]
                ok = len(done) >= args.points and not bad
            except Exception as e:  # noqa: BLE001 — report, keep going
                ok, done, bad = False, [], [f"{type(e).__name__}: {e}"]
        status = "OK  " if ok else "FAIL"
        print(f"{status} {lattice:9s} {diel:22s} eps{eps_opt} "
              f"computed={len(done)} bad={bad if bad else 0} "
              f"golden={golden or 'MISSING'}", flush=True)
        if not ok or golden is None:
            failures.append((lattice, diel, eps_opt, bad, golden))
    if failures:
        print(f"\n{len(failures)} pre-flight failures", flush=True)
        return 1
    print("\nall queue configs pre-flight clean", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
