#!/usr/bin/env python
"""TPU band-library production runner: reproduce a reference band library
at full resolution (VERDICT round-1 items 1-2).

Runs the checkpointed band sweep (pcx.bandstructure.bandgap) under a
supervisor loop: the sweep writes its JSON library after every k-point, so
a device fault costs exactly the in-flight k-point — the supervisor
restarts the worker subprocess, which resumes from the library and retries
failed ([-1,-1]) records up to --max-rounds times.  The JAX persistent
compile cache makes restarts cheap (the solve program compiles once per
(grid, block width, dtype)).

Usage:
  python tools/run_sweep.py --n 120 --lattice sc_curv [--diel chiral]
      [--output output_c64] [--gap 20] [--max-rounds 4]
Then golden-diff against /root/reference/paper_2/output/<diel>/bandgap_*.json
with tools/golden_diff.py.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pcx.supervisor import SuperviseConfig, library_status, supervise  # noqa: E402

WORKER = r"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join({repo!r}, ".jax_cache"))
import jax
if os.environ.get("PCX_SWEEP_CPU"):
    # test mode: pin the CPU backend before any array op (the axon plugin
    # ignores JAX_PLATFORMS and would attach to the exclusive tunnel)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from pcx.bandstructure import bandgap
cpu = jax.default_backend() == "cpu"
err = bandgap(n={n}, lattice={lattice!r}, diel_type={diel!r},
              eps_opt={eps_opt}, output_dir={output!r}, gap={gap},
              dtype=(jnp.complex128 if cpu else jnp.complex64),
              maxiter={maxiter}, nev={nev}, k_batch={k_batch},
              metrics_path={metrics!r}, solver_opts={solver_opts!r},
              solver_kw={solver_kw!r})
sys.exit(2 if err else 0)
"""


def parse_opt(kv: str):
    """'key=val' with val coerced to int/float where possible."""
    k, _, v = kv.partition("=")
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            pass
    return k, v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--lattice", default="sc_curv")
    ap.add_argument("--diel", default="chiral")
    ap.add_argument("--eps-opt", type=int, default=0)
    ap.add_argument("--output", default="output_c64")
    ap.add_argument("--gap", type=int, default=20)
    ap.add_argument("--nev", type=int, default=10)
    ap.add_argument("--maxiter", type=int, default=500)
    ap.add_argument("--k-batch", type=int, default=1)
    ap.add_argument("--max-rounds", type=int, default=8,
                    help="budget of PRODUCTIVE rounds (attempts that "
                         "changed the checkpoint)")
    ap.add_argument("--outage-budget", type=float, default=4 * 3600,
                    help="total seconds allowed across no-progress "
                         "attempts (device outage) before giving up")
    ap.add_argument("--stall", type=int, default=900,
                    help="kill the worker if the checkpoint JSON stops "
                         "advancing for this many seconds (observed: the "
                         "tunnel can hang an RPC forever mid-sweep; a "
                         "k-point normally takes <60 s)")
    ap.add_argument("--stall-grace", type=int, default=1800,
                    help="stall allowance before the round's FIRST "
                         "heartbeat/checkpoint write (worst case: ~16 min "
                         "degraded-tunnel first program + a cold solve-"
                         "program compile; with the per-segment heartbeat "
                         "the first beat CUTS this, so it only bounds "
                         "fully-hung rounds)")
    ap.add_argument("--hb-stall", type=int, default=420,
                    help="kill the worker if the per-segment heartbeat "
                         "goes silent this long after its first beat "
                         "(covers a mid-solve ~300 s one-off bucket/"
                         "refine compile; healthy segments beat ~20 s "
                         "apart)")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--solver-opt", action="append", default=[],
                    metavar="KEY=VAL",
                    help="extra KPointSolver solver_opts entry (repeatable),"
                         " e.g. --solver-opt dft_fuse=pallas")
    ap.add_argument("--refine", default="light",
                    choices=["light", "f64", "off"],
                    help="per-point validation mode: 'light' (default for "
                         "sweeps; working-precision refine, same 1e-3 "
                         "spurious gate, ~1 iteration of cost) or 'f64' "
                         "(emulated-f64 refine, ~17 s/point at N=120 on "
                         "the tunneled TPU)")
    args = ap.parse_args()
    solver_opts = dict(parse_opt(kv) for kv in args.solver_opt) or None
    solver_kw = {"refine": {"light": "light", "f64": True,
                            "off": False}[args.refine]}

    suffix = str(args.eps_opt) if args.eps_opt else ""
    path = os.path.join(args.output, args.diel,
                        f"bandgap_{args.lattice}{suffix}.json")
    worker = WORKER.format(repo=REPO, n=args.n, lattice=args.lattice,
                           diel=args.diel, eps_opt=args.eps_opt,
                           output=args.output, gap=args.gap,
                           nev=args.nev, maxiter=args.maxiter,
                           k_batch=args.k_batch, metrics=args.metrics,
                           solver_opts=solver_opts, solver_kw=solver_kw)

    # Supervision (round loop, stall watchdog, outage-vs-productive budget
    # split) lives in pcx.supervisor — unit-tested with fake clocks; this
    # tool only assembles the worker command line.
    hb_path = os.path.join(
        "/tmp", f"pcx_hb_{args.lattice}{args.n}_{args.diel}{suffix}.hb")
    env = dict(os.environ, PCX_HEARTBEAT=hb_path)
    cfg = SuperviseConfig(max_rounds=args.max_rounds,
                          outage_budget=args.outage_budget,
                          stall=args.stall, stall_grace=args.stall_grace,
                          hb_path=hb_path, hb_stall=args.hb_stall)
    outcome = supervise(
        lambda: subprocess.Popen([sys.executable, "-u", "-c", worker],
                                 cwd=REPO, env=env),
        path, args.lattice, args.n, cfg,
        log=lambda msg: print(msg, flush=True))
    if not outcome.ok:
        print(f"# {outcome.status}: pending={outcome.pending}, "
              f"failed={outcome.failed}", file=sys.stderr)
    return 0 if outcome.ok else 1


if __name__ == "__main__":
    sys.exit(main())
