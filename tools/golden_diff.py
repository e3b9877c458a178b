#!/usr/bin/env python
"""Golden-diff a pcx band library against the reference's committed one.

Compares `<lattice>_<N>_frequencies` point-by-point, reports coverage
(computed / failed / pending), max & mean |delta omega|, and optionally
renders a band-diagram overlay PNG.

Reference goldens: /root/reference/paper_2/output/<diel>/bandgap_*.json
(produced by numerical_experiments.py:313-496).  Reference lattice file /
key names differ from pcx flags for the gyroids; --ref-file/--ref-key
override the defaults.

Usage:
  python tools/golden_diff.py --lib output_c64/chiral/bandgap_sc_curv.json \
      --lattice sc_curv --n 120 [--png bands_sc_curv.png]
"""

import argparse
import json
import os
import sys

import numpy as np

REF = "/root/reference/paper_2/output"
REF_P1 = "/root/reference/paper_1_python/output"

# pcx flag -> reference chiral-file basename (pseudochiral files use the
# short names for the gyroids).
REF_NAME_CHIRAL = {
    "bcc_sg": "bcc_single_gyroid",
    "bcc_dg": "bcc_double_gyroid",
}


def load(path):
    with open(path) as f:
        return json.load(f)


def reference_candidates(lattice, n, diel, eps_opt=None):
    """(path, frequencies-key) candidates for a queue config, most
    specific first.  eps_opt=0 also tries the suffix-less file: the
    reference names its eps-preset-0 chiral libraries inconsistently
    (bandgap_sc_flat1.json vs bandgap_sc_curv0.json)."""
    long = REF_NAME_CHIRAL.get(lattice, lattice)
    bases = [long] + ([lattice] if lattice != long else [])
    if eps_opt is None:
        sufs = ["", "0"]
    elif eps_opt == 0:
        sufs = ["0", ""]
    else:
        sufs = [str(eps_opt)]
    # file names use either the short or long gyroid form depending on
    # the diel dir; the frequencies key always uses the long form
    cands = [(os.path.join(REF, diel, f"bandgap_{base}{suf}.json"),
              f"{long}_{n}_frequencies")
             for suf in sufs for base in bases]
    if diel == "chiral" and eps_opt in (None, 0):
        # Fallback: the paper_1 archive holds complete chiral libraries
        # paper_2 lacks (bcc_single_gyroid at N=100/150, 15 bands/point;
        # its N=120 rows match paper_2's to 7e-7, so the configs are
        # identical).  Deviation stats truncate to min(nev) columns.
        cands.append((os.path.join(REF_P1, f"bandgap_{long}.json"),
                      f"{long}_{n}_frequencies"))
    return cands


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", required=True, help="pcx band library JSON")
    ap.add_argument("--lattice", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--diel", default="chiral")
    ap.add_argument("--eps-opt", type=int, default=None,
                    help="reference file suffix (default: try '', '0')")
    ap.add_argument("--ref-file", default=None)
    ap.add_argument("--ref-key", default=None)
    ap.add_argument("--png", default=None, help="write band-diagram overlay")
    ap.add_argument("--gate", type=float, default=None,
                    help="fail if max |delta omega| exceeds this")
    args = ap.parse_args()

    lib = load(args.lib)
    key = f"{args.lattice}_{args.n}"
    freq = np.asarray(lib[f"{key}_frequencies"], float)
    iters = np.asarray(lib[f"{key}_iterations"], float)

    if args.ref_file:
        ref_path, rkey_default = args.ref_file, None
    else:
        ref_path = rkey_default = None
        for path, key in reference_candidates(args.lattice, args.n,
                                              args.diel, args.eps_opt):
            if os.path.exists(path) and key in load(path):
                ref_path, rkey_default = path, key
                break
        if ref_path is None:
            sys.exit(f"no reference file found for {args.lattice} in "
                     f"{REF}/{args.diel}")
    ref = load(ref_path)
    rkey = args.ref_key or rkey_default
    if rkey is None:  # --ref-file without --ref-key: derive from basename
        rbase = os.path.basename(ref_path).replace("bandgap_", "").split(".")[0]
        rkey = f"{rbase}_{args.n}_frequencies"
    rfreq = np.asarray(ref[rkey], float)

    if rfreq.shape[0] != freq.shape[0]:
        sys.exit(f"k-point count mismatch: pcx {freq.shape[0]} vs "
                 f"reference {rfreq.shape[0]} ({rkey})")

    computed = iters[:, 0] > 0
    failed = iters[:, 0] == -1
    # Reference rows can be failed ([-1,...], paper_2) or never-filled
    # (all-zero placeholders, paper_1 archive) — both invalid.
    with np.errstate(invalid="ignore"):
        ref_ok = (rfreq > 0).any(axis=1)
    both = computed & ref_ok
    nev = min(freq.shape[1], rfreq.shape[1])
    d = np.abs(freq[both][:, :nev] - rfreq[both][:, :nev])
    # The reference library itself holds NaN entries at Gamma (sqrt of a
    # tiny negative zero-mode, e.g. sc_curv_120 k=79 band=2); pcx clamps
    # those to 0 (utils.sqrt_robust).  Exclude non-finite REFERENCE
    # entries from the deviation stats — pcx-side NaN stays fatal.
    d = np.where(np.isfinite(rfreq[both][:, :nev]), d, 0.0)

    print(f"pcx lib:   {args.lib}")
    print(f"reference: {ref_path} [{rkey}]")
    print(f"k-points:  {freq.shape[0]}  computed={int(computed.sum())}  "
          f"failed={int(failed.sum())}  "
          f"pending={int((~computed & ~failed).sum())}  "
          f"(reference valid: {int(ref_ok.sum())})")
    if d.size:
        print(f"|delta omega|: max={d.max():.3e}  mean={d.mean():.3e}  "
              f"p99={np.percentile(d, 99):.3e}")
        worst = np.unravel_index(np.argmax(d), d.shape)
        kidx = np.flatnonzero(both)[worst[0]]
        print(f"worst point: k={kidx} band={worst[1]} "
              f"pcx={freq[kidx, worst[1]]:.6f} ref={rfreq[kidx, worst[1]]:.6f}")

    if args.png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        ks = np.arange(freq.shape[0])
        for b in range(nev):
            ax.plot(ks[ref_ok], rfreq[ref_ok, b], "-", color="0.6", lw=1,
                    label="reference" if b == 0 else None)
            ax.plot(ks[computed], freq[computed, b], ".", ms=3, color="C0",
                    label="pcx" if b == 0 else None)
        ax.set_xlabel("k-path index")
        ax.set_ylabel(r"$\omega a / 2\pi c$")
        ax.set_title(f"{args.lattice} N={args.n} ({args.diel})")
        ax.legend(loc="lower right")
        fig.tight_layout()
        fig.savefig(args.png, dpi=150)
        print(f"wrote {args.png}")

    if args.gate is not None and (not d.size or d.max() > args.gate
                                  or not computed.all()):
        sys.exit(1)


if __name__ == "__main__":
    main()
