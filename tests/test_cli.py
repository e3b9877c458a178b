"""CLI launcher tests (reference L7: run.sh dispatch, paper_2/run.sh:22-30)."""

import subprocess
import sys

import numpy as np


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "pcx"] + args, capture_output=True,
        text=True, timeout=timeout, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "JAX_ENABLE_X64": "1", "HOME": "/root"})


def test_cli_eigen1p():
    r = _run(["eigen1p", "--n", "8", "--lattice", "sc_curv",
              "--alpha", "1,0,0", "--nev", "4", "--cpu"])
    assert r.returncode == 0, r.stderr[-500:]
    assert "omega" in r.stdout


def test_cli_bandgap_and_check(tmp_path):
    out = str(tmp_path / "out")
    r = _run(["bandgap", "--n", "8", "--lattice", "sc_flat1", "--nev", "4",
              "--cpu", "--output", out, "--indices", "0,1"])
    assert r.returncode == 0, r.stderr[-500:]
    r2 = _run(["check", "--n", "8", "--lattice", "sc_flat1", "--cpu",
               "--output", out])
    assert r2.returncode == 0
    assert "uncomputed" in r2.stdout


def test_cli_devices():
    r = _run(["devices"])
    assert r.returncode == 0
    assert "Cpu" in r.stdout or "cpu" in r.stdout.lower()
