"""Metrics JSONL sink + profiling phase-breakdown smoke tests."""

import json

import numpy as np

import jax.numpy as jnp


def test_metrics_jsonl(tmp_path):
    from pcx.metrics import RunLogger, SolveRecord, load_jsonl
    path = str(tmp_path / "runs.jsonl")
    logger = RunLogger(path, echo=False)
    logger.log_solve(SolveRecord("eigen_1p", "sc_curv", 8, "chiral",
                                 [np.pi, 0, 0], 42, 1.5, 1,
                                 omega=[0.1, 0.2]))
    logger.log_solve(SolveRecord("bandgap_k", "fcc", 8, "chiral",
                                 [0, 0, 0], -1, -1.0, 4))
    rows = load_jsonl(path)
    assert len(rows) == 2
    assert rows[0]["iterations"] == 42 and rows[0]["omega"] == [0.1, 0.2]
    assert rows[1]["status"] == 4


def test_bandgap_writes_metrics(tmp_path):
    from pcx import bandstructure as bs
    from pcx.metrics import load_jsonl
    out = str(tmp_path / "out")
    mpath = str(tmp_path / "metrics.jsonl")
    bs.bandgap(n=8, lattice="sc_flat1", nev=4, gap=4, output_dir=out,
               indices=[0], verbose=False, metrics_path=mpath)
    rows = load_jsonl(mpath)
    assert len(rows) == 1 and rows[0]["kind"] == "bandgap_k"
    assert rows[0]["status"] in (1, 5)


def test_phase_breakdown_smoke():
    from pcx.bandstructure import KPointSolver
    from pcx.config import ProblemConfig
    from pcx.profiling import phase_breakdown
    solver = KPointSolver(ProblemConfig(n=8, lattice="sc_curv", nev=4),
                          dtype=jnp.complex64)
    out = phase_breakdown(solver, np.array([np.pi, 0, 0]), repeats=2,
                          verbose=False)
    for k in ("operator_s", "precond_s", "gram_rr_s", "update_s", "ortho_s",
              "iteration_estimate_s"):
        assert out[k] > 0


def test_convergence_rate_regression():
    from pcx.utils import convergence_rate
    res = 10.0 * 0.8 ** np.arange(40)
    m0, m1, m2 = convergence_rate(res, verbose=False)
    assert abs(m0 - 0.8) < 1e-6 and abs(m1 - 0.8) < 1e-6


def test_observed_order():
    from pcx.validate import observed_order
    # Second-order model: f(N) = f* + c / N^2.
    freqs = {n: np.array([1.0 + 4.0 / n**2]) for n in (16, 32, 64)}
    orders = observed_order(freqs, verbose=False)
    np.testing.assert_allclose(orders, 2.0, atol=1e-10)


def test_timing_contextmanager():
    from pcx.utils import timing
    d = {}
    with timing("step", runtime_dict=d):
        sum(range(1000))
    assert d["step"] >= 0
