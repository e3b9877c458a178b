from pcx.solvers import rayleigh_ritz, lobpcg
from pcx.solvers.lobpcg import (
    lobpcg_sep,
    lobpcg_sep_softlock,
    lobpcg_sep_nolock,
    lobpcg_default,
    SolveResult,
    Status,
)
