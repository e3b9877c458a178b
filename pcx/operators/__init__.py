from pcx.operators import blocks, symbols, dielectric, maxwell
from pcx.operators.maxwell import MaxwellProblem, assemble_problem
