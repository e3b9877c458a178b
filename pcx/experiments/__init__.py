from pcx.experiments import ablations, precision, structure, runtime
