#!/bin/bash
# TPU campaign phase 2: reproduce the reference band libraries at N=120
# (VERDICT round-1 items 1-2), then the baseline config matrix (item 3),
# then a pseudochiral library + rr_gram microbench.
set -u
cd /root/repo
mkdir -p bench_logs

run() { echo "### $(date -u +%H:%M:%S) $*"; "$@"; }

run python -u tools/run_sweep.py --n 120 --lattice sc_curv --diel chiral \
    --output output_c64 2>&1 | tee -a bench_logs/sweep_sc_curv120.log
run python -u tools/golden_diff.py --lib output_c64/chiral/bandgap_sc_curv.json \
    --lattice sc_curv --n 120 --png bench_logs/bands_sc_curv120.png \
    2>&1 | tee -a bench_logs/sweep_sc_curv120.log
sleep 150

run python -u tools/run_sweep.py --n 120 --lattice fcc --diel chiral \
    --output output_c64 2>&1 | tee -a bench_logs/sweep_fcc120.log
run python -u tools/golden_diff.py --lib output_c64/chiral/bandgap_fcc.json \
    --lattice fcc --n 120 --png bench_logs/bands_fcc120.png \
    2>&1 | tee -a bench_logs/sweep_fcc120.log
sleep 150

run python -u tools/bench_matrix.py 2>&1 | tee -a bench_logs/bench_matrix.log
sleep 150

run python -u tools/run_sweep.py --n 120 --lattice sc_curv \
    --diel pseudochiral_crossdof --output output_c64 \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log
run python -u tools/golden_diff.py \
    --lib output_c64/pseudochiral_crossdof/bandgap_sc_curv.json \
    --lattice sc_curv --n 120 --diel pseudochiral_crossdof \
    --png bench_logs/bands_sc_curv120_pseudo.png \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log

echo "### campaign2 done $(date -u)"
