#!/bin/bash
# Campaign phase 3: wait for the in-flight FCC sweep (pid in /tmp/sweep.pid),
# golden-diff it, then run the baseline config matrix (VERDICT item 3, led by
# BCC-DG), then the pseudochiral sc_curv library sweep.
# One TPU process at a time; >=150 s release gap between processes.
set -u
cd /root/repo
mkdir -p bench_logs

run() { echo "### $(date -u +%H:%M:%S) $*"; "$@"; }

# Wait for the currently running sweep process to exit.
if [ -f /tmp/sweep.pid ]; then
    SP=$(cat /tmp/sweep.pid)
    while kill -0 "$SP" 2>/dev/null; do sleep 20; done
    echo "### sweep pid $SP exited $(date -u +%H:%M:%S)"
fi

run python -u tools/golden_diff.py --lib output_c64/chiral/bandgap_fcc.json \
    --lattice fcc --n 120 --png bench_logs/bands_fcc120.png \
    2>&1 | tee -a bench_logs/sweep_fcc120.log
sleep 160

run python -u tools/bench_matrix.py 2>&1 | tee -a bench_logs/bench_matrix.log
sleep 160

run python -u tools/run_sweep.py --n 120 --lattice sc_curv \
    --diel pseudochiral_crossdof --output output_c64 --max-rounds 8 \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log
run python -u tools/golden_diff.py \
    --lib output_c64/pseudochiral_crossdof/bandgap_sc_curv.json \
    --lattice sc_curv --n 120 --diel pseudochiral_crossdof \
    --png bench_logs/bands_sc_curv120_pseudo.png \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log

echo "### campaign3 done $(date -u)"
