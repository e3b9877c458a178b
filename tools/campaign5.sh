#!/bin/bash
# Campaign phase 5 (reordered): wait for the in-flight bench_matrix process,
# then the Pallas/k-batch A/B microbench (VERDICT item 4 measurement), then
# the pseudochiral sc_curv N=120 library sweep (resumable — a partial sweep
# checkpoints per k-point and completes next round).
set -u
cd /root/repo
mkdir -p bench_logs

MP=${1:?bench_matrix pid}
while kill -0 "$MP" 2>/dev/null; do sleep 20; done
echo "### bench_matrix pid $MP exited $(date -u +%H:%M:%S)"
sleep 160

echo "### $(date -u +%H:%M:%S) ab_tpu"
python -u tools/ab_tpu.py 2>&1 | tee -a bench_logs/ab_tpu.log
sleep 160

echo "### $(date -u +%H:%M:%S) pseudochiral sweep"
python -u tools/run_sweep.py --n 120 --lattice sc_curv \
    --diel pseudochiral_crossdof --output output_c64 --max-rounds 8 \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log
python -u tools/golden_diff.py \
    --lib output_c64/pseudochiral_crossdof/bandgap_sc_curv.json \
    --lattice sc_curv --n 120 --diel pseudochiral_crossdof \
    --png bench_logs/bands_sc_curv120_pseudo.png \
    2>&1 | tee -a bench_logs/sweep_sc_curv120_pseudo.log
echo "### campaign5 done $(date -u)"
