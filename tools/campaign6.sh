#!/bin/bash
# Campaign phase 6: after the in-flight ab_tpu (pid $1) finishes, re-run the
# Pallas variants with the Mosaic-legal kernels (i32 index maps, f32
# per-chunk gram partials), then the pseudochiral sc_curv N=120 sweep
# (resumable checkpoint).
set -u
cd /root/repo
mkdir -p bench_logs

MP=${1:?ab_tpu pid}
while kill -0 "$MP" 2>/dev/null; do sleep 15; done
echo "### ab_tpu pid $MP exited $(date -u +%H:%M:%S)"
sleep 160

echo "### $(date -u +%H:%M:%S) ab_tpu rerun (fixed kernels)"
timeout 1800 python -u tools/ab_tpu.py \
    --only dft_pallas rp_pallas rp_dft gram_pallas --kbatch 0 \
    --out bench_logs/ab_tpu2.jsonl 2>&1 | tee -a bench_logs/ab_tpu2.log
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
echo "### campaign6 done $(date -u)"
