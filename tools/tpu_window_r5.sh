#!/bin/bash
# Round-5 end-of-round device window (run AFTER the c27 campaign stops —
# the tunnel chip is exclusive).  Order by value-per-minute and by
# wedge-risk (known-compiling programs first, brand-new compiles last;
# round-4 lesson: refused compiles degrade the remote compile helper for
# everything after them):
#   1. N=150 single-chip solve (tpu_n150_diag --stage solve; cm layout +
#      w_cap=8 + apply_chunk=8 — the one reference DoF point never solved)
#   2. three-N runtime table (tools/tpu_runtime_table.py) -> committed
#      runtime_sc_curv.json artifact
#   3. bcc_sg k=100 rescue (coarse two-grid start, then f64) — the last
#      row of an otherwise-complete 160-point library
#   4. full 10-variant smoke (all-pair routes; davidson/jd/gep are NEW
#      compiles, so they go last)
set -u
cd /root/repo
STAMP=$(date -u +%H%M%S)
LOG=bench_logs/window_r5_${STAMP}.log
echo "# window-r5 start $(date -u)" | tee -a "$LOG"

timeout 2400 python -u tools/tpu_n150_diag.py --stage solve \
    2>&1 | tee -a "$LOG"
echo "# n150 solve rc=${PIPESTATUS[0]}" | tee -a "$LOG"
sleep 30

timeout 2400 python -u tools/tpu_runtime_table.py --ns 100 120 150 \
    2>&1 | tee -a "$LOG"
echo "# runtime table rc=${PIPESTATUS[0]}" | tee -a "$LOG"
sleep 30

timeout 1500 python -u tools/rescue_point.py --n 120 --lattice bcc_sg \
    --indices 100 --steps coarse f64 2>&1 | tee -a "$LOG"
echo "# bcc_sg k=100 rescue rc=${PIPESTATUS[0]}" | tee -a "$LOG"
sleep 30

# (bcc_dg k=99 healed in-campaign via seed-salt retry — no rescue needed)

timeout 1200 python -u tools/rescue_point.py --n 100 --lattice sc_curv \
    --indices 0 --steps coarse f64 2>&1 | tee -a "$LOG"
echo "# sc_curv100 k=0 rescue rc=${PIPESTATUS[0]}" | tee -a "$LOG"
sleep 30

timeout 3000 python -u tools/tpu_smoke.py --per-timeout 600 --breather 20 \
    2>&1 | tee -a "$LOG"
echo "# smoke rc=${PIPESTATUS[0]}" | tee -a "$LOG"

# 5 (stretch): per-iteration phase attribution at N=120 for the ms/iter
# ledger (VERDICT r4 weak #3) — only if the window still has time.
timeout 1200 python -u tools/profile_phases.py 2>&1 | tee -a "$LOG" || true
echo "# phase profile rc=${PIPESTATUS[0]}" | tee -a "$LOG"

python -u tools/library_status.py --write LIBRARIES.md 2>&1 | tee -a "$LOG"
echo "# window-r5 end $(date -u)" | tee -a "$LOG"
