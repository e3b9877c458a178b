#!/bin/bash
# Round-4 TPU diagnostic window #2 (run while the library campaign is
# PAUSED — the tunnel chip is exclusive).  Lessons from window #1
# (bench_logs/window_r4_235722.log): five refused compiles in a row
# degraded the remote compile helper until even descent/davidson smokes
# and the N=150 iter1 compile timed out.  This window:
#   1. runs the PENCIL PROBE LADDER first (tiny f64 programs) and STOPS
#      at the first refusal — one refused compile max;
#   2. re-smokes descent/davidson with a 900 s per-variant budget
#      (KPointSolver route; window #1's 420 s was too tight);
#   3. N=150: iter1_pallas then full solve (cm layout + apply_chunk=8).
# Each step bounded; logs under bench_logs/.
set -u
cd /root/repo
STAMP=$(date -u +%H%M%S)
LOG=bench_logs/window2_r4_${STAMP}.log
echo "# window2 start $(date -u)" | tee -a "$LOG"

for stage in p0_eigh_f64 p1_emb_eigh p2_whiten p3_pencil_full p4_gep_tiny; do
    timeout 420 python -u tools/tpu_pencil_probe.py --stage "$stage" \
        2>&1 | tee -a "$LOG"
    RC=${PIPESTATUS[0]}
    echo "# probe $stage rc=$RC" | tee -a "$LOG"
    if [ "$RC" != "0" ]; then
        echo "# refusal localized at $stage — stopping ladder" | tee -a "$LOG"
        break
    fi
    sleep 20
done

sleep 30
# N=150 full solve directly (one compile; iter1 would be a SECOND
# program — the cm-layout + apply_chunk fix targets runtime HBM, and a
# runtime OOM of the full solve carries the same information).
timeout 2400 python -u tools/tpu_n150_diag.py --stage solve \
    2>&1 | tee -a "$LOG"

sleep 30
timeout 2000 python -u tools/tpu_smoke.py --only descent davidson \
    --per-timeout 900 --breather 20 2>&1 | tee -a "$LOG"
echo "# window2 end $(date -u)" | tee -a "$LOG"
