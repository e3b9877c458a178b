#!/bin/bash
# Round-4 TPU diagnostic window (run while the library campaign is PAUSED —
# the tunnel chip is exclusive):
#   1. re-smoke the direct-route solver variants post-fc13136/c785a6b
#      (VERDICT r3 item 4: max/gep/descent_gep refused by the backend;
#      descent/davidson MAXITER-as-pass)
#   2. N=150 full solve with rp_layout=cm + apply_chunk=8
#      (VERDICT r3 item 3: last run OOMed pre-cm-layout)
# Each step is bounded; logs under bench_logs/.
set -u
cd /root/repo
STAMP=$(date -u +%H%M%S)
LOG=bench_logs/window_r4_${STAMP}.log
echo "# window start $(date -u)" | tee -a "$LOG"

timeout 2400 python -u tools/tpu_smoke.py \
    --only max gep descent_gep descent davidson \
    --per-timeout 420 --breather 20 2>&1 | tee -a "$LOG"

sleep 30
timeout 1500 python -u tools/tpu_n150_diag.py --stage iter1_pallas \
    2>&1 | tee -a "$LOG"
RC=${PIPESTATUS[0]}
sleep 30
if [ "$RC" = "0" ]; then
    timeout 2400 python -u tools/tpu_n150_diag.py --stage solve \
        2>&1 | tee -a "$LOG"
else
    echo "# iter1_pallas failed (rc=$RC); skipping full solve" | tee -a "$LOG"
fi
echo "# window end $(date -u)" | tee -a "$LOG"
