#!/bin/bash
# Campaign phase 9 (opportunistic): after campaign8 exits, run the
# solver-variant accelerator smoke (max-mode / GEP / Davidson / JD on the
# real TPU — VERDICT round-1 item 7's last criterion).  Small N, short.
# Honors the same absolute deadline as campaign7/8 so the driver's
# end-of-round bench still gets a free device.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign8 pid}
DEADLINE=${CAMPAIGN9_DEADLINE:-1787031787}
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
echo "### campaign8 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

REM=$(( DEADLINE - $(date +%s) ))
if [ "$REM" -lt 2100 ]; then
    echo "### only ${REM}s left — skipping solver smoke"
    exit 0
fi
T=$(( REM - 1200 ))
[ "$T" -gt 3600 ] && T=3600
echo "### $(date -u +%H:%M:%S) TPU solver-variant smoke (timeout ${T}s)"
timeout "$T" python -u tools/tpu_smoke.py --n 32 --maxiter 300 \
    --out bench_logs/tpu_smoke.jsonl \
    2>&1 | tee -a bench_logs/campaign9.log
echo "### campaign9 done $(date -u)"
