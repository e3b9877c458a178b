#!/bin/bash
# Campaign phase 8 (opportunistic): if campaign7's sweep queue drains
# before its deadline, spend the leftover exclusive-device window on the
# next per-iteration A/B levers (xla9 gram, refresh_every, ortho_passes,
# floor_patience) at N=120.  Uses campaign7's own absolute deadline so the
# driver's end-of-round bench still gets a free device.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign7 pid}
DEADLINE=${CAMPAIGN8_DEADLINE:-1787031787}   # campaign7 start + 34200 s
while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
echo "### campaign7 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

REM=$(( DEADLINE - $(date +%s) ))
if [ "$REM" -lt 2700 ]; then
    echo "### only ${REM}s left — skipping A/B"
    exit 0
fi
T=$(( REM - 1200 ))
echo "### $(date -u +%H:%M:%S) solver-lever A/B (timeout ${T}s)"
timeout "$T" python -u tools/ab_tpu.py --n 120 --reps 3 --kbatch 0 \
    --out bench_logs/ab_tpu3.jsonl \
    --only base no_fuse xla9 refresh12 refresh16 ortho1 patience3 \
    2>&1 | tee -a bench_logs/campaign8.log
echo "### campaign8 done $(date -u)"
