#!/bin/bash
# Campaign phase 4: after campaign3 (pid in /tmp/campaign3.pid) finishes,
# run the Pallas/k-batch A/B microbench (VERDICT round-1 item 4 evidence).
set -u
cd /root/repo
mkdir -p bench_logs

if [ -f /tmp/campaign3.pid ]; then
    CP=$(cat /tmp/campaign3.pid)
    while kill -0 "$CP" 2>/dev/null; do sleep 30; done
    echo "### campaign3 pid $CP exited $(date -u +%H:%M:%S)"
fi
sleep 160

python -u tools/ab_tpu.py 2>&1 | tee -a bench_logs/ab_tpu.log
echo "### campaign4 done $(date -u)"
