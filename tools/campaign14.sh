#!/bin/bash
# Campaign phase 14 (round-2 endgame): replaces campaign13's last phases.
# The tunnel has been down 20:13 Aug 17 -> 11:00+ Aug 18; every probe
# burns ~25 min in backend init before failing, so the final pre-bench
# window fits ONE more attempt.  The N=32 solver-variant smoke (VERDICT
# r1 item 7's only open leg) both completes fastest if the tunnel
# revives and is worth more than a partial N=120 A/B.  Deadline 12:05
# frees the device for the driver's end-of-round bench.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign13 pid}
DEADLINE=${CAMPAIGN14_DEADLINE:-1787054700}   # 12:05 UTC Aug 18

while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
echo "### campaign13 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

remaining() { echo $(( DEADLINE - $(date +%s) )); }

if [ ! -s bench_logs/tpu_smoke.jsonl ] && [ "$(remaining)" -gt 400 ]; then
    T=$(remaining); [ "$T" -gt 1500 ] && T=1500
    echo "### $(date -u +%H:%M:%S) c14 smoke retry (timeout ${T}s)"
    timeout "$T" python -u tools/tpu_smoke.py --n 32 --maxiter 300 \
        --out bench_logs/tpu_smoke.jsonl \
        2>&1 | tee -a bench_logs/campaign9.log
    sleep 160
fi

# Leftover time: the highest-value incomplete library (57 pending points).
REM=$(remaining)
if [ "$REM" -gt 600 ]; then
    T=$(( REM - 120 ))
    LOG=bench_logs/sweep_sc_curv120_pseudochiral_crossdof_c14.log
    echo "### $(date -u +%H:%M:%S) c14 crossdof recovery (timeout ${T}s)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n 120 --lattice sc_curv \
        --diel pseudochiral_crossdof --eps-opt 0 --output output_c64 \
        --max-rounds 8 --outage-budget "$T" \
        2>&1 | tee -a "$LOG"
    python -u tools/golden_diff.py \
        --lib output_c64/pseudochiral_crossdof/bandgap_sc_curv.json \
        --lattice sc_curv --n 120 --diel pseudochiral_crossdof --eps-opt 0 \
        --png bench_logs/bands_sc_curv120_pseudochiral_crossdof.png \
        2>&1 | tee -a "$LOG" || true
fi
echo "### campaign14 done $(date -u)"
