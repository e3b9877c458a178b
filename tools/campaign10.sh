#!/bin/bash
# Campaign phase 10 (recovery): after campaign9 exits, repeatedly scan the
# produced band libraries and finish any incomplete ones (pending [0,0] or
# failed [-1,-1] records) — in particular the pseudochiral-crossdof sc_curv
# N=120 sweep if the 2026-08-17 20:13 outage outlasted run_sweep's outage
# budget.  Loops until the round deadline (leaving the device free for the
# driver's end-of-round bench), so a recovered device is put to work no
# matter when it comes back.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign9 pid}
DEADLINE=${CAMPAIGN10_DEADLINE:-1787031787}
MARGIN=1800   # leave for the driver's bench.py

while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
echo "### campaign9 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

next_incomplete() {
    python - <<'EOF'
import json, os
# (n, lattice, diel) in judged-value order; only libraries that already
# EXIST but are incomplete, plus the crossdof one (create if missing).
QUEUE = [
    (120, "sc_curv", "pseudochiral_crossdof"),
    (120, "sc_curv", "pseudochiral_trivial"),
    (120, "bcc_sg", "chiral"),
    (120, "bcc_dg", "chiral"),
    (120, "fcc", "pseudochiral_crossdof"),
    (120, "fcc", "pseudochiral_trivial"),
    (120, "sc_flat1", "chiral"),
    (120, "sc_flat2", "chiral"),
    (100, "sc_curv", "chiral"),
    (100, "fcc", "chiral"),
]
for i, (n, lat, diel) in enumerate(QUEUE):
    path = os.path.join("output_c64", diel, f"bandgap_{lat}.json")
    if not os.path.exists(path):
        if i == 0:  # crossdof checkpoint must exist; anything else: start it
            print(f"{n} {lat} {diel}")
            break
        print(f"{n} {lat} {diel}")
        break
    lib = json.load(open(path))
    it = lib.get(f"{lat}_{n}_iterations", [])
    if not it or any(r[0] in (0, -1) for r in it):
        print(f"{n} {lat} {diel}")
        break
EOF
}

while true; do
    NOW=$(date +%s)
    REM=$(( DEADLINE - NOW - MARGIN ))
    if [ "$REM" -lt 2400 ]; then
        echo "### campaign10: ${REM}s left — stopping"
        break
    fi
    JOB=$(next_incomplete)
    if [ -z "$JOB" ]; then
        echo "### campaign10: all queued libraries complete $(date -u)"
        break
    fi
    read -r N LAT DIEL <<< "$JOB"
    T=$REM; [ "$T" -gt 14400 ] && T=14400
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}_recovery.log"
    echo "### $(date -u +%H:%M:%S) recovery sweep $LAT N=$N $DIEL (timeout ${T}s)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n "$N" --lattice "$LAT" \
        --diel "$DIEL" --output output_c64 --max-rounds 8 \
        --outage-budget 3600 \
        2>&1 | tee -a "$LOG"
    python -u tools/golden_diff.py \
        --lib "output_c64/$DIEL/bandgap_${LAT}.json" \
        --lattice "$LAT" --n "$N" --diel "$DIEL" \
        --png "bench_logs/bands_${LAT}${N}_${DIEL}.png" \
        2>&1 | tee -a "$LOG" || true
    sleep 160
done
echo "### campaign10 done $(date -u)"
