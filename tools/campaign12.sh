#!/bin/bash
# Campaign phase 12 (round-2 continuation, session restart ~01:00 UTC):
# the tunnel outage that began 2026-08-17 20:13 UTC is still live at
# 01:30; campaign11 stops at its conservative 11:20 UTC deadline while
# the round runs to ~13:00.  This phase waits for campaign11 (pid $1),
# then uses the reclaimed window:
#
#   1. continue the reference-library recovery loop (campaign11's queue,
#      FRESH attempt budget — campaign11's attempts may all have been
#      burnt on outage rounds);
#   2. leftover time: A/B the round-2 solver levers added after the
#      chain launched (per-column floor locking + w_cap buckets,
#      tools/ab_tpu.py colfloor* variants) at N=120.
#
# Deadline 12:10 UTC leaves >=50 min for the driver's end-of-round bench.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign11 pid}
DEADLINE=${CAMPAIGN12_DEADLINE:-1787055000}   # 12:10 UTC Aug 18
ATT=bench_logs/campaign12_attempts.txt
touch "$ATT"

while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
echo "### campaign11 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

remaining() { echo $(( DEADLINE - $(date +%s) )); }

n150_opts() {
    python - <<'EOF'
import json
try:
    for line in open("bench_logs/bench_matrix.jsonl"):
        rec = json.loads(line)
        if rec.get("row") == "sc_curv_chiral_150":
            print(" ".join(f"--solver-opt {k}={v}"
                           for k, v in rec.get("solver_opts", {}).items()))
            break
except FileNotFoundError:
    pass
EOF
}

# campaign11's single bisect attempt may have been burnt on the outage —
# retry once here so the gated N=150 library item stays reachable
if ! grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
        && [ ! -f bench_logs/.c12_bisect_done ] \
        && [ "$(remaining)" -gt 7200 ]; then
    echo "### $(date -u +%H:%M:%S) c12 N=150 compile bisect retry"
    timeout 3600 python -u tools/tpu_n150_bisect.py \
        2>&1 | tee -a bench_logs/n150_bisect.log
    touch bench_logs/.c12_bisect_done
    sleep 160
fi

next_incomplete() {  # prints "N LAT DIEL EPS" or nothing
    N150_READY=$1 python - <<'EOF'
import json, os
QUEUE = [
    (120, "sc_curv",  "pseudochiral_crossdof", 0),
    (120, "sc_curv",  "pseudochiral_trivial",  0),
    (120, "bcc_sg",   "chiral",                0),
    (120, "bcc_dg",   "chiral",                0),
    (120, "fcc",      "pseudochiral_crossdof", 0),
    (120, "fcc",      "pseudochiral_trivial",  0),
    (120, "bcc_sg",   "pseudochiral_crossdof", 0),
    (120, "bcc_dg",   "pseudochiral_crossdof", 0),
    (120, "bcc_sg",   "pseudochiral_trivial",  0),
    (120, "bcc_dg",   "pseudochiral_trivial",  0),
    (120, "sc_flat1", "chiral",                0),
    (120, "sc_flat2", "chiral",                0),
    (100, "sc_curv",  "chiral",                0),
    (100, "fcc",      "chiral",                0),
    (150, "sc_curv",  "chiral",                0),   # gated on bisect
    (100, "sc_flat1", "chiral",                0),
    (100, "sc_flat2", "chiral",                0),
    (120, "sc_curv",  "pseudochiral_crossdof", 1),
    (120, "sc_curv",  "pseudochiral_trivial",  1),
    (120, "fcc",      "pseudochiral_crossdof", 1),
    (120, "fcc",      "pseudochiral_trivial",  1),
]
attempts = {}
for line in open("bench_logs/campaign12_attempts.txt"):
    if line.strip():
        key, cnt = line.split()
        attempts[key] = int(cnt)
n150_ready = os.environ.get("N150_READY") == "1"
for n, lat, diel, eps in QUEUE:
    if n == 150 and not n150_ready:
        continue
    key = f"{n}_{lat}_{diel}_{eps}"
    att = attempts.get(key, 0)
    if att >= 3:
        continue
    suf = str(eps) if eps else ""
    path = f"output_c64/{diel}/bandgap_{lat}{suf}.json"
    if not os.path.exists(path):
        print(n, lat, diel, eps); break
    lib = json.load(open(path))
    it = lib.get(f"{lat}_{n}_iterations")
    if it is None:
        print(n, lat, diel, eps); break
    pending = sum(1 for r in it if r[0] == 0)
    failed = sum(1 for r in it if r[0] == -1)
    if pending == 0 and failed == 0:
        continue                      # complete
    if pending == 0 and failed > 0 and att >= 2:
        continue                      # deterministic per-k fault: give up
    print(n, lat, diel, eps); break
EOF
}

# --- 1. library recovery loop (fresh attempt budget) ---------------------
while true; do
    REM=$(remaining)
    if [ "$REM" -lt 2400 ]; then
        echo "### campaign12: ${REM}s left — stopping sweeps"
        break
    fi
    N150_READY=0
    grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
        && N150_READY=1
    JOB=$(next_incomplete "$N150_READY")
    if [ -z "$JOB" ]; then
        echo "### campaign12: queued libraries complete $(date -u)"
        break
    fi
    read -r N LAT DIEL EPS <<< "$JOB"
    KEY="${N}_${LAT}_${DIEL}_${EPS}"
    OLD=$(awk -v k="$KEY" '$1==k{print $2}' "$ATT")
    CNT=$(( ${OLD:-0} + 1 ))
    grep -v "^$KEY " "$ATT" > "$ATT.tmp" || true
    mv "$ATT.tmp" "$ATT"; echo "$KEY $CNT" >> "$ATT"
    T=$REM; [ "$T" -gt 10800 ] && T=10800
    SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    EXTRA=""
    [ "$N" = "150" ] && EXTRA="$(n150_opts)"
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_c12.log"
    echo "### $(date -u +%H:%M:%S) c12 sweep $LAT N=$N $DIEL eps$EPS attempt=$CNT (timeout ${T}s)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n "$N" --lattice "$LAT" \
        --diel "$DIEL" --eps-opt "$EPS" --output output_c64 --max-rounds 8 \
        --outage-budget 3600 $EXTRA \
        2>&1 | tee -a "$LOG"
    python -u tools/golden_diff.py \
        --lib "output_c64/$DIEL/bandgap_${LAT}${SUF}.json" \
        --lattice "$LAT" --n "$N" --diel "$DIEL" --eps-opt "$EPS" \
        --png "bench_logs/bands_${LAT}${N}_${DIEL}${SUF}.png" \
        2>&1 | tee -a "$LOG" || true
    sleep 160
done

# --- 2. leftover time: round-2 lever A/B (colfloor/w_cap) ----------------
REM=$(remaining)
if [ "$REM" -gt 2700 ] && [ ! -s bench_logs/ab_tpu4.jsonl ]; then
    T=$(( REM - 300 ))
    echo "### $(date -u +%H:%M:%S) colfloor/w_cap A/B (timeout ${T}s)"
    timeout "$T" python -u tools/ab_tpu.py --n 120 --reps 2 --kbatch 0 \
        --out bench_logs/ab_tpu4.jsonl \
        --only base colfloor colfloor_wauto colfloor_wauto_p3 stack_p3 \
        2>&1 | tee -a bench_logs/campaign12.log
fi
echo "### campaign12 done $(date -u)"
