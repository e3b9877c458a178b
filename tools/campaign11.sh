#!/bin/bash
# Campaign phase 11 (round-2 continuation): the driver restarted the
# builder session at 2026-08-18 00:00 UTC with ~12 h of wall clock, but
# the running campaign7-10 chain still carries the OLD round deadline
# (epoch 1787031787 = 05:43 UTC).  This phase waits for campaign10 (pid
# $1), then keeps the exclusive device productive until ~11:20 UTC:
#
#   1. solver-variant accelerator smoke (campaign9's job, likely skipped
#      there for lack of budget) — closes VERDICT round-1 item 7's last
#      criterion;
#   2. N=150 compile bisect retry (campaign7 ran it into the 20:13 outage);
#   3. recovery loop over the FULL reference-library matrix (campaign10's
#      queue + the bcc pseudochiral rows, the eps_opt=1 variants, the
#      N=100 flats, and — once the bisect finds a compiling config — the
#      sc_curv N=150 chiral library);
#   4. leftover time: the queued per-iteration solver-lever A/B.
#
# Persistent-failure guard: a library whose only remaining records are
# [-1,-1] failures stops being retried after 2 attempts (a deterministic
# per-k fault must not starve the rest of the queue); outage-interrupted
# libraries (pending [0,0] records) are always resumed.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign10 pid}
DEADLINE=${CAMPAIGN11_DEADLINE:-1787052000}   # 11:20 UTC Aug 18
MARGIN=1800                                    # driver's end-of-round bench
ATT=bench_logs/campaign11_attempts.txt
touch "$ATT"

while kill -0 "$PREV" 2>/dev/null; do sleep 60; done
echo "### campaign10 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160   # device release

remaining() { echo $(( DEADLINE - $(date +%s) - MARGIN )); }

# --- 1. solver-variant smoke (skip if campaign9 already produced it) ----
if [ ! -s bench_logs/tpu_smoke.jsonl ] && [ "$(remaining)" -gt 3000 ]; then
    echo "### $(date -u +%H:%M:%S) TPU solver-variant smoke"
    timeout 2400 python -u tools/tpu_smoke.py --n 32 --maxiter 300 \
        --out bench_logs/tpu_smoke.jsonl \
        2>&1 | tee -a bench_logs/campaign9.log
    sleep 160
fi

# --- 2. N=150 bisect retry (skip if the matrix row already exists) ------
if ! grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
        && [ "$(remaining)" -gt 4500 ]; then
    echo "### $(date -u +%H:%M:%S) N=150 compile bisect retry"
    timeout 3600 python -u tools/tpu_n150_bisect.py \
        2>&1 | tee -a bench_logs/n150_bisect.log
    sleep 160
fi
N150_OPTS=$(python - <<'EOF'
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
)

next_incomplete() {  # prints "N LAT DIEL EPS PENDING FAILED" or nothing
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
for line in open("bench_logs/campaign11_attempts.txt"):
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

# --- 3. recovery loop over the full matrix ------------------------------
while true; do
    REM=$(remaining)
    if [ "$REM" -lt 2400 ]; then
        echo "### campaign11: ${REM}s left — stopping sweeps"
        break
    fi
    N150_READY=0
    grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
        && N150_READY=1
    JOB=$(next_incomplete "$N150_READY")
    if [ -z "$JOB" ]; then
        echo "### campaign11: queued libraries complete $(date -u)"
        break
    fi
    read -r N LAT DIEL EPS <<< "$JOB"
    KEY="${N}_${LAT}_${DIEL}_${EPS}"
    OLD=$(awk -v k="$KEY" '$1==k{print $2}' "$ATT")
    CNT=$(( ${OLD:-0} + 1 ))
    grep -v "^$KEY " "$ATT" > "$ATT.tmp" || true
    mv "$ATT.tmp" "$ATT"; echo "$KEY $CNT" >> "$ATT"
    T=$REM; [ "$T" -gt 14400 ] && T=14400
    SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    EXTRA=""
    [ "$N" = "150" ] && EXTRA="$N150_OPTS"
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_c11.log"
    echo "### $(date -u +%H:%M:%S) c11 sweep $LAT N=$N $DIEL eps$EPS attempt=$CNT (timeout ${T}s)" | tee -a "$LOG"
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

# --- 4. leftover time: solver-lever A/B ---------------------------------
REM=$(remaining)
if [ "$REM" -gt 3600 ] && [ ! -s bench_logs/ab_tpu3.jsonl ]; then
    T=$(( REM - 600 )); [ "$T" -gt 7200 ] && T=7200
    echo "### $(date -u +%H:%M:%S) solver-lever A/B (timeout ${T}s)"
    timeout "$T" python -u tools/ab_tpu.py --n 120 --reps 3 --kbatch 0 \
        --out bench_logs/ab_tpu3.jsonl \
        --only base no_fuse xla9 refresh12 refresh16 ortho1 patience3 \
        2>&1 | tee -a bench_logs/campaign8.log
fi
echo "### campaign11 done $(date -u)"
