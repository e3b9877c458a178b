#!/bin/bash
# Consolidated band-library campaign runner (replaces campaign2..24.sh —
# those were per-session variations of the same loop; this one is
# parameterized by env vars).  Round-4 goal: flip the band-library matrix
# (LIBRARIES.md) rows to DONE (VERDICT r3 item 2).
#
# Usage:
#   CAMPAIGN_NAME=c25 CAMPAIGN_DEADLINE=$(date -d +6hours +%s) \
#       bash tools/campaign.sh
# Controls while running:
#   echo <epoch> > /tmp/${CAMPAIGN_NAME}.deadline   # live-extend deadline
#   touch /tmp/stop_${CAMPAIGN_NAME}                # graceful stop
#
# Fixes vs campaign24 (ADVICE.md round 3):
#   * attempts are only bumped when a chunk makes NO progress and are
#     reset to 0 on progress, so long multi-chunk sweeps are never
#     orphaned mid-progress (ADVICE #1);
#   * progress is measured by (pending, failed) counts from the library
#     JSON before/after plus the sweep's exit status via PIPESTATUS, not
#     just an md5 of the file (ADVICE #2);
#   * per-campaign attempts file and an explicit outer-log note whenever a
#     config is skipped due to the attempt cap (ADVICE #3).
set -u
cd /root/repo
mkdir -p bench_logs

NAME=${CAMPAIGN_NAME:?set CAMPAIGN_NAME}
DEADLINE=${CAMPAIGN_DEADLINE:?set CAMPAIGN_DEADLINE}
QUEUE_FILE=${CAMPAIGN_QUEUE:-tools/queue_r4.txt}
MAX_ATTEMPTS=${CAMPAIGN_MAX_ATTEMPTS:-4}   # consecutive NO-PROGRESS chunks
CHUNK=${CAMPAIGN_CHUNK:-2400}
MARGIN=240

deadline_now() {
    local d
    d=$(cat "/tmp/${NAME}.deadline" 2>/dev/null || true)
    case "$d" in (''|*[!0-9]*) d=$DEADLINE;; esac
    [ "$d" -gt "$DEADLINE" ] && echo "$d" || echo "$DEADLINE"
}
remaining() { echo $(( $(deadline_now) - $(date +%s) - MARGIN )); }

ATT="bench_logs/${NAME}_attempts.txt"; touch "$ATT"
OUTER="bench_logs/${NAME}_outer.log"
echo $$ > "/tmp/${NAME}.pid"
note() { echo "### $(date -u +%H:%M:%S) $*" | tee -a "$OUTER"; }

SWEEP_EXTRA="--solver-opt lam_tol=2e-6 --solver-opt floor_patience=3 \
--solver-opt col_patience=3 --solver-opt w_cap=auto"

# Prints "pending failed computed" for a library key, or "ABSENT".
lib_counts() {  # LIB LAT N
    python - "$1" "$2" "$3" <<'EOF'
import json, os, sys
path, lat, n = sys.argv[1], sys.argv[2], sys.argv[3]
if not os.path.exists(path):
    print("ABSENT"); raise SystemExit
it = json.load(open(path)).get(f"{lat}_{n}_iterations")
if it is None:
    print("ABSENT"); raise SystemExit
pend = sum(1 for r in it if r[0] == 0)
fail = sum(1 for r in it if r[0] == -1)
print(pend, fail, len(it) - pend - fail)
EOF
}

# Prints "N LAT DIEL EPS" for the first incomplete, non-capped config, and
# notes any configs skipped by the attempt cap.
next_incomplete() {
    python - "$QUEUE_FILE" "$ATT" "$MAX_ATTEMPTS" <<'EOF'
import json, os, sys
queue_file, att_file, cap = sys.argv[1], sys.argv[2], int(sys.argv[3])
queue = []
for line in open(queue_file):
    line = line.split("#")[0].strip()
    if line:
        n, lat, diel, eps = line.split()
        queue.append((int(n), lat, diel, int(eps)))
attempts = {}
for line in open(att_file):
    if line.strip():
        key, cnt = line.split()
        attempts[key] = int(cnt)
for n, lat, diel, eps in queue:
    key = f"{n}_{lat}_{diel}_{eps}"
    suf = str(eps) if eps else ""
    path = f"output_c64/{diel}/bandgap_{lat}{suf}.json"
    done = False
    if os.path.exists(path):
        it = json.load(open(path)).get(f"{lat}_{n}_iterations")
        if it is not None:
            pend = sum(1 for r in it if r[0] == 0)
            fail = sum(1 for r in it if r[0] == -1)
            done = pend == 0 and fail == 0
    if done:
        continue
    if attempts.get(key, 0) >= cap:
        print(f"SKIP {key} (attempt cap {cap})", file=sys.stderr)
        continue
    print(n, lat, diel, eps)
    break
EOF
}

set_attempt() {  # KEY VALUE
    grep -v "^$1 " "$ATT" > "$ATT.tmp" || true
    mv "$ATT.tmp" "$ATT"
    echo "$1 $2" >> "$ATT"
}
get_attempt() { awk -v k="$1" '$1==k{print $2}' "$ATT"; }

run_one_sweep() {  # N LAT DIEL EPS ; returns 1 if no progress
    local N="$1" LAT="$2" DIEL="$3" EPS="$4"
    local SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    local LIB="output_c64/$DIEL/bandgap_${LAT}${SUF}.json"
    local BEFORE AFTER T LOG RC
    BEFORE=$(lib_counts "$LIB" "$LAT" "$N")
    T=$(remaining); [ "$T" -lt 60 ] && return 1
    [ "$T" -gt "$CHUNK" ] && T=$CHUNK
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_${NAME}.log"
    note "$NAME sweep $LAT N=$N $DIEL eps$EPS (timeout ${T}s, before: $BEFORE)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n "$N" --lattice "$LAT" \
        --diel "$DIEL" --eps-opt "$EPS" --output output_c64 \
        --max-rounds 6 --outage-budget 900 $SWEEP_EXTRA \
        2>&1 | tee -a "$LOG"
    RC=${PIPESTATUS[0]}
    AFTER=$(lib_counts "$LIB" "$LAT" "$N")
    note "$NAME sweep $LAT N=$N $DIEL eps$EPS rc=$RC after: $AFTER" | tee -a "$LOG"
    # Progress = strictly fewer (pending + failed) records than before.
    local PROGRESS
    PROGRESS=$(python - "$BEFORE" "$AFTER" <<'EOF'
import sys
b, a = sys.argv[1], sys.argv[2]
if b == "ABSENT":
    print(1 if a != "ABSENT" else 0); raise SystemExit
if a == "ABSENT":
    print(0); raise SystemExit
bp, bf, _ = map(int, b.split()); ap, af, _ = map(int, a.split())
print(1 if ap + af < bp + bf else 0)
EOF
)
    if [ "$PROGRESS" = "1" ]; then
        python -u tools/golden_diff.py --lib "$LIB" \
            --lattice "$LAT" --n "$N" --diel "$DIEL" --eps-opt "$EPS" \
            --png "bench_logs/bands_${LAT}${N}_${DIEL}${SUF}.png" \
            2>&1 | tee -a "$LOG" || true
        python -u tools/library_status.py --write LIBRARIES.md >/dev/null 2>&1 || true
        return 0
    fi
    return 1
}

note "$NAME start (deadline $DEADLINE, $(remaining)s usable, queue $QUEUE_FILE)"

while [ "$(remaining)" -gt 120 ]; do
    [ -f "/tmp/stop_${NAME}" ] && { note "stop file — exiting"; break; }
    JOB=$(next_incomplete 2> >(while read -r l; do note "$l"; done))
    if [ -z "$JOB" ]; then
        note "queue complete/exhausted"
        break
    fi
    read -r N LAT DIEL EPS <<< "$JOB"
    KEY="${N}_${LAT}_${DIEL}_${EPS}"
    if run_one_sweep "$N" "$LAT" "$DIEL" "$EPS"; then
        set_attempt "$KEY" 0   # progress resets the no-progress counter
    else
        OLD=$(get_attempt "$KEY"); OLD=${OLD:-0}
        set_attempt "$KEY" $(( OLD + 1 ))
        note "sweep $KEY NO progress — attempt $(( OLD + 1 ))/$MAX_ATTEMPTS, short sleep"
        sleep 60
    fi
    sleep 10
done
note "$NAME end ($(remaining)s margin left)"
rm -f "/tmp/${NAME}.pid"
