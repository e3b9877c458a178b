#!/bin/bash
# Campaign 24: round-3 continuation session (short wall clock, ~45 min).
# Single goal: flip as many band-library matrix rows to DONE as possible
# (VERDICT r2 item 1).  The compile cache is cold this session, so the
# queue is ordered to amortize compiles: configs that share a compiled
# program run back-to-back (sc_flat1/sc_flat2 share the chiral N=120
# program; the eps1 sc_curv keys share the pseudochiral programs; the fcc
# pseudochiral keys then hit those caches; bcc_sg resumes on the chiral
# program).  N=100/150 and bcc_dg are queued last (fresh compiles /
# longest sweeps).
set -u
cd /root/repo
mkdir -p bench_logs

DEADLINE=${CAMPAIGN24_DEADLINE:?set CAMPAIGN24_DEADLINE}
# Live-extendable: the builder re-ups the deadline by writing a new epoch
# to /tmp/campaign24.deadline while its session stays alive; sweeps
# themselves are bounded by the CURRENT deadline at launch time, so the
# tunnel frees within one stall-kill of the last re-up lapsing.
deadline_now() {
    local d
    d=$(cat /tmp/campaign24.deadline 2>/dev/null || true)
    case "$d" in (''|*[!0-9]*) d=$DEADLINE;; esac
    [ "$d" -gt "$DEADLINE" ] && echo "$d" || echo "$DEADLINE"
}
MARGIN=240
ATT=bench_logs/campaign15_attempts.txt
touch "$ATT"
OUTER=bench_logs/campaign24_outer.log
echo $$ > /tmp/campaign24.pid

remaining() { echo $(( $(deadline_now) - $(date +%s) - MARGIN )); }
note() { echo "### $(date -u +%H:%M:%S) $*" | tee -a "$OUTER"; }

lib_state() { [ -f "$1" ] && md5sum "$1" | cut -d' ' -f1 || echo absent; }

SWEEP_EXTRA="--solver-opt lam_tol=2e-6 --solver-opt floor_patience=3 \
--solver-opt col_patience=3 --solver-opt w_cap=auto"

next_incomplete() {  # prints "N LAT DIEL EPS" or nothing
    python - <<'EOF'
import json, os
QUEUE = [
    (120, "sc_flat1", "chiral",                0),
    (120, "sc_flat2", "chiral",                0),
    (120, "sc_curv",  "pseudochiral_crossdof", 1),
    (120, "sc_curv",  "pseudochiral_trivial",  1),
    (120, "fcc",      "pseudochiral_trivial",  0),
    (120, "fcc",      "pseudochiral_crossdof", 0),
    (120, "fcc",      "pseudochiral_trivial",  1),
    (120, "fcc",      "pseudochiral_crossdof", 1),
    (120, "bcc_sg",   "chiral",                0),
    (120, "bcc_dg",   "chiral",                0),
    (100, "sc_curv",  "chiral",                0),
    (100, "fcc",      "chiral",                0),
    (100, "sc_flat1", "chiral",                0),
    (100, "sc_flat2", "chiral",                0),
    (120, "bcc_sg",   "pseudochiral_trivial",  0),
    (120, "bcc_dg",   "pseudochiral_trivial",  0),
    (120, "bcc_sg",   "pseudochiral_crossdof", 0),
    (120, "bcc_dg",   "pseudochiral_crossdof", 0),
]
attempts = {}
for line in open("bench_logs/campaign15_attempts.txt"):
    if line.strip():
        key, cnt = line.split()
        attempts[key] = int(cnt)
for n, lat, diel, eps in QUEUE:
    key = f"c24_{n}_{lat}_{diel}_{eps}"
    att = attempts.get(key, 0)
    if att >= 6:  # chunked sweeps under a live-extended deadline revisit
        continue  # a library several times; only cap pathological configs
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
        continue
    print(n, lat, diel, eps); break
EOF
}

bump_attempt() {
    local key="$1" old
    old=$(awk -v k="$key" '$1==k{print $2}' "$ATT")
    grep -v "^$key " "$ATT" > "$ATT.tmp" || true
    mv "$ATT.tmp" "$ATT"
    echo "$key $(( ${old:-0} + 1 ))" >> "$ATT"
}

run_one_sweep() {  # N LAT DIEL EPS ; returns 1 if no progress
    local N="$1" LAT="$2" DIEL="$3" EPS="$4"
    local SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    local LIB="output_c64/$DIEL/bandgap_${LAT}${SUF}.json"
    local BEFORE AFTER T LOG
    BEFORE=$(lib_state "$LIB")
    T=$(remaining); [ "$T" -lt 60 ] && return 1
    # chunk sweeps so the loop re-reads the live deadline every <=40 min
    [ "$T" -gt 2400 ] && T=2400
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_c24.log"
    note "c24 sweep $LAT N=$N $DIEL eps$EPS (timeout ${T}s)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n "$N" --lattice "$LAT" \
        --diel "$DIEL" --eps-opt "$EPS" --output output_c64 \
        --max-rounds 6 --outage-budget 900 $SWEEP_EXTRA \
        2>&1 | tee -a "$LOG"
    AFTER=$(lib_state "$LIB")
    [ "$AFTER" = "$BEFORE" ] && return 1
    python -u tools/golden_diff.py --lib "$LIB" \
        --lattice "$LAT" --n "$N" --diel "$DIEL" --eps-opt "$EPS" \
        --png "bench_logs/bands_${LAT}${N}_${DIEL}${SUF}.png" \
        2>&1 | tee -a "$LOG" || true
    python -u tools/library_status.py --write LIBRARIES.md >/dev/null 2>&1 || true
    return 0
}

note "campaign24 start (deadline $DEADLINE, $(remaining)s usable)"

# liveness probe: tiny real compile
if ! timeout 900 python -u - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
v = jax.jit(lambda a: (a * 2.0 + 1.0).sum())(jnp.ones((256, 256)))
print("live:", float(v), jax.devices())
EOF
then
    note "tunnel DOWN at start; will still try sweeps (supervisor handles outage)"
fi

while [ "$(remaining)" -gt 120 ]; do
    [ -f /tmp/stop_campaign24 ] && { note "stop file — exiting"; break; }
    JOB=$(next_incomplete)
    if [ -z "$JOB" ]; then
        note "queue complete/exhausted"
        break
    fi
    read -r N LAT DIEL EPS <<< "$JOB"
    KEY="c24_${N}_${LAT}_${DIEL}_${EPS}"
    if run_one_sweep "$N" "$LAT" "$DIEL" "$EPS"; then
        bump_attempt "$KEY"
    else
        note "sweep $KEY made NO progress — bumping attempt, short sleep"
        bump_attempt "$KEY"
        sleep 60
    fi
    sleep 20
done
note "campaign24 end ($(remaining)s margin left)"
rm -f /tmp/campaign24.pid
