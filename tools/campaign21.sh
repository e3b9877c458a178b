#!/bin/bash
# Campaign phase 20: mid-round-3 requeue.  Same queue as campaign19, but
# reordered so the two code fixes landed this session get TPU time first:
#   0. liveness probe = REWRITTEN tools/tpu_smoke.py (variants routed
#      through the KPointSolver real boundary; the old raw-handle route
#      died UNIMPLEMENTED on complex transfers)            [VERDICT #4]
#   1. N=150 compile bisect with the FIXED axis-DFT Pallas kernel
#      (jt=8 cdiv bricks; the old divisor choice jt=6 was refused by the
#      Mosaic lowering, killing 3 of 4 bisect variants)    [VERDICT #2]
#   2. fcc chiral N=120 under the EXACT fast-lever stack -> golden diff
#      (short: ~20 min at the measured 5-7 s/point)        [VERDICT #3]
#   3. library matrix queue (crossdof sc_curv already complete,
#      max |dw| 2.44e-3; continues where campaign19 left)  [VERDICT #1]
#   4. leftover ab_tpu3 lever A/B + stack_p3 5-rep re-measure [ADVICE]
set -u
cd /root/repo
mkdir -p bench_logs

DEADLINE=${CAMPAIGN21_DEADLINE:-1787169000}   # 19:50 UTC Aug 19
MARGIN=1200                                   # device release + driver bench
ATT=bench_logs/campaign15_attempts.txt
touch "$ATT"
OUTER=bench_logs/campaign21_outer.log

remaining() { echo $(( DEADLINE - $(date +%s) - MARGIN )); }
note() { echo "### $(date -u +%H:%M:%S) $*" | tee -a "$OUTER"; }

lib_state() {
    local p="$1"
    [ -f "$p" ] && md5sum "$p" | cut -d' ' -f1 || echo absent
}

SWEEP_EXTRA=""

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
for line in open("bench_logs/campaign15_attempts.txt"):
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
        continue
    if pending == 0 and failed > 0 and att >= 2:
        continue
    print(n, lat, diel, eps); break
EOF
}

bump_attempt() {
    local key="$1"
    local old
    old=$(awk -v k="$key" '$1==k{print $2}' "$ATT")
    grep -v "^$key " "$ATT" > "$ATT.tmp" || true
    mv "$ATT.tmp" "$ATT"
    echo "$key $(( ${old:-0} + 1 ))" >> "$ATT"
}

maybe_enable_fast_levers() {
    # Prefer the Ritz-movement stack (ab_tpu5), fall back to stack_p3.
    SWEEP_EXTRA=$(python - <<'EOF'
import json, os


def clean(recs, name):
    v = [r for r in recs if r.get("variant") == name
         and r.get("status") not in ("FAILED", "COMPILE_FAIL")
         and "error" not in r]
    vals = [r.get("validation") for r in v if r.get("validation") is not None]
    return bool(vals) and all(x < 1e-4 for x in vals)


for path, lam_first in (("bench_logs/ab_tpu5.jsonl", True),
                        ("bench_logs/ab_tpu4.jsonl", False)):
    if not os.path.exists(path):
        continue
    recs = [json.loads(l) for l in open(path) if l.strip()]
    if lam_first and clean(recs, "stack_lam2e6"):
        print("--solver-opt lam_tol=2e-6 --solver-opt floor_patience=3"
              " --solver-opt col_patience=3 --solver-opt w_cap=auto")
        break
    if clean(recs, "stack_p3"):
        print("--solver-opt floor_patience=3 --solver-opt col_patience=3"
              " --solver-opt w_cap=auto")
        break
EOF
)
    [ -n "$SWEEP_EXTRA" ] && note "fast levers ENABLED for queue sweeps: $SWEEP_EXTRA"
}

run_one_sweep() {  # N LAT DIEL EPS OUTDIR EXTRA... ; returns 1 if no progress
    local N="$1" LAT="$2" DIEL="$3" EPS="$4" OUTDIR="$5"; shift 5
    local SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    local LIB="$OUTDIR/$DIEL/bandgap_${LAT}${SUF}.json"
    local BEFORE AFTER T LOG
    BEFORE=$(lib_state "$LIB")
    T=$(remaining); [ "$T" -gt 10800 ] && T=10800
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_c21.log"
    note "c21 sweep $LAT N=$N $DIEL eps$EPS -> $OUTDIR (timeout ${T}s)" | tee -a "$LOG"
    timeout "$T" python -u tools/run_sweep.py --n "$N" --lattice "$LAT" \
        --diel "$DIEL" --eps-opt "$EPS" --output "$OUTDIR" \
        --max-rounds 8 --outage-budget 1800 "$@" \
        2>&1 | tee -a "$LOG"
    AFTER=$(lib_state "$LIB")
    [ "$AFTER" = "$BEFORE" ] && return 1
    python -u tools/golden_diff.py \
        --lib "$LIB" \
        --lattice "$LAT" --n "$N" --diel "$DIEL" --eps-opt "$EPS" \
        --png "bench_logs/bands_${LAT}${N}_${DIEL}${SUF}.png" \
        2>&1 | tee -a "$LOG" || true
    return 0
}

note "campaign21 start (deadline $DEADLINE, $(remaining)s usable)"

LIVE=0
smoke_size() { stat -c%s bench_logs/tpu_smoke.jsonl 2>/dev/null || echo 0; }

while [ "$(remaining)" -gt 1800 ]; do

    # --- 0. liveness probe == REWRITTEN solver-variant smoke --------------
    if [ "$LIVE" != "1" ]; then
        S0=$(smoke_size)
        T=$(remaining); [ "$T" -gt 3600 ] && T=3600
        note "smoke/liveness probe, boundary-routed variants (timeout ${T}s)"
        timeout "$T" python -u tools/tpu_smoke.py --n 32 --maxiter 300 \
            --out bench_logs/tpu_smoke.jsonl \
            2>&1 | tee -a bench_logs/campaign9.log
        sleep 160
        if [ "$(smoke_size)" -le "$S0" ]; then
            note "tunnel still down; sleeping 240s"
            sleep 240
            continue
        fi
        LIVE=1
        note "tunnel is LIVE (smoke produced records)"
    fi

    maybe_enable_fast_levers

    # --- 1. N=150 compile-scope diagnostic ladder --------------------------
    # (every bisect lever now dies identically at the remote compile helper,
    #  HTTP 500 rc=1; the ladder finds the smallest failing program and on a
    #  full-solve success writes the sc_curv_chiral_150 bench row itself)
    if ! grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
            && ! grep -q "^n150diag" "$ATT" && [ "$(remaining)" -gt 7200 ]; then
        note "N=150 compile-scope diag ladder"
        timeout 5400 python -u tools/tpu_n150_diag.py \
            2>&1 | tee -a bench_logs/n150_diag.log
        echo "n150diag 1" >> "$ATT"
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

    # --- 2. fcc chiral N=120 under the EXACT fast-lever stack -------------
    # (VERDICT round-2 item 3: golden parity of the headline lever config.)
    if [ -n "$SWEEP_EXTRA" ] && [ "$(remaining)" -gt 3600 ] \
            && ! grep -q "^fccfast_done" "$ATT"; then
        note "fcc N=120 fast-lever golden rerun (output_c64_fast)"
        if run_one_sweep 120 fcc chiral 0 output_c64_fast $SWEEP_EXTRA; then
            P=output_c64_fast/chiral/bandgap_fcc.json
            PEND=$(python -c "
import json; it=json.load(open('$P'))['fcc_120_iterations']
print(sum(1 for r in it if r[0]<=0))" 2>/dev/null || echo 99)
            [ "$PEND" = "0" ] && echo "fccfast_done 1" >> "$ATT"
        else
            note "fcc fast rerun made no progress — back to probe"
            LIVE=0
            sleep 160
            continue
        fi
        sleep 160
    fi

    # --- 3. library matrix with progress-aware attempts -------------------
    while true; do
        REM=$(remaining)
        if [ "$REM" -lt 2400 ]; then
            note "${REM}s left — stopping sweeps"
            break
        fi
        N150_READY=0
        grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
            && N150_READY=1
        JOB=$(next_incomplete "$N150_READY")
        if [ -z "$JOB" ]; then
            note "queued libraries complete/exhausted"
            break
        fi
        read -r N LAT DIEL EPS <<< "$JOB"
        KEY="${N}_${LAT}_${DIEL}_${EPS}"
        EXTRA="$SWEEP_EXTRA"
        [ "$N" = "150" ] && EXTRA="$EXTRA $N150_OPTS"
        if run_one_sweep "$N" "$LAT" "$DIEL" "$EPS" output_c64 $EXTRA; then
            bump_attempt "$KEY"
        else
            note "sweep $KEY made NO progress (outage?) — back to probe"
            LIVE=0
            sleep 160
            break
        fi
        sleep 160
    done
    [ "$LIVE" != "1" ] && continue

    # --- 4. leftover: per-iteration lever A/B + stack_p3 re-measure -------
    REM=$(remaining)
    if [ "$REM" -gt 4200 ] && [ ! -s bench_logs/ab_tpu3.jsonl ] \
            && [ -z "$(next_incomplete 1)" ]; then
        T=$(( REM - 600 )); [ "$T" -gt 7200 ] && T=7200
        note "solver-lever A/B (ab_tpu3, timeout ${T}s)"
        timeout "$T" python -u tools/ab_tpu.py --n 120 --reps 3 --kbatch 0 \
            --out bench_logs/ab_tpu3.jsonl \
            --only base no_fuse xla9 refresh12 refresh16 ortho1 patience3 \
            2>&1 | tee -a bench_logs/campaign8_outer.log || true
        sleep 160
    fi

    if [ "$REM" -gt 4200 ] && [ ! -s bench_logs/ab_tpu6.jsonl ] \
            && [ -s bench_logs/ab_tpu3.jsonl ] \
            && [ -z "$(next_incomplete 1)" ]; then
        note "stack lever re-measure with 5 reps (ab_tpu6; ADVICE r2)"
        timeout 7200 python -u tools/ab_tpu.py --n 120 --reps 5 --kbatch 0 \
            --out bench_logs/ab_tpu6.jsonl \
            --only base stack_p3 stack_lam2e6 \
            2>&1 | tee -a bench_logs/campaign8_outer.log || true
        sleep 160
    fi

    if [ -z "$(next_incomplete 1)" ] && grep -q "^fccfast_done" "$ATT" \
            && [ -s bench_logs/ab_tpu3.jsonl ] \
            && [ -s bench_logs/ab_tpu6.jsonl ]; then
        note "all campaign21 work complete"
        break
    fi
    sleep 120
done
note "campaign21 end ($(remaining)s margin left)"
