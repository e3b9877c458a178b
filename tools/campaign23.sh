#!/bin/bash
# Campaign 23: post-fix TPU queue (round 3).  Order:
#   0. wait for campaign22 to exit; liveness-gate on a tiny compile
#   1. FIXED direct-route variant ladder (complex-abs -> real-split
#      residual norms; gep_tiny wts as an argument): direct_softlock /
#      gep_full / max_full / descent_gep_full at n=32, plus a default
#      re-smoke (last failure was an infra SIGABRT)        [VERDICT #4]
#   2. N=150 retry: rp_layout=cm + apply_chunk=8 (cm fixed the COMPILE
#      OOM; execution still exhausted HBM -> chunk the apply) [VERDICT #2]
#   3. library matrix queue under the round-3 quality gates (light
#      refine, lam_res_tol stop admissibility, bandgap frequency-error-
#      bound gate); bcc_sg restarted from scratch (its 91 pre-gate rows
#      carried unresolved doublets and were deleted)        [VERDICT #1]
#   4. ab_tpu3 / ab_tpu6 lever A/Bs                         [VERDICT #5]
#
# rc of piped workers is read from PIPESTATUS[0] (campaign22's `$?` after
# `timeout ... | tee` read tee's status and logged bogus rc=0).
set -u
cd /root/repo
mkdir -p bench_logs

DEADLINE=${CAMPAIGN23_DEADLINE:-1787188500}
MARGIN=1200
ATT=bench_logs/campaign15_attempts.txt
touch "$ATT"
OUTER=bench_logs/campaign23_outer.log

remaining() { echo $(( DEADLINE - $(date +%s) - MARGIN )); }
note() { echo "### $(date -u +%H:%M:%S) $*" | tee -a "$OUTER"; }

lib_state() {
    local p="$1"
    [ -f "$p" ] && md5sum "$p" | cut -d' ' -f1 || echo absent
}

# ---- 0a. never overlap campaign22 on the tunnel -------------------------
if [ -f /tmp/campaign22.pid ]; then
    P=$(cat /tmp/campaign22.pid)
    while kill -0 "$P" 2>/dev/null; do
        sleep 60
    done
fi
note "campaign23 start (deadline $DEADLINE, $(remaining)s usable)"

SWEEP_EXTRA="--solver-opt lam_tol=2e-6 --solver-opt floor_patience=3 \
--solver-opt col_patience=3 --solver-opt w_cap=auto"

next_incomplete() {  # prints "N LAT DIEL EPS" or nothing
    N150_READY=$1 python - <<'EOF'
import json, os
QUEUE = [
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
    (150, "sc_curv",  "chiral",                0),   # gated on diag
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

run_one_sweep() {  # N LAT DIEL EPS OUTDIR EXTRA... ; returns 1 if no progress
    local N="$1" LAT="$2" DIEL="$3" EPS="$4" OUTDIR="$5"; shift 5
    local SUF=""; [ "$EPS" != "0" ] && SUF="$EPS"
    local LIB="$OUTDIR/$DIEL/bandgap_${LAT}${SUF}.json"
    local BEFORE AFTER T LOG
    BEFORE=$(lib_state "$LIB")
    T=$(remaining); [ "$T" -gt 10800 ] && T=10800
    LOG="bench_logs/sweep_${LAT}${N}_${DIEL}${SUF}_c23.log"
    note "c23 sweep $LAT N=$N $DIEL eps$EPS -> $OUTDIR (timeout ${T}s)" | tee -a "$LOG"
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
    python -u tools/library_status.py --write LIBRARIES.md >/dev/null 2>&1 || true
    return 0
}

LIVE=0

while [ "$(remaining)" -gt 1800 ]; do

    # --- 0b. liveness probe: tiny real compile ----------------------------
    if [ "$LIVE" != "1" ]; then
        note "liveness probe (tiny compile)"
        if timeout 900 python -u - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
v = jax.jit(lambda a: (a * 2.0 + 1.0).sum())(jnp.ones((256, 256)))
print("live:", float(v), jax.devices())
EOF
        then
            LIVE=1
            note "tunnel is LIVE"
        else
            note "tunnel down; sleeping 300s"
            sleep 300
            continue
        fi
    fi

    # --- 1. fixed direct-route ladder + default re-smoke ------------------
    if ! grep -q "^c23vdiag" "$ATT" && [ "$(remaining)" -gt 7200 ]; then
        note "FIXED variant ladder (real-split resid norms)"
        timeout 6000 python -u tools/tpu_variant_diag.py --n 32 \
            --stages direct_softlock,gep_full,max_full,descent_gep_full \
            2>&1 | tee -a bench_logs/variant_diag.log
        RC=${PIPESTATUS[0]}
        note "c23 ladder rc=$RC"
        echo "c23vdiag 1" >> "$ATT"
        sleep 160
        note "re-smoke default (SIGABRT retry)"
        timeout 1500 python -u tools/tpu_smoke.py --n 32 --maxiter 300 \
            --only default --out bench_logs/tpu_smoke.jsonl \
            2>&1 | tee -a bench_logs/campaign9.log
        sleep 160
    fi

    # --- 2. N=150 retry: cm layout + apply_chunk=8 -------------------------
    if ! grep -q sc_curv_chiral_150 bench_logs/bench_matrix.jsonl 2>/dev/null \
            && ! grep -q "^c23n150" "$ATT" && [ "$(remaining)" -gt 9000 ]; then
        note "N=150 retry (rp_layout=cm + apply_chunk=8)"
        for ST in iter1_pallas solve; do
            timeout 3600 python -u tools/tpu_n150_diag.py --stage "$ST" \
                2>&1 | tee -a bench_logs/n150_diag.log
            RC=${PIPESTATUS[0]}
            note "c23n150 stage $ST rc=$RC"
            [ "$RC" != "0" ] && break
            sleep 160
        done
        echo "c23n150 1" >> "$ATT"
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

    # --- 3. library matrix -------------------------------------------------
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

    # --- 4. lever A/Bs -----------------------------------------------------
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

    if [ -z "$(next_incomplete 1)" ] && grep -q "^c23vdiag" "$ATT" \
            && grep -q "^c23n150" "$ATT" \
            && [ -s bench_logs/ab_tpu3.jsonl ] \
            && [ -s bench_logs/ab_tpu6.jsonl ]; then
        note "all campaign23 work complete"
        break
    fi
    sleep 120
done
note "campaign23 end ($(remaining)s margin left)"
