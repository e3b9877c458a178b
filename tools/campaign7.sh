#!/bin/bash
# Campaign phase 7: reproduce the remaining reference band libraries at
# N=120 (one sweep at a time on the exclusive tunneled device), golden-diff
# each against /root/reference/paper_2/output/<diel>/, then bisect the
# N=150 compile failure.  Waits for campaign6 (pid $1) to exit first.
#
# Order is by judged value: third eps family at reference resolution,
# then the gyroid lattices (incl. the bcc_dg north star), then fcc
# pseudochiral, the flat SC lattices, and the N=100 rows.
set -u
cd /root/repo
mkdir -p bench_logs

PREV=${1:?campaign6 pid}
# Hard deadline: leave the device free for the driver's end-of-round bench.
DEADLINE=$(( $(date +%s) + ${CAMPAIGN_BUDGET_S:-34200} ))
while kill -0 "$PREV" 2>/dev/null; do sleep 30; done
echo "### campaign6 pid $PREV exited $(date -u +%H:%M:%S)"
sleep 160

run_one() {  # run_one <n> <lattice> <diel> <ref-diel-dir> <timeout_s>
    local n=$1 lattice=$2 diel=$3 t=$5
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "### DEADLINE passed — skipping $lattice N=$n $diel"
        return 0
    fi
    local rem=$(( DEADLINE - $(date +%s) ))
    [ "$t" -gt "$rem" ] && t=$rem
    local log="bench_logs/sweep_${lattice}${n}_${diel}.log"
    echo "### $(date -u +%H:%M:%S) sweep $lattice N=$n $diel (timeout ${t}s)" | tee -a "$log"
    timeout "$t" python -u tools/run_sweep.py --n "$n" --lattice "$lattice" \
        --diel "$diel" --output output_c64 --max-rounds 8 \
        2>&1 | tee -a "$log"
    python -u tools/golden_diff.py \
        --lib "output_c64/$diel/bandgap_${lattice}.json" \
        --lattice "$lattice" --n "$n" --diel "$diel" \
        --png "bench_logs/bands_${lattice}${n}_${diel}.png" \
        2>&1 | tee -a "$log"
    sleep 160
}

echo "### $(date -u +%H:%M:%S) N=150 compile bisect (xla9 / pallas gram)"
timeout 3600 python -u tools/tpu_n150_bisect.py \
    2>&1 | tee -a bench_logs/n150_bisect.log
sleep 160

run_one 120 sc_curv pseudochiral_trivial  pseudochiral_trivial  5400
run_one 120 bcc_sg  chiral                chiral               10800
run_one 120 bcc_dg  chiral                chiral               14400
run_one 120 fcc     pseudochiral_crossdof pseudochiral_crossdof 10800
run_one 120 fcc     pseudochiral_trivial  pseudochiral_trivial  9000
run_one 120 sc_flat1 chiral               chiral                5400
run_one 120 sc_flat2 chiral               chiral                5400
run_one 100 sc_curv chiral                chiral                4200
run_one 100 fcc     chiral                chiral                5400

echo "### campaign7 done $(date -u)"
