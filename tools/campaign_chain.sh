#!/bin/bash
cd /root/repo
python -u tools/tpu_diag.py 2>&1 | tee -a bench_logs/tpu_diag.log
rc=$?
echo "### diag rc=$rc"
sleep 180
bash tools/campaign2.sh
