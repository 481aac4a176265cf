#!/bin/bash
# Remainder of the crash bisect: big-size chol/qr/solve + vmap width sweep
# (eigh skipped at n>=2004 — compile alone exceeds 13 min, see
# PERFORMANCE.md "axon worker crash" section).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/axon_probe_sweep2.log}
: > "$LOG"
probe() {
  echo "--- probe $*" | tee -a "$LOG"
  timeout 1500 python /root/repo/scripts/probe_axon_ops.py "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$LOG"
  sleep 3
}
probe cholesky 4004 1
probe qr 4004 1
probe solve 4004 1
probe lobpcg 2004 1
probe lobpcg 4004 1
for w in 2 4 8; do
  probe cholesky 404 $w
  probe eigh 404 $w
  probe solve 404 $w
done
echo "sweep2 done" | tee -a "$LOG"
