#!/bin/bash
# Bisect the N=1000 ITERATIVE certification worker crash by problem size:
# run the REAL DRS core (3 iterations) at growing N, one process per probe.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/axon_certify_sweep.log}
: > "$LOG"
probe() {
  echo "--- probe certify $*" | tee -a "$LOG"
  timeout 1800 python /root/repo/scripts/probe_axon_ops.py certify "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$LOG"
  sleep 3
}
probe 250 64
probe 500 128
probe 750 192
probe 1000 256
echo "certify sweep done" | tee -a "$LOG"
