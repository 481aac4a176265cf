#!/bin/bash
# Sweep isolated f64 linalg ops on the axon TPU to bisect the worker crash
# (VERDICT r2 #2). One probe per process; crashes are recorded and the sweep
# continues. Run serially — never in parallel with another TPU process.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${1:-/tmp/axon_probe_sweep.log}
: > "$LOG"
probe() {
  echo "--- probe $*" | tee -a "$LOG"
  timeout 1200 python /root/repo/scripts/probe_axon_ops.py "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$LOG"
  sleep 3
}
# single-instance size sweep
for n in 404 1004 2004 4004; do
  probe cholesky $n 1
  probe eigh $n 1
  probe qr $n 1
  probe solve $n 1
done
# vmap width sweep at the batched-cert size
for w in 2 4 8; do
  probe cholesky 404 $w
  probe eigh 404 $w
  probe solve 404 $w
done
echo "sweep done" | tee -a "$LOG"
