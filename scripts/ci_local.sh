#!/usr/bin/env bash
# Local runner for the CI jobs defined in .github/workflows/main.yml —
# the reference runs its whole suite per commit (main.yml:10-47); this repo
# has no hosted runner attached, so the same steps are runnable anywhere:
#
#   bash scripts/ci_local.sh            # everything
#   bash scripts/ci_local.sh suite      # CPU pytest suite only
#   bash scripts/ci_local.sh packaging  # wheel/conda/ROS/stub smoke only
#   bash scripts/ci_local.sh bench-gate # bunny accuracy gate on CPU only
#
# On this machine PYTHONPATH must keep /root/.axon_site appended (the
# sitecustomize that registers the tunneled-TPU backend); on a plain runner
# that path simply does not exist and the suffix is harmless.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}:/root/.axon_site"

step="${1:-all}"

run_suite() {
  # tests/conftest.py forces the cpu platform, the 8-device virtual mesh
  # and x64 — no env vars needed.
  python -m pytest tests/ -q
}

run_packaging() {
  python scripts/packaging_smoke.py
}

run_bench_gate() {
  # bench.py's accuracy gate (every problem < 0.1 deg / 0.01 m vs the
  # reference bounds) on the CPU backend at a small batch: validates the
  # full fused pipeline end-to-end without TPU hardware. The platform must
  # be forced in-process (env vars are too late under the sitecustomize).
  python - <<'EOF'
import json, sys, io, contextlib
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["bench.py", "8"]
sys.path.insert(0, ".")
import bench
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    bench.main()
line = buf.getvalue().strip().splitlines()[-1]
print(line)
rec = json.loads(line)
assert rec["accuracy_ok"], f"bench accuracy gate FAILED: {rec}"
EOF
}

case "$step" in
  suite) run_suite ;;
  packaging) run_packaging ;;
  bench-gate) run_bench_gate ;;
  all)
    run_suite
    run_packaging
    run_bench_gate
    ;;
  *) echo "unknown step: $step" >&2; exit 2 ;;
esac
echo "ci_local[$step]: OK"
