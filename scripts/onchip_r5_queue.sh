#!/usr/bin/env bash
# Round-5 on-chip measurement queue. ONE process owns the tunnel
# (CLAUDE.md): this script first waits for any PID in /tmp/bisect.pid to
# exit, then runs the remaining A/Bs serially, teeing every row into the
# TRACKED docs/onchip/ directory (VERDICT r4 #6: evidence must be
# committable). Launch detached (setsid nohup) so it survives the
# builder session.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=docs/onchip/ab_r5.log
mkdir -p docs/onchip

if [ -f /tmp/bisect.pid ]; then
  while kill -0 "$(cat /tmp/bisect.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" 2>&1 | tee -a "$LOG"
  echo "(rc=$?)" | tee -a "$LOG"
}

# tunnel sanity (a dead tunnel HANGS rather than erroring)
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "tunnel down" | tee -a "$LOG"; exit 1; }

# 1. student e2e incl. the FIXED fused-stem arms (VERDICT r4 #3)
run python scripts/int8_e2e_bench.py

# 2. rotation warp A/B: gather vs two-pass shift+GEMM (VERDICT r4 #4)
run python scripts/device_augment_bench.py

# 3. stem kernel micro rows (fused Pallas vs XLA plans)
run python scripts/stem_probe.py

echo "queue complete -> $LOG" | tee -a "$LOG"
