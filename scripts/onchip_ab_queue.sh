#!/usr/bin/env bash
# The round-4 on-chip A/B queue: run this ONCE when the TPU tunnel is back.
# Each stage appends its JSON rows to __checkpoint__/onchip_ab_r4.log;
# stages are ordered cheapest-first so a flaky tunnel still yields data.
# ONE process at a time owns the tunnel — do not run anything else TPU-
# bound while this is live (CLAUDE.md).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=__checkpoint__/onchip_ab_r4.log
mkdir -p __checkpoint__
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 "$@" 2>&1 | tee -a "$LOG"
  echo "(rc=$?)" | tee -a "$LOG"
}

# 0. tunnel sanity (bounded — a dead tunnel HANGS, it does not error)
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }

# 1. odd-window kernels (fastest; first Mosaic compile of the padded
#    geometry — if it rejects jnp.pad or the (7,7,c) stores, see
#    docs/ROADMAP.md round-4 fallbacks)
run python scripts/swin_fused_bench.py --odd_window

# 2. 224-model e2e A/B (fused vs XLA at window 7)
run python scripts/swin224_bench.py

# 3. stem probe incl. the s2d rows
run python scripts/stem_probe.py

# 4. student e2e incl. the s2d-stem arm
run python scripts/int8_e2e_bench.py

# 4b. device-side augmentation cost (--device_augment host-relief path)
run python scripts/device_augment_bench.py

# 5. teacher train-step A/Bs (fused_train / dots remat / both)
run python scripts/train_bench.py q2l q2l_fused q2l_dots q2l_dots_fused

# 6. teacher serving stack: merged-kernel quant A/B + real-size session
run python scripts/int8_teacher_bench.py

# 7. the headline (also captured by the driver as BENCH_rN.json)
run python bench.py

echo "queue complete -> $LOG; fold the numbers into docs/BENCH.md and set"
echo "flag defaults by measurement (fused_train / s2d_stem / remat_policy)"
