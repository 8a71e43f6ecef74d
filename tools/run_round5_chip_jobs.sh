#!/bin/bash
# Round-5 chip job chain: keeps the single TPU busy through the round's
# measurement backlog, one job at a time, each logged separately.
# Usage: nohup bash tools/run_round5_chip_jobs.sh > /tmp/chip_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  timeout 14400 "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== END $name rc=$? $(date -u +%H:%M:%S) ==="
}

# 1. The statistics the round-4 verdict demanded: every recommended arm
#    plus the fgos mechanism A/B at 3 seeds (VERDICT r4 next #3/#4).
run ab_main python tools/ab_efficacy.py \
  --arms baseline,crop64,crop64_fgos_center,crop64_fgos_window,deep_supervision,tversky,ema,augment,combo \
  --seeds 42,7,1234 --epochs 40

# 2. Strong-augmentation magnitude sweep at 2 seeds (VERDICT r4 next #7).
run ab_aug python tools/ab_efficacy.py \
  --arms augment_strong,augment_strong_half,augment_strong_quarter \
  --seeds 42,7 --epochs 40

# 3. Partial device cache throughput (VERDICT r4 missing #2 / next #5).
run partial_cache python tools/bench_partial_cache.py

# 4. Multi-class on-chip record (VERDICT r4 next #6).
run multiclass python tools/bench_multiclass.py

# 5. Pallas-dW in-graph AOT failure record (VERDICT r4 next #8).
run pallas_aot python tools/repro_pallas_aot.py

# 6. Headline bench sanity.
run bench python bench.py

echo "ALL CHIP JOBS DONE $(date -u +%H:%M:%S)"
