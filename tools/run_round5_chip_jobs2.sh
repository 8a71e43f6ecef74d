#!/bin/bash
# Round-5 chip chain, part 2: re-runs after mid-chain fixes.
set -u
cd "$(dirname "$0")/.."

run() {
  local name="$1"; shift
  echo "=== START $name $(date -u +%H:%M:%S) ==="
  timeout 7200 "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "=== END $name rc=$? $(date -u +%H:%M:%S) ==="
}

# multiclass, with end-only checkpointing (the 27-33 s/epoch flagship
# D2H save was flattening the step-cost comparison)
run multiclass2 python tools/bench_multiclass.py

# partial cache, now with the streamed remainder's host-RAM memo
run partial_cache2 python tools/bench_partial_cache.py

# the augment_strong_quarter arm the tunnel stall ate
run ab_quarter python tools/ab_efficacy.py \
  --arms augment_strong_quarter --seeds 42,7 --epochs 40

# the Pallas AOT ladder again, now that _pick_chunk_h accepts the deep
# layers' h<8 shapes — does hybrid_pallas compile in-model after all?
run pallas_aot2 python tools/repro_pallas_aot.py

# if it does: remeasure the selective Pallas-dW arms in the full step
# (comparable to BENCH round-2's auto 286.8 / selp 287.5-289.1 ms arms)
run ab_selp python tools/ab_train_step.py \
  --variants auto,selp32,selp64,hybrid_pallas --steps 8 --batch 1 --accum 1

echo "CHAIN2 DONE $(date -u +%H:%M:%S)"
