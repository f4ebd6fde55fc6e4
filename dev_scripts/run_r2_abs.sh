#!/bin/bash
# Round-2 remaining TPU A/Bs (fused_color / fused_march / fused_bwd / dedup
# already measured — PERFORMANCE.md). Sequential: one TPU.
set -u
mkdir -p /tmp/tpu_abs
cd "$(dirname "$0")/.."

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 3600 "$@" > "/tmp/tpu_abs/$name.log" 2>&1
    tail -15 "/tmp/tpu_abs/$name.log"
}

# 0. fresh reference-scale headline (4.2M points, auto-sized caps)
run bench_r2_base python bench.py

# 1. two-level coarse occupancy compaction at the current fast path
run coarse_ab python dev_scripts/probe_coarse_ab.py

# 2. backward-tile sweep for the fused Pallas backward
for tm in 64 96 160; do
    run "train_fused_tm$tm" env SGNERF_BWD_TM=$tm python dev_scripts/probe_train_fused.py
done

# 3. stochastic-rounding bf16 table cost at the training chunk size
run sr_speed python dev_scripts/probe_sr_speed.py

# 4. B-stacked chunks (one B=G render call vs lax.map of B=1 bodies)
run bstack python dev_scripts/probe_bstack_render.py
