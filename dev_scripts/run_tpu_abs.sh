#!/bin/bash
# Turnkey runner for the TPU A/Bs queued while the tunnel was down
# (NEXT.md "first things when the tunnel returns"). Run from /root/repo
# WITH the axon PYTHONPATH intact (i.e. plain `bash dev_scripts/run_tpu_abs.sh`).
# Logs to /tmp/tpu_abs/.
set -u
mkdir -p /tmp/tpu_abs
cd "$(dirname "$0")/.."

run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 3600 "$@" 2>&1 | tee "/tmp/tpu_abs/$name.log" | tail -20
}

# 1. in-kernel color head (default-on, unmeasured) — flip the default if off wins
run fused_color_ab python dev_scripts/probe_fused_color_ab.py

# 2. two-level coarse occupancy compaction at the current fast path
run coarse_ab python dev_scripts/probe_coarse_ab.py

# 3. fused Pallas backward kernel (train step); sweep the backward tile
#    (VMEM ceiling AOT-verified: 160 compiles, 192 OOMs)
run train_fused python dev_scripts/probe_train_fused.py
for tm in 64 96 160; do
    run "train_fused_tm$tm" env SGNERF_BWD_TM=$tm python dev_scripts/probe_train_fused.py
done

# 4. stochastic-rounding bf16 table cost at the training chunk size
run sr_speed python dev_scripts/probe_sr_speed.py

# 5. B-stacked chunks (one B=G render call vs lax.map of B=1 bodies):
#    amortizes per-gather-op floors G-fold if they dominate (occ-mask)
run bstack python dev_scripts/probe_bstack_render.py
