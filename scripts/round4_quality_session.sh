#!/bin/bash
# Round-4 quality session: everything that must run ON THE CHIP once the
# supervised fine-tune (mars_finetune --loss_mode supervised) finishes.
# ONE TPU process at a time; incremental logs under /tmp/chip/.
#
#   bash scripts/round4_quality_session.sh [finetune_pid]
#
# If a pid is given, waits for that process to exit first (the training
# run holds the TPU grant).  Results land in /tmp/chip/*.log; the caller
# reads them into docs/PERF_STUDY.md + README and commits.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip
CKPT=artifacts/ckpt_supervised

if [ "${1:-}" != "" ]; then
    echo "waiting for training pid $1 ..." | tee -a /tmp/chip/driver.log
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
    echo "training done ($(date +%H:%M:%S))" | tee -a /tmp/chip/driver.log
fi

run() { # name timeout cmd...
    local name=$1 t=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
    timeout "$t" "$@" >"/tmp/chip/$name.log" 2>&1
    local rc=$?
    echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
    return $rc
}

# 1. Non-circular checkpoint quality: trained vs random on held-out REAL
#    Mars frames (flip inconsistency + no-reference proxy score).
run eval_ckpt 1800 python scripts/eval_checkpoint_quality.py \
    --ckpt "$CKPT" --height 384 --width 512 --per_source 2

# 2. Attention-mode quality under TRAINED weights (the round-3 r~0.28
#    random-weight caveat, finally resolved with real evidence).
run mode_quality 2400 python scripts/dev_mode_quality.py 2 512 "$CKPT"

# 3. bf16-vs-f32 + host_upsample knob quality under trained weights.
run dtype_quality 1800 python scripts/dev_dtype_quality.py --ckpt "$CKPT"

# 4. The GELU lever on-chip: fused Dense+GELU Pallas kernel A/B
#    (towers + full native forward + accuracy gate).
run gelu_probe 1800 python scripts/dev_gelu_probe.py 8

# 5. End-to-end verify drive of the trained default checkpoint through the
#    flagship CLI (also exercises the MONODEPTH_TPU_CHECKPOINT hook).
run e2e_trained 900 env MONODEPTH_TPU_CHECKPOINT="$CKPT" \
    python run_mars_depth.py \
    --input "/root/reference/assets/rover/Screenshot 2025-05-30 102533.png" \
    --output_dir /tmp/verify_trained --max_size 512 \
    --visualizations standard --benchmark

echo "ALL STAGES DONE ($(date +%H:%M:%S))" | tee -a /tmp/chip/driver.log
