#!/bin/bash
# Round-4 v2 training leg: after the v1 quality session releases the chip,
# retrain with the calibrated supervised loss (gt_mean_target anchoring,
# train/losses.py) + real-frame texture modulation (--texture_dir), then
# score the v2 checkpoint with the scale-robust flip metrics.
#
#   bash scripts/round4_v2_train.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chip

if [ "${1:-}" != "" ]; then
    echo "v2: waiting for pid $1 ..." | tee -a /tmp/chip/driver.log
    while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

echo "=== v2_train ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
MONODEPTH_TPU_VIT_WEIGHTS=artifacts/vit_simmim.npz timeout 5400 \
python -u mars_finetune.py --loss_mode supervised \
    --num_epochs 60 --batch_size 8 --render_length 320 --num_workers 0 \
    --height 384 --width 512 --learning_rate 1e-4 --encoder_lr_factor 0.1 \
    --texture_dir /root/reference/assets \
    --save_dir artifacts/ckpt_supervised_v2 --checkpoint_every 10 \
    > /tmp/chip/v2_train.log 2>&1
echo "=== v2_train done rc=$? ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log

echo "=== v2_eval ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
timeout 1800 python scripts/eval_checkpoint_quality.py \
    --ckpt artifacts/ckpt_supervised_v2 --height 384 --width 512 \
    --per_source 2 > /tmp/chip/v2_eval.log 2>&1
echo "=== v2_eval done rc=$? ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip/driver.log
