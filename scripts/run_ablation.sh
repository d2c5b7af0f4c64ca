#!/usr/bin/env bash
# Ablation matrix driver — the reference's de-facto integration test
# (`run_ablation_signal.sh` in maxingan2412/Signal): baseline → +SIM →
# +SIM+GAM → +SIM+GAM+LAM, as config overrides (not code branches).
# The reference parallelizes over 4 GPUs; with one TPU chip we run
# sequentially. Usage: scripts/run_ablation.sh [config] [extra opts...]
set -euo pipefail

CFG="${1:-configs/RGBNT201/Signal.yml}"
shift || true
STAMP="$(date +%Y%m%d_%H%M%S)"
OUT="logs/ablation_${STAMP}"
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== ${name} ==="
  python train.py --config_file "$CFG" "$@" \
    OUTPUT_DIR "$OUT" ckpt_save_path "$name" 2>&1 | tee "$OUT/${name}.log"
}

# sign=1: baseline (concat CLS heads only)
run sign1_baseline      MODEL.USE_A False MODEL.USE_B False "$@"
# sign=2: +SIM
run sign2_SIM           MODEL.USE_A True  MODEL.USE_B False "$@"
# sign=3 (CLS): +SIM+GAM
run sign3_SIM_GAM       MODEL.USE_A True  MODEL.USE_B True  MODEL.stageName CLS "$@"
# sign=3 (together): +SIM+GAM+LAM
run sign3_SIM_GAM_LAM   MODEL.USE_A True  MODEL.USE_B True  MODEL.stageName together_CLS_Patch "$@"

echo "ablation logs in $OUT"
grep -H "Best mAP" "$OUT"/*/train_log.txt || true
