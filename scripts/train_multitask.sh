#!/bin/bash
# End-to-end train + evaluate pipeline.
# Shape parity with the reference's scripts/train_multitask.sh:1-73 —
# hyperparameter presets for the "alignment" vs "transcription" settings,
# then train -> inference_alignment -> inference_transcript ->
# evaluate_transcript.
#
# Usage: scripts/train_multitask.sh <alignment|transcription> <train.json> <dev.json> <test.json> <save_dir> [extra args...]
set -euo pipefail

SETTING=${1:?alignment|transcription}
TRAIN_DATA=${2:?train json}
DEV_DATA=${3:?dev json}
TEST_DATA=${4:?test json}
SAVE_DIR=${5:?save dir}
shift 5

if [ "$SETTING" = "alignment" ]; then
  # reference preset: 2000 steps, backbone lr 5e-6
  TRAIN_STEPS=2000; BACKBONE_LR=5e-6
else
  # transcription preset: 600 steps, backbone lr 1e-6
  TRAIN_STEPS=600; BACKBONE_LR=1e-6
fi

python -m lyricalignment_tpu.cli.train_multitask \
  --train-data "$TRAIN_DATA" --dev-data "$DEV_DATA" \
  --whisper-model medium --train-alignment --train-transcript \
  --use-ctc-loss \
  --train-batch-size 2 --accum-grad-steps 8 \
  --lr 5e-3 --backbone-lr "$BACKBONE_LR" \
  --train-steps "$TRAIN_STEPS" --eval-steps 200 --warmup-steps 200 \
  --save-dir "$SAVE_DIR" "$@"

python -m lyricalignment_tpu.cli.inference_alignment \
  -f "$TEST_DATA" --model-dir "$SAVE_DIR" --use-ctc-loss "$@"

python -m lyricalignment_tpu.cli.inference_transcript \
  -f "$TEST_DATA" --model-dir "$SAVE_DIR" --use-groundtruth \
  -o "$SAVE_DIR/transcript_result.json" "$@"

python -m lyricalignment_tpu.cli.evaluate_transcript \
  -f "$SAVE_DIR/transcript_result.json"
