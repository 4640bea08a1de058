#!/usr/bin/env bash
# One-command real-data runbook (VERDICT r3 #7): licensed-data dir layout ->
# DDPM backbone -> heads at n in {1,3,197} -> eval harnesses -> paper tables.
#
# The licensed JSRT / ChestXray-NIHCC / NIH-annotated / Montgomery images are
# NOT distributable with this repo; point the env vars below at your copies.
# Split CSVs ship inside the package (tedm_tpu/data/splits/, byte-identical
# to the reference's data/*.csv) — no preprocessing step is needed.
#
# Expected directory layout (matches the reference, train.py:27-32 and
# run_tests.py:83-91):
#   $CXR14_DIR/                  ChestXray-NIHCC/images — ~112k PNGs; the
#                                bundled train_split.csv selects ~89.7k rows
#                                by 'Image Index'
#   $JSRT_DIR/                   JSRT images; CSV 'path' column is relative
#                                to this dir; masks at
#                                SCR/masks/{right lung,left lung}/<id>.gif
#   $NIH_DIR/                    NIH-annotated lungs; CSV cols scan/mask are
#                                relative paths inside this dir
#   $MON_DIR/                    Montgomery; CSV cols scan + per-lung mask
#                                columns, relative to this dir; put (or keep)
#                                patient_data.csv in this dir
#
# Usage:
#   CXR14_DIR=... JSRT_DIR=... NIH_DIR=... MON_DIR=... \
#     bash scripts/run_real_data.sh [LOGROOT]
#
# Approximate runtimes on 1x TPU v5e (measured step rates, BASELINE.md):
#   stage 1 backbone   500k steps @ ~67 ms/step (bf16, batch 16)  ~9.5 h
#                      (shorten with BACKBONE_STEPS for a pilot)
#   stage 2 heads      3 sizes x 2 families; early-stops, typically
#                      <=20k steps each                           ~1-2 h
#   stage 3 eval       4 datasets x 7 experiment dirs             ~15 min
#   stage 4 tables     seconds
set -euo pipefail

LOGROOT="${1:-logs_real}"
BACKBONE_STEPS="${BACKBONE_STEPS:-500000}"
HEAD_STEPS="${HEAD_STEPS:-500000}"
SIZES="${SIZES:-1 3 197}"
: "${CXR14_DIR:?set CXR14_DIR to the ChestXray-NIHCC images directory}"
: "${JSRT_DIR:?set JSRT_DIR to the JSRT root (images + SCR/masks)}"
: "${NIH_DIR:?set NIH_DIR to the NIH-annotated lungs root}"
: "${MON_DIR:?set MON_DIR to the Montgomery root}"

cd "$(dirname "$0")/.."
mkdir -p "$LOGROOT"

# ---------------------------------------------------------------- stage 1
# Unconditional DDPM backbone on CXR14 (reference: trainers/train_CXR14.py).
# bf16 + EMA; best-val checkpoint lands in $LOGROOT/CXR14/backbone/best.
BACKBONE="$LOGROOT/CXR14/backbone"
if [ ! -d "$BACKBONE/best/state" ]; then
  echo "== stage 1: DDPM backbone ($BACKBONE_STEPS steps) =="
  python -m tedm_tpu.train \
    --experiment img_only --dataset CXR14 --data_dir "$CXR14_DIR" \
    --log_dir "$LOGROOT/backbone" --max_steps "$BACKBONE_STEPS" \
    --mixed_precision --ema_decay 0.9999 --ckpt_every 25000
else
  echo "== stage 1: backbone checkpoint exists, skipping =="
fi

# ---------------------------------------------------------------- stage 2
# Supervised heads on JSRT at each labelled-set size
# (reference: train_baseline.py / train_datasetDM.py).
for n in $SIZES; do
  for exp in baseline TEDM LEDM; do
    run="$LOGROOT/$exp/$n/run"
    if [ -d "$run/best/state" ]; then
      echo "== stage 2: $exp n=$n exists, skipping =="
      continue
    fi
    echo "== stage 2: $exp n=$n =="
    python -m tedm_tpu.train \
      --experiment "$exp" --dataset JSRT --data_dir "$JSRT_DIR" \
      --n_labelled_images "$n" --log_dir "$LOGROOT/run" \
      --saved_diffusion_model "$BACKBONE/best" \
      --max_steps "$HEAD_STEPS" --early_stop
    # the trainer rewrites log_dir to $LOGROOT/<exp>/<n>/run (reference
    # logdir convention, train.py:24)
  done
done

# ---------------------------------------------------------------- stage 3
# Eval harnesses: per-dataset predictions + Dice/precision/recall npz
# (reference: auxiliary/postprocessing/{run_tests,testing_shared_weights}.py)
for n in $SIZES; do
  for exp in baseline LEDM; do
    echo "== stage 3: run_tests $exp/$n =="
    python -m tedm_tpu.eval.run_tests \
      --experiment "$LOGROOT/$exp/$n/run" \
      --nih_path "$NIH_DIR" --mon_path "$MON_DIR"
  done
  echo "== stage 3: testing_shared_weights TEDM/$n =="
  python -m tedm_tpu.eval.testing_shared_weights \
    --experiment "$LOGROOT/TEDM/$n/run" \
    --nih_path "$NIH_DIR" --mon_path "$MON_DIR"
done

# ---------------------------------------------------------------- stage 4
# Paper tables (LaTeX rows, Dice x100 mean+-std) + Wilcoxon tests
# (reference: auxiliary/notebooks_and_reporting/print_tests_shared_weights.py)
echo "== stage 4: tables =="
python -m tedm_tpu.reporting.tables --logs "$LOGROOT" \
  --experiments baseline LEDM TEDM --datasizes $SIZES

echo "Done. Tables above; raw artifacts in $LOGROOT/<exp>/<n>/run/*.npz"
