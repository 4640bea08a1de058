#!/bin/bash
# End-to-end on-chip validation: backbone -> classifiers -> eval harnesses,
# all on synthetic stand-ins. Serializes TPU jobs (one process owns the
# tunnel at a time). Logdir convention: <parent>/<experiment>/<n>/<name>.
# Usage: capstone.sh [ROOT] (default /tmp/capstone)
set -e
ROOT=${1:-/tmp/capstone}
cd /root/repo
mkdir -p "$ROOT"

echo "=== 0/5 compiled-kernel gate (KERNELS.json) ==="
python scripts/kernel_check.py

echo "=== 1/5 backbone (img_only, 600 steps) ==="
python -m tedm_tpu.train --experiment img_only --synthetic_data \
  --log_dir "$ROOT/backbone" --max_steps 600 --val_freq 300 --log_freq 100 \
  --batch_size 16 --n_sampled_imgs 4
BB="$ROOT/CXR14/backbone"
echo "backbone at: $BB"

echo "=== 2/5 baseline n=3 ==="
python -m tedm_tpu.train --experiment baseline --synthetic_data \
  --n_labelled_images 3 --log_dir "$ROOT/base3" --max_steps 300 \
  --val_freq 100 --log_freq 100

echo "=== 3/5 TEDM n=3 ==="
python -m tedm_tpu.train --experiment TEDM --synthetic_data \
  --n_labelled_images 3 --log_dir "$ROOT/tedm3" --max_steps 300 \
  --val_freq 100 --log_freq 100 --saved_diffusion_model "$BB/best"

echo "=== 4/5 eval harnesses ==="
python -m tedm_tpu.eval.run_tests -e "$ROOT/baseline/3/base3"
python -m tedm_tpu.eval.run_tests -e "$ROOT/TEDM/3/tedm3"
python -m tedm_tpu.eval.testing_shared_weights -e "$ROOT/TEDM/3/tedm3"

echo "=== 5/5 CAPSTONE DONE ==="
