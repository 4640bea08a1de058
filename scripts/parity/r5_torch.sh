#!/bin/bash
# Round-5 torch-reference queue (CPU, serialized — torch is eager, pays no
# XLA compile, and its loaders batch only the n labelled rows, so the CPU
# is its natural platform; the tedm chains run on the TPU, r5_tpu_queue2.sh).
set -u
R=/tmp/hard5
cd /root/repo
log() { echo "[torch $(date +%H:%M:%S)] $*"; }

log "R0: torch seed0 backbone + baseline/TEDM n{1,3} + LEDM n{1,3}"
timeout 28800 python -u scripts/parity/run_reference.py --root $R --out $R/ref_s0 \
  --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 --seed 0 \
  --ledm > /tmp/r5_ref0.log 2>&1
log "R0 rc=$?"

for s in 1 2; do
  log "R1: torch seed$s baseline/TEDM n{1,3} (shared backbone)"
  timeout 21600 python -u scripts/parity/run_reference.py --root $R --out $R/ref_s$s \
    --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 --seed $s \
    --backbone_ckpt $R/ref_s0/CXR14/run/best_model.pt \
    > /tmp/r5_ref$s.log 2>&1
  log "R1 seed$s rc=$?"
done
log "torch queue done"
