#!/bin/bash
# Round-5 TPU queue, take 2: ALL tedm_tpu chains run on the real chip.
# Rationale (r5 measured): the CPU chain pays the static batch-16 padding
# in real time (~30 s/step at n=1), while torch pays only n rows — so each
# framework runs on its natural platform: tedm_tpu on TPU, torch on CPU
# (scripts/parity/r5_torch.sh). Platform neutrality of the tedm chain is
# cross-checked against r4's CPU-run hard-corpus cells (TEDM/1 = 79.75).
#
# One invocation per experiment family: n-cells inside a family share every
# compiled graph, families don't — and a tunnel crash then loses one
# family, not the whole grid (summary.json merges across invocations).
set -u
R=/tmp/hard5
OUT=$R/tpu_grid
cd /root/repo
log() { echo "[tpu2 $(date +%H:%M:%S)] $*"; }
run() { timeout "$1" python -u scripts/parity/run_tpu.py --root $R \
        --img_size 64 --backbone_steps 400 --head_steps 300 "${@:2}"; }

log "G0: seed-0 backbone (400 steps) on TPU"
run 7200 --out $OUT --sizes 1 --experiments baseline --skip_baseline --seed 0 \
  > /tmp/r5g_bb.log 2>&1
log "G0 rc=$? (backbone at $OUT/CXR14/run)"

for fam in baseline LEDM LEDMe TEDM Step_1; do
  log "G1: $fam x n{1,3,6,12}"
  run 10800 --out $OUT --sizes 1 3 6 12 --experiments $fam --skip_backbone \
    --seed 0 > /tmp/r5g_$fam.log 2>&1
  log "G1 $fam rc=$?"
done

for s in 1 2; do
  log "G2: seed$s baseline+TEDM n{1,3} (shared seed-0 backbone)"
  run 10800 --out $R/tpu_s$s --sizes 1 3 --experiments baseline TEDM \
    --skip_backbone --backbone_dir $OUT/CXR14/run --seed $s \
    > /tmp/r5g_s$s.log 2>&1
  log "G2 seed$s rc=$?"
done

EMA_BB=$R/tpu_ema10k/CXR14/run
log "G3: EMA A/B heads on the 10k ema backbone"
run 7200 --out $R/tpu_ema10k_ema --sizes 1 3 --experiments TEDM \
  --skip_baseline --skip_backbone --backbone_dir $EMA_BB \
  --ema_decay 0.9999 --seed 0 > /tmp/r5g_ema.log 2>&1
log "G3 ema rc=$?"
run 7200 --out $R/tpu_ema10k_raw --sizes 1 3 --experiments TEDM \
  --skip_baseline --skip_backbone --backbone_dir $EMA_BB \
  --ema_decay 0.9999 --serve_raw_params --seed 0 > /tmp/r5g_raw.log 2>&1
log "G3 raw rc=$?"
log "tpu queue2 done"
