#!/bin/bash
# Round-5 protocol pipeline (VERDICT r4 #2/#3/#7) — ALL heavy CPU jobs,
# strictly serialized (1-CPU host, CLAUDE.md). Stages:
#   S1  tedm backbone seed0 (400 steps) — shared by every tedm head
#   S2  tedm seed0 replicate cells: baseline+TEDM n in {1,3} (CPU,
#       platform-consistent with the r4 hard-corpus table)
#   S3  tedm seeds 1,2: baseline+TEDM n in {1,3} on the SHARED backbone
#   S4  torch seed0: backbone + baseline+TEDM n{1,3} + LEDM n{1,3}
#   S5  torch seeds 1,2: baseline+TEDM n{1,3} on the shared torch backbone
#   S6  EMA A/B heads (TEDM n{1,3} x {ema,raw}) on the 10k-step
#       --ema_decay 0.9999 backbone trained on the TPU (waits for its
#       checkpoint to appear)
# The TPU-side protocol grid (LEDM/LEDMe/TEDM/Step_1 x n{1,3,6,12}) runs
# separately on the TPU queue — see r5 notes.
set -u
R=/tmp/hard5
cd /root/repo
# Persistent compilation cache for the CPU stages: each pipeline stage is
# a fresh process and the dim-64 UNet train-graph compile is ~30 min on
# this 1-CPU host. (CLAUDE.md's "10x slower" persistent-cache rejection is
# about REMOTE axon/TPU compiles — CPU executables cache fine on disk.)
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_cpu
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

log "S1+S2: tedm seed0 backbone + baseline/TEDM n in {1,3}"
timeout 14400 python -u scripts/parity/run_tpu.py --root $R --out $R/tpu_s0 \
  --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 \
  --experiments baseline TEDM --platform cpu --seed 0 \
  > /tmp/r5_s0.log 2>&1
log "S1+S2 rc=$?"

for s in 1 2; do
  log "S3: tedm seed$s baseline/TEDM n in {1,3} (shared seed0 backbone)"
  timeout 10800 python -u scripts/parity/run_tpu.py --root $R --out $R/tpu_s$s \
    --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 \
    --experiments baseline TEDM --platform cpu --seed $s \
    --backbone_dir $R/tpu_s0/CXR14/run \
    > /tmp/r5_s$s.log 2>&1
  log "S3 seed$s rc=$?"
done

log "S4: torch seed0 backbone + baseline/TEDM/LEDM n in {1,3}"
timeout 21600 python -u scripts/parity/run_reference.py --root $R --out $R/ref_s0 \
  --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 --seed 0 \
  --ledm > /tmp/r5_ref0.log 2>&1
log "S4 rc=$?"

for s in 1 2; do
  log "S5: torch seed$s baseline/TEDM n in {1,3} (shared torch backbone)"
  timeout 14400 python -u scripts/parity/run_reference.py --root $R --out $R/ref_s$s \
    --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 --seed $s \
    --backbone_ckpt $R/ref_s0/CXR14/run/best_model.pt \
    > /tmp/r5_ref$s.log 2>&1
  log "S5 seed$s rc=$?"
done

log "S6: EMA A/B heads on the 10k ema backbone"
EMA_BB=$R/tpu_ema10k/CXR14/run
for i in $(seq 1 60); do
  [ -d "$EMA_BB/best/state" ] && break
  log "  waiting for $EMA_BB/best/state ($i/60)"; sleep 60
done
if [ -d "$EMA_BB/best/state" ]; then
  timeout 10800 python -u scripts/parity/run_tpu.py --root $R --out $R/tpu_ema10k_ema \
    --img_size 64 --backbone_steps 10000 --head_steps 300 --sizes 1 3 \
    --experiments TEDM --skip_baseline --platform cpu --seed 0 \
    --backbone_dir $EMA_BB --ema_decay 0.9999 \
    > /tmp/r5_ema_ema.log 2>&1
  log "S6 ema arm rc=$?"
  timeout 10800 python -u scripts/parity/run_tpu.py --root $R --out $R/tpu_ema10k_raw \
    --img_size 64 --backbone_steps 10000 --head_steps 300 --sizes 1 3 \
    --experiments TEDM --skip_baseline --platform cpu --seed 0 \
    --backbone_dir $EMA_BB --ema_decay 0.9999 --serve_raw_params \
    > /tmp/r5_ema_raw.log 2>&1
  log "S6 raw arm rc=$?"
else
  log "S6 SKIPPED: ema backbone checkpoint never appeared"
fi
log "pipeline done"
