#!/bin/bash
# Round-5 TPU queue — strictly serialized (only ONE process can hold the
# axon TPU session, CLAUDE.md). Stages:
#   T1  (launched separately) 10k-step --ema_decay 0.9999 backbone
#   T2  sampling-headroom experiments (VERDICT r4 #6): latency-hiding
#       scheduler A/B at 128², bf16 GN stats at 256²
#   T3  the paper-protocol grid on the real chip (VERDICT r4 #3):
#       {baseline, LEDM, LEDMe, TEDM, Step_1} x n in {1,3,6,12}, seed 0,
#       on the SHARED CPU-trained seed-0 backbone (waits for it) — one
#       process, so each family compiles once
set -u
R=/tmp/hard5
cd /root/repo
log() { echo "[tpu-queue $(date +%H:%M:%S)] $*"; }

log "T1 wait: ema backbone process"
while kill -0 "$(cat /tmp/ema10k.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
log "T1 done"

log "T2a: latency-hiding scheduler A/B (128^2)"
timeout 2400 python -u scripts/bench_headroom.py --only lhs \
  > /tmp/r5_lhs.json 2> /tmp/r5_lhs.err
log "T2a rc=$?"

log "T2b: bf16 GN stats (256^2, 200-step scan)"
timeout 2400 python -u scripts/bench_headroom.py --only gn_bf16 \
  --img 256 --scan_steps 200 --reps 2 \
  > /tmp/r5_gnbf16.json 2> /tmp/r5_gnbf16.err
log "T2b rc=$?"

log "T3 wait: CPU seed-0 backbone checkpoint"
BB=$R/tpu_s0/CXR14/run
for i in $(seq 1 240); do
  [ -d "$BB/best/state" ] && break
  sleep 60
done
if [ -d "$BB/best/state" ]; then
  log "T3: protocol grid on TPU (20 cells, one process)"
  timeout 14400 python -u scripts/parity/run_tpu.py --root $R --out $R/tpu_grid \
    --img_size 64 --backbone_steps 400 --head_steps 300 --sizes 1 3 6 12 \
    --experiments baseline LEDM LEDMe TEDM Step_1 --seed 0 \
    --backbone_dir $BB \
    > /tmp/r5_grid.log 2>&1
  log "T3 rc=$?"
else
  log "T3 SKIPPED: CPU backbone never appeared"
fi
log "tpu queue done"
