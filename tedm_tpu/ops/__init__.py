"""Numerical ops: diffusion schedules, metrics, resize, augment, and the
Pallas TPU kernels (ops/pallas/)."""

from tedm_tpu.ops.schedules import DiffusionSchedule, make_schedule
from tedm_tpu.ops.metrics import bce_with_logits, dice, precision, recall
from tedm_tpu.ops.resize import bilinear_resize, nearest_resize, nearest_upsample_2x
