"""Input pipeline: CXR datasets + TPU-fed batch loader.

Datasets mirror the reference's PIL preprocessing bit-for-bit (same PIL
calls on host: convert('L'), resize, /255, mask binarize>0.5 and per-lung
merge — reference: dataloaders/JSRT.py:62-88) but emit NHWC numpy. The
loader adds what the reference lacks (SURVEY §2.3): static batch shapes
(padding + valid-mask instead of ragged final batches, so jit never
recompiles), seeded epoch shuffling, background prefetch, and per-host
sharding for multi-host meshes.
"""

from tedm_tpu.data.datasets import (
    JSRTDataset,
    CXR14Dataset,
    NIHDataset,
    MonDataset,
    SyntheticCXRDataset,
    SPLITS_DIR,
)
from tedm_tpu.data.pipeline import Loader, build_dataloaders
