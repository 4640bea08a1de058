"""Dataset readers (host-side, numpy, NHWC).

Each dataset returns ``(img, mask)`` float32 NHWC arrays in [0, 1] (mask
binary), or just ``img`` for the unlabeled CXR14 corpus, with preprocessing
identical to the reference:

* JSRT      — reference: dataloaders/JSRT.py:49-94. CSV cols: path, id;
              masks at SCR/masks/{right lung,left lung}/<id>.gif,
              binarized > 0.5 and summed (overlap guard re-binarizes).
* CXR14     — reference: dataloaders/CXR14.py:49-74. CSV col: 'Image Index';
              image-only.
* NIH       — reference: dataloaders/NIH.py:14-50. CSV cols: scan, mask.
* Montgomery— reference: dataloaders/Montgomery.py:15-61. CSV cols: scan +
              per-lung mask columns 'right lung'/'left lung'.
* Synthetic — deterministic pseudo-CXR generator (no reference equivalent):
              lets every trainer, test, and benchmark run without the
              licensed medical images. Seeded per (split, index).

CSV split files are copied verbatim from the reference's data/ directory
into tedm_tpu/data/splits/ (same row counts: JSRT 197/25/25, CXR14 ~89.7k,
NIH 100).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

SPLITS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "splits")


def _load_pil_image(path: str, img_size: int) -> np.ndarray:
    """PIL convert('L').resize((s, s)) then ToTensor semantics (/255),
    as (H, W, 1) float32 — bit-compatible with the reference host path
    (dataloaders/JSRT.py:62-65). The resize runs through the native C++
    resampler when built (tedm_tpu/native — byte-exact with PIL, pinned by
    tests/test_native_resample.py); PIL otherwise."""
    from tedm_tpu import native

    arr8 = None
    if path.lower().endswith(".png") and native.png_available():
        # fully native: libpng decode -> PIL-'L' luma -> PIL-exact resize
        arr8 = native.load_resize_png(path, (img_size, img_size))
    if arr8 is None:
        from PIL import Image

        img = Image.open(path).convert("L")
        if native.available():
            arr8 = native.resize_u8(
                np.asarray(img, dtype=np.uint8), (img_size, img_size)
            )
        else:
            arr8 = np.asarray(img.resize((img_size, img_size)), dtype=np.uint8)
    return arr8.astype(np.float32)[..., None] / 255.0


def _load_mask(paths: Sequence[str], img_size: int) -> np.ndarray:
    """Binarize each mask at > 0.5 and sum; if lungs overlap, re-binarize
    (reference: dataloaders/JSRT.py:67-88)."""
    masks = [(_load_pil_image(p, img_size) > 0.5).astype(np.float32) for p in paths]
    m = np.sum(masks, axis=0)
    if (m > 1).sum() > 0:
        m = (m > 0.5).astype(np.float32)
    return m


class JSRTDataset:
    def __init__(
        self,
        base_path: str,
        csv_name: str,
        img_size: int = 128,
        labels: Sequence[str] = ("right lung", "left lung"),
        splits_dir: str = SPLITS_DIR,
    ):
        import pandas as pd

        self.df = pd.read_csv(os.path.join(splits_dir, csv_name))
        self.base_path = base_path
        self.labels = list(labels)
        self.img_size = img_size
        self.has_labels = True

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        i = self.df.index[index]
        img = _load_pil_image(
            os.path.join(self.base_path, self.df.loc[i, "path"]), self.img_size
        )
        mask_paths = [
            os.path.join(self.base_path, "SCR", "masks", lab, str(self.df.loc[i, "id"]) + ".gif")
            for lab in self.labels
        ]
        return img, _load_mask(mask_paths, self.img_size)


class CXR14Dataset:
    """Unlabeled DDPM corpus. The reference's val/test quirk (all three
    loaders read train_split.csv, dataloaders/CXR14.py:30-32) is preserved
    at the build_dataloaders level for parity."""

    def __init__(self, data_path: str, csv_name: str = "train_split.csv",
                 img_size: int = 128, splits_dir: str = SPLITS_DIR):
        import pandas as pd

        self.df = pd.read_csv(os.path.join(splits_dir, csv_name))
        self.data_path = data_path
        self.img_size = img_size
        self.has_labels = False

    def __len__(self) -> int:
        return len(self.df)

    def _path(self, index: int) -> str:
        return os.path.join(self.data_path, self.df.loc[index, "Image Index"])

    def __getitem__(self, index: int) -> np.ndarray:
        return _load_pil_image(self._path(index), self.img_size)

    def get_batch(self, indices) -> np.ndarray:
        """Whole-batch load: one native C++ call decodes+resizes every PNG
        across `std::thread`s with no GIL (tedm_tpu/native). Byte-identical
        to per-item __getitem__ (same decode/resample code); rows the
        native path can't handle fall back to PIL individually."""
        from tedm_tpu import native

        paths = [self._path(i) for i in indices]
        if native.png_available() and all(p.lower().endswith(".png") for p in paths):
            out, ok = native.load_resize_png_batch(
                paths, (self.img_size, self.img_size)
            )
            if out is not None:
                imgs = out.astype(np.float32)[..., None] / 255.0
                for j in np.nonzero(~ok)[0]:
                    imgs[j] = _load_pil_image(paths[j], self.img_size)
                return imgs
        return np.stack([_load_pil_image(p, self.img_size) for p in paths])


class NIHDataset:
    def __init__(self, base_path: str, csv_name: str = "correspondence_with_chestXray8.csv",
                 img_size: int = 128, splits_dir: str = SPLITS_DIR):
        import pandas as pd

        self.df = pd.read_csv(os.path.join(splits_dir, csv_name))
        self.base_path = base_path
        self.img_size = img_size
        self.has_labels = True

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        i = self.df.index[index]
        img = _load_pil_image(
            os.path.join(self.base_path, self.df.loc[i, "scan"]), self.img_size
        )
        mask = (_load_pil_image(
            os.path.join(self.base_path, self.df.loc[i, "mask"]), self.img_size
        ) > 0.5).astype(np.float32)
        return img, mask


class MonDataset:
    def __init__(self, base_path: str, csv_name: str, img_size: int = 128,
                 labels: Sequence[str] = ("right lung", "left lung"),
                 splits_dir: str = SPLITS_DIR):
        import pandas as pd

        self.df = pd.read_csv(os.path.join(splits_dir, csv_name))
        self.base_path = base_path
        self.labels = list(labels)
        self.img_size = img_size
        self.has_labels = True

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        i = self.df.index[index]
        img = _load_pil_image(
            os.path.join(self.base_path, self.df.loc[i, "scan"]), self.img_size
        )
        mask_paths = [
            os.path.join(self.base_path, self.df.loc[i, lab]) for lab in self.labels
        ]
        return img, _load_mask(mask_paths, self.img_size)


class SyntheticCXRDataset:
    """Deterministic pseudo chest X-rays with elliptical lung fields.

    Image = smooth body background + brighter thorax + two dark elliptical
    lungs + rib-like sinusoidal bands + speckle noise; mask = union of the
    two ellipses. Every sample is a pure function of (split, index, size),
    so runs are reproducible across hosts and processes.
    """

    def __init__(self, split: str = "train", n: int = 256, img_size: int = 128,
                 labelled: bool = True, seed: int = 0):
        self.split = split
        self.n = n
        self.img_size = img_size
        self.has_labels = labelled
        self.seed = seed
        # shared per-instance constants (recomputing the meshgrid and body
        # background per image made the host pipeline the training
        # bottleneck: 114 imgs/s fed vs 262 imgs/s device capability)
        s = img_size
        self._yy, self._xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        self._body = 0.25 + 0.35 * np.exp(
            -(((self._yy - 0.5) ** 2) / 0.5 + ((self._xx - 0.5) ** 2) / 0.25)
        )

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int):
        import zlib

        s = self.img_size
        # crc32, not hash(): str hashing is salted per process, which would
        # break the documented cross-process/host determinism
        base = zlib.crc32(f"{self.split}:{self.seed}".encode()) % (2**31 - 1)
        rs = np.random.RandomState((base + 1000003 * index) % (2**31 - 1))
        yy, xx = self._yy, self._xx

        img = self._body.copy()
        mask = np.zeros((s, s), np.float32)
        for side in (-1.0, 1.0):
            cx = 0.5 + side * (0.21 + 0.03 * rs.randn())
            cy = 0.48 + 0.03 * rs.randn()
            rx = 0.13 + 0.02 * rs.rand()
            ry = 0.26 + 0.03 * rs.rand()
            theta = 0.12 * side + 0.05 * rs.randn()
            xr = (xx - cx) * np.cos(theta) - (yy - cy) * np.sin(theta)
            yr = (xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
            lung = ((xr / rx) ** 2 + (yr / ry) ** 2) < 1.0
            mask = np.maximum(mask, lung.astype(np.float32))
            img = np.where(lung, img - 0.18 - 0.04 * rs.rand(), img)
        img = img + 0.03 * np.sin(yy * (40 + 5 * rs.rand()) + xx * 3)  # ribs
        img = img + 0.02 * rs.randn(s, s).astype(np.float32)  # speckle
        img = np.clip(img, 0.0, 1.0).astype(np.float32)[..., None]
        if not self.has_labels:
            return img
        return img, mask[..., None]
