"""Export the synthetic stand-in corpus to the REFERENCE's on-disk layout.

VERDICT r1 "Next round #1": the cross-framework Dice head-to-head needs the
torch reference (/root/reference) and tedm_tpu to train/eval on IDENTICAL
pixels. This script materializes the deterministic SyntheticCXRDataset as
PNG/GIF files + CSVs exactly where the reference dataloaders expect them
(dataloaders/JSRT.py:49-94, CXR14.py:49-74, NIH.py:14-50,
Montgomery.py:14-61), so both frameworks read the same uint8 files:

  <root>/JSRT/images/<id>.png            csv cols: path,id
  <root>/JSRT/SCR/masks/{right lung,left lung}/<id>.gif
  <root>/CXR14/<name>.png                csv col: 'Image Index'
  <root>/NIH/{scans,masks}/...           csv cols: scan,mask
  <root>/Montgomery/...                  csv cols: scan,'right lung','left lung'
  <root>/data/*.csv

Per-lung masks: the synthetic generator yields the merged lung mask; the
two ellipses never cross the midline (centers 0.5±0.21, rx<=0.15), so a
column partition at x=0.5 gives disjoint per-lung masks whose binarize>0.5
-> sum reconstruction is exact in both frameworks.

Usage: python scripts/parity/export_data.py --root /tmp/tedm_parity
       --img_size 64 [--n_cxr 512]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tedm_tpu.data.datasets import SyntheticCXRDataset  # noqa: E402


def _save_png(path: str, img01: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.round(img01[..., 0] * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


def _save_gif(path: str, mask: np.ndarray) -> None:
    from PIL import Image

    arr = (mask[..., 0] > 0.5).astype(np.uint8) * 255
    Image.fromarray(arr, mode="L").save(path)


def _split_lungs(mask: np.ndarray) -> tuple:
    s = mask.shape[0]
    xx = np.arange(s)[None, :, None] / s
    left = mask * (xx < 0.5)
    right = mask * (xx >= 0.5)
    assert np.array_equal(np.maximum(left, right), mask)
    return right, left  # ('right lung', 'left lung') column order


def export_jsrt(root: str, img_size: int, seed: int, hard: bool = False) -> None:
    import pandas as pd

    base = os.path.join(root, "JSRT")
    os.makedirs(os.path.join(base, "images"), exist_ok=True)
    for lab in ("right lung", "left lung"):
        os.makedirs(os.path.join(base, "SCR", "masks", lab), exist_ok=True)
    for split, n in (("train", 197), ("val", 25), ("test", 25)):
        ds = SyntheticCXRDataset(split, n, img_size, labelled=True, seed=seed, hard=hard)
        rows = []
        for i in range(n):
            img, mask = ds[i]
            iid = f"{split}_{i:04d}"
            _save_png(os.path.join(base, "images", iid + ".png"), img)
            r, l = _split_lungs(mask)
            _save_gif(os.path.join(base, "SCR", "masks", "right lung", iid + ".gif"), r)
            _save_gif(os.path.join(base, "SCR", "masks", "left lung", iid + ".gif"), l)
            rows.append({"path": f"images/{iid}.png", "id": iid})
        pd.DataFrame(rows).to_csv(
            os.path.join(root, "data", f"JSRT_{split}_split.csv"), index=False
        )
        print(f"JSRT {split}: {n} images")


def export_cxr14(root: str, img_size: int, seed: int, n: int, hard: bool = False) -> None:
    import pandas as pd

    base = os.path.join(root, "CXR14")
    os.makedirs(base, exist_ok=True)
    ds = SyntheticCXRDataset("cxr_train", n, img_size, labelled=False, seed=seed, hard=hard)
    rows = []
    for i in range(n):
        name = f"cxr_{i:05d}.png"
        _save_png(os.path.join(base, name), ds[i])
        rows.append({"Image Index": name})
    pd.DataFrame(rows).to_csv(os.path.join(root, "data", "train_split.csv"), index=False)
    print(f"CXR14: {n} images")


def export_crossdomain(root: str, img_size: int, seed: int, hard: bool = False) -> None:
    import pandas as pd

    # NIH: single merged-mask files (reference csv cols scan, mask)
    base = os.path.join(root, "NIH")
    os.makedirs(os.path.join(base, "scans"), exist_ok=True)
    os.makedirs(os.path.join(base, "masks"), exist_ok=True)
    ds = SyntheticCXRDataset("nih", 100, img_size, labelled=True, seed=seed, hard=hard)
    rows = []
    for i in range(100):
        img, mask = ds[i]
        _save_png(os.path.join(base, "scans", f"nih_{i:03d}.png"), img)
        _save_gif(os.path.join(base, "masks", f"nih_{i:03d}.gif"), mask)
        rows.append({"scan": f"scans/nih_{i:03d}.png", "mask": f"masks/nih_{i:03d}.gif"})
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "data", "correspondence_with_chestXray8.csv"), index=False
    )
    print("NIH: 100 images")

    # Montgomery: per-lung mask columns (reference csv cols scan + labels)
    base = os.path.join(root, "Montgomery")
    os.makedirs(os.path.join(base, "scans"), exist_ok=True)
    for lab in ("right", "left"):
        os.makedirs(os.path.join(base, "masks", lab), exist_ok=True)
    ds = SyntheticCXRDataset("montgomery", 100, img_size, labelled=True, seed=seed, hard=hard)
    rows = []
    for i in range(100):
        img, mask = ds[i]
        _save_png(os.path.join(base, "scans", f"mon_{i:03d}.png"), img)
        r, l = _split_lungs(mask)
        _save_gif(os.path.join(base, "masks", "right", f"mon_{i:03d}.gif"), r)
        _save_gif(os.path.join(base, "masks", "left", f"mon_{i:03d}.gif"), l)
        rows.append({
            "scan": f"scans/mon_{i:03d}.png",
            "right lung": f"masks/right/mon_{i:03d}.gif",
            "left lung": f"masks/left/mon_{i:03d}.gif",
        })
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "data", "patient_data.csv"), index=False
    )
    print("Montgomery: 100 images")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/tedm_parity")
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_cxr", type=int, default=512)
    ap.add_argument("--hard", action="store_true",
                    help="HARD corpus (VERDICT r3 #2): weak contrast, soft\n"
                         "boundaries, bias fields, occluders -- baseline\n"
                         "can no longer ceiling at n=1")
    args = ap.parse_args(argv)
    os.makedirs(os.path.join(args.root, "data"), exist_ok=True)
    export_jsrt(args.root, args.img_size, args.seed, hard=args.hard)
    export_cxr14(args.root, args.img_size, args.seed, args.n_cxr, hard=args.hard)
    export_crossdomain(args.root, args.img_size, args.seed, hard=args.hard)
    print(f"exported to {args.root}")


if __name__ == "__main__":
    main()
