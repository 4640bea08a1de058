"""Run the TORCH REFERENCE end-to-end on the exported synthetic corpus.

VERDICT r1 "Next round #1": train the reference's own chain —
train_CXR14 (DDPM backbone) -> train_baseline / train_datasetDM (TEDM)
-> run_tests / testing_shared_weights-equivalent eval — on the same
pixels tedm_tpu trains on, and record torch Dice for the head-to-head.

The reference code in /root/reference is used UNMODIFIED except for three
documented runtime patches applied from this driver (the files themselves
are read-only and untouched):

1. ``dataloaders.{JSRT,CXR14}.PROJECT_DIR`` -> the export root, so the
   split CSVs come from the exported corpus instead of the repo's real
   JSRT/CXR14 csvs (reference reads PROJECT_DIR/'data'/..., JSRT.py:29).
2. ``trainers.train_CXR14.sample_plot_image`` -> kwarg-tolerant no-op.
   The reference call passes ``normalized=`` which the callee does not
   accept (train_CXR14.py:86 vs trainers/utils.py:63) — it CRASHES at the
   first validation as shipped. The function only renders a TensorBoard
   image grid (1000 sequential UNet forwards); it contributes nothing to
   the Dice chain being compared.
3. ``trainers.train_CXR14.Path``/``train_baseline``'s ``config.log_dir``
   get a str-subclass that supports both ``/`` (train_baseline.py:84) and
   ``+`` (train_CXR14.py:55) — the reference mixes Path and str ops on
   log_dir, which TypeErrors on the CXR14 save path as shipped.

Usage (slow: torch CPU, single thread — run in background):
    python scripts/parity/run_reference.py --root /tmp/tedm_parity \
        --out /tmp/tedm_parity/ref_logs --img_size 64 \
        --backbone_steps 800 --head_steps 300 --sizes 1 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REFERENCE = "/root/reference"


class StrPath(str):
    """str that also supports the pathlib ops the reference uses."""

    def __truediv__(self, other):
        return StrPath(os.path.join(str(self), str(other)))

    @property
    def parent(self):
        return StrPath(os.path.dirname(str(self)) or ".")

    @property
    def name(self):
        return os.path.basename(str(self))


def install_torchvision_shim() -> None:
    """torchvision is not installed in this image; the reference uses only
    ``transforms.ToTensor`` (dataloaders), ``utils.make_grid`` +
    ``transforms.{Resize,InterpolationMode}`` (sampling viz / finetune
    augmentation — neither in the compared Dice chain). Provide faithful
    minimal implementations so the reference imports unmodified.
    ToTensor matches torchvision exactly for PIL 'L' inputs:
    uint8 (H, W) -> float32 (1, H, W) / 255."""
    import types

    if "torchvision" in sys.modules:
        return
    import numpy as np
    import torch

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    utils = types.ModuleType("torchvision.utils")

    class ToTensor:
        def __call__(self, pic):
            arr = np.array(pic, np.uint8, copy=True)
            arr = arr[None] if arr.ndim == 2 else arr.transpose(2, 0, 1)
            return torch.from_numpy(arr).float().div(255.0)

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    class Resize:
        def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                     antialias=None):
            self.size = tuple(size) if isinstance(size, (tuple, list)) else (size, size)
            self.mode = str(interpolation)

        def __call__(self, x):
            import torch.nn.functional as F

            unsq = x.ndim == 3
            if unsq:
                x = x[None]
            mode = self.mode if self.mode in ("nearest", "bilinear", "bicubic") else "bilinear"
            out = F.interpolate(
                x, size=self.size, mode=mode,
                align_corners=False if mode != "nearest" else None,
            )
            return out[0] if unsq else out

    def make_grid(t, *a, **k):
        return t if torch.is_tensor(t) else torch.stack(list(t))

    transforms.ToTensor = ToTensor
    transforms.Resize = Resize
    transforms.InterpolationMode = InterpolationMode
    utils.make_grid = make_grid
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils


def make_config(ref_config, **overrides):
    cfg = ref_config.parser.parse_args([])
    # the reference dispatcher's post-parse mutations (train.py:23-26)
    cfg.normalize = True
    cfg.channels = 1
    cfg.out_channels = 1
    cfg.device = "cpu"
    cfg.verbose = False
    cfg.num_workers = 0  # single-CPU host: worker processes only add overhead
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def evaluate(exp_dir: str, root: str, shared: bool) -> dict:
    """Mirror of the reference eval harnesses with configurable data paths
    (their __main__ bodies hardcode cluster paths): run_tests.py:60-162 for
    plain models, testing_shared_weights.py:54-144 for TEDM."""
    import torch
    from torch import nn
    from torch.utils.data import DataLoader
    from einops import rearrange
    from einops.layers.torch import Rearrange

    from models.unet_model import Unet
    from models.datasetDM_model import DatasetDM
    from trainers.train_baseline import dice, precision, recall
    from dataloaders.JSRT import build_dataloaders
    from dataloaders.NIH import NIHDataset
    from dataloaders.Montgomery import MonDataset

    data = torch.load(os.path.join(exp_dir, "best_model.pt"), weights_only=False)
    config = data["config"]

    if shared:
        model = DatasetDM(config)
        model.classifier = nn.Sequential(
            Rearrange("b (step act) h w -> (b step) act h w", step=len(model.steps)),
            nn.Conv2d(960, 128, 1), nn.ReLU(), nn.BatchNorm2d(128),
            nn.Conv2d(128, 32, 1), nn.ReLU(), nn.BatchNorm2d(32),
            nn.Conv2d(32, 1, config.out_channels),
        )
    elif config.experiment in ("baseline", "global_finetune", "glob_loc_finetune"):
        model = Unet(**vars(config))
    elif config.experiment == "datasetDM":
        model = DatasetDM(config)
    else:
        raise ValueError(config.experiment)
    model.load_state_dict(data["model_state_dict"])
    model.eval().to(config.device)

    dls = build_dataloaders(config.data_dir, config.img_size, config.batch_size, 0)
    sets = {
        "JSRT_val": dls["val"],
        "JSRT_test": dls["test"],
        "NIH": DataLoader(
            NIHDataset(os.path.join(root, "NIH"), os.path.join(root, "data"),
                       "correspondence_with_chestXray8.csv", config.img_size),
            config.batch_size),
        "Montgomery": DataLoader(
            MonDataset(os.path.join(root, "Montgomery"), os.path.join(root, "data"),
                       "patient_data.csv", config.img_size),
            config.batch_size),
    }

    results = {}
    for key, dl in sets.items():
        y_hat, y_star = [], []
        with torch.no_grad():
            for x, y in dl:
                y_hat.append(torch.sigmoid(model(x)).cpu())
                y_star.append(y)
        y_hat = torch.cat(y_hat, 0)
        y_star = torch.cat(y_star, 0)
        if shared:
            y_hats = rearrange(
                y_hat, "(b step) 1 h w -> step b 1 h w", step=len(model.steps)
            )
            per_t = {}
            for i, yh in enumerate(y_hats):
                d = dice(yh > 0.5, y_star)
                per_t[int(model.steps[i])] = {
                    "dice_mean": float(d.mean()), "dice_std": float(d.std()),
                }
                torch.save(
                    {"y_hat": yh, "y_star": y_star, "dice": d,
                     "precision": precision(yh > 0.5, y_star),
                     "recall": recall(yh > 0.5, y_star)},
                    os.path.join(exp_dir,
                                 f"{key}_timestep{model.steps[i]}_predictions.pt"),
                )
            y_hat = y_hats.mean(0)
        d = dice(y_hat > 0.5, y_star)
        p = precision(y_hat > 0.5, y_star)
        r = recall(y_hat > 0.5, y_star)
        out = {"y_hat": y_hat, "y_star": y_star, "dice": d, "precision": p,
               "recall": r}
        torch.save(out, os.path.join(exp_dir, f"{key}_predictions.pt"))
        results[key] = {
            "dice_mean": float(torch.nanmean(d)),
            "dice_std": float(d[~torch.isnan(d)].std()),
            "precision_mean": float(torch.nanmean(p)),
            "recall_mean": float(torch.nanmean(r)),
            "n": int(len(d)),
        }
        if shared:
            results[key]["per_timestep"] = per_t
        print(f"  {key}: dice {results[key]['dice_mean']:.4f} "
              f"+/- {results[key]['dice_std']:.4f}")
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/tedm_parity")
    ap.add_argument("--out", type=str, default="/tmp/tedm_parity/ref_logs")
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--backbone_steps", type=int, default=800)
    ap.add_argument("--head_steps", type=int, default=300)
    ap.add_argument("--sizes", nargs="+", type=int, default=[1, 3])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_backbone", action="store_true")
    ap.add_argument("--backbone_ckpt", type=str, default=None,
                    help="reuse this trained backbone best_model.pt "
                         "(default: <out>/CXR14/run/best_model.pt)")
    ap.add_argument("--skip_baseline", action="store_true")
    ap.add_argument("--skip_tedm", action="store_true")
    ap.add_argument("--ledm", action="store_true",
                    help="also run the reference LEDM arm (train_datasetDM "
                         "with separate per-timestep heads, t_steps_to_save "
                         "= [50,150,250] — reference train.py:38-40) at each "
                         "--sizes n, for the cross-framework protocol column "
                         "(VERDICT r4 #3)")
    ap.add_argument("--normalize_extract", action="store_true",
                    help="mechanism flip (RESULTS_parity.md): normalize x to "
                         "[-1,1] before the reference's feature extraction. "
                         "The reference's DatasetDM.extract_features calls "
                         "forward_diffusion_model directly "
                         "(models/datasetDM_model.py:77), bypassing the "
                         "normalize that DiffusionModel.forward applies to "
                         "every training input (diffusion_model.py:169) — "
                         "the frozen backbone sees [0,1] inputs it never "
                         "trained on. This flag is the ONLY change vs stock.")
    args = ap.parse_args(argv)

    sys.path.insert(0, REFERENCE)
    os.makedirs(args.out, exist_ok=True)
    install_torchvision_shim()

    import torch

    torch.manual_seed(args.seed)

    # torch>=2.6 defaults weights_only=True, which rejects the argparse
    # Namespace the reference pickles into every checkpoint
    # (train_base_diffusion.py:164-170). Restore the reference-era default.
    _orig_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _orig_load(*a, **k)

    torch.load = _load

    import config as ref_config
    import dataloaders.JSRT as refJSRT
    import dataloaders.CXR14 as refCXR14
    import trainers.train_CXR14 as tc
    import trainers.train_baseline as tb
    import trainers.train_datasetDM as td

    # Patch 1: CSVs come from the export root
    refJSRT.PROJECT_DIR = Path(args.root)
    refCXR14.PROJECT_DIR = Path(args.root)
    # Patch 2: sampling-only visualization (crashes as shipped; see docstring)
    tc.sample_plot_image = lambda *a, **k: torch.zeros(1, 1, 8, 8)
    # Patch 3: log_dir str/Path mixing
    tc.Path = StrPath

    if args.normalize_extract:
        # The mechanism flip: everything identical to the stock run except
        # x_0 is normalized to [-1,1] before q_sample in extract_features,
        # matching what the frozen backbone saw in training. Applied to the
        # CLASS, so head training (td.main -> DatasetDM.forward) and eval
        # (evaluate() below) both use it.
        import models.datasetDM_model as ref_dm

        _orig_extract = ref_dm.DatasetDM.extract_features

        def _normalized_extract(self, x_0, noise=None):
            return _orig_extract(self, x_0 * 2.0 - 1.0, noise=noise)

        ref_dm.DatasetDM.extract_features = _normalized_extract
        print("[normalize_extract] extract_features now normalizes x_0 to [-1,1]")

    mechanism = {"normalize_extract": bool(args.normalize_extract)}
    summary = {"img_size": args.img_size, "backbone_steps": args.backbone_steps,
               "head_steps": args.head_steps, "framework": "torch-reference",
               "normalize_extract": bool(args.normalize_extract),
               "experiments": {}}
    # partial reruns (--skip_baseline/--skip_tedm) must not clobber the
    # other arm's results: merge the existing summary's experiments (each
    # entry carries its own "mechanism" stamp, so mixed-flag merges stay
    # correctly labeled)
    prev = os.path.join(args.out, "summary.json")
    if os.path.exists(prev):
        with open(prev) as f:
            summary["experiments"] = json.load(f).get("experiments", {})
    backbone_ckpt = args.backbone_ckpt or os.path.join(
        args.out, "CXR14", "run", "best_model.pt")
    if args.backbone_ckpt and not os.path.exists(args.backbone_ckpt):
        # fail fast: heads would point at the missing path while a fresh
        # backbone trains into the DEFAULT location — a multi-hour run
        # that crashes at the first head load
        raise SystemExit(
            f"--backbone_ckpt {args.backbone_ckpt} does not exist")

    if not args.skip_backbone and not os.path.exists(backbone_ckpt):
        print("=== reference backbone (train_CXR14) ===")
        cfg = make_config(
            ref_config,
            experiment="img_only", dataset="CXR14",
            data_dir=os.path.join(args.root, "CXR14"),
            img_size=args.img_size, batch_size=args.batch_size,
            max_steps=args.backbone_steps,
            log_freq=100, val_freq=max(args.backbone_steps // 2, 1),
            max_val_steps=4, n_sampled_imgs=1, seed=args.seed,
            log_dir=StrPath(os.path.join(args.out, "run")),
        )
        tc.main(cfg)

    for n in args.sizes if not args.skip_baseline else []:
        print(f"=== reference baseline n={n} ===")
        logdir = StrPath(os.path.join(args.out, "baseline", str(n)))
        cfg = make_config(
            ref_config,
            experiment="baseline", dataset="JSRT",
            data_dir=os.path.join(args.root, "JSRT"),
            img_size=args.img_size, batch_size=args.batch_size,
            n_labelled_images=n, max_steps=args.head_steps,
            log_freq=50, val_freq=min(50, args.head_steps), max_val_steps=-1,
            seed=args.seed,
            log_dir=logdir, early_stop=False,
        )
        tb.main(cfg)
        print(f"=== reference baseline n={n} eval ===")
        summary["experiments"][f"baseline/{n}"] = dict(
            evaluate(str(logdir), args.root, shared=False),
            mechanism=mechanism,
        )
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    for n in args.sizes if not args.skip_tedm else []:
        print(f"=== reference TEDM n={n} ===")
        logdir = StrPath(os.path.join(args.out, "TEDM", str(n)))
        cfg = make_config(
            ref_config,
            # the reference gates shared-weights label repetition on
            # experiment == 'datasetDM' (train_baseline.py:30-31); its own
            # internal chain uses this name, so we do too
            experiment="datasetDM", dataset="JSRT",
            data_dir=os.path.join(args.root, "JSRT"),
            img_size=args.img_size, batch_size=args.batch_size,
            n_labelled_images=n, max_steps=args.head_steps,
            log_freq=50, val_freq=min(50, args.head_steps), max_val_steps=-1,
            seed=args.seed,
            log_dir=logdir, early_stop=False,
            shared_weights_over_timesteps=True,
            t_steps_to_save=[1, 10, 25, 50, 200, 400, 600, 800],
            saved_diffusion_model=backbone_ckpt,
        )
        td.main(cfg)
        print(f"=== reference TEDM n={n} eval ===")
        summary["experiments"][f"TEDM/{n}"] = dict(
            evaluate(str(logdir), args.root, shared=True),
            mechanism=mechanism,
        )
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    for n in args.sizes if args.ledm else []:
        print(f"=== reference LEDM n={n} ===")
        logdir = StrPath(os.path.join(args.out, "LEDM", str(n)))
        cfg = make_config(
            ref_config,
            # 'datasetDM' (the reference's internal chain name) rather than
            # 'LEDM' so evaluate() can rebuild the model; with
            # shared_weights_over_timesteps=False the label-repeat gate
            # (train_baseline.py:30-31) is off either way, so the only
            # LEDM-specific knob is t_steps_to_save (reference train.py:39)
            experiment="datasetDM", dataset="JSRT",
            data_dir=os.path.join(args.root, "JSRT"),
            img_size=args.img_size, batch_size=args.batch_size,
            n_labelled_images=n, max_steps=args.head_steps,
            log_freq=50, val_freq=min(50, args.head_steps), max_val_steps=-1,
            seed=args.seed,
            log_dir=logdir, early_stop=False,
            shared_weights_over_timesteps=False,
            t_steps_to_save=[50, 150, 250],
            saved_diffusion_model=backbone_ckpt,
        )
        td.main(cfg)
        print(f"=== reference LEDM n={n} eval ===")
        summary["experiments"][f"LEDM/{n}"] = dict(
            evaluate(str(logdir), args.root, shared=False),
            mechanism=mechanism,
        )
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    print(json.dumps(summary, indent=2))
    print(f"wrote {os.path.join(args.out, 'summary.json')}")


if __name__ == "__main__":
    main()
