"""Interactive segmentation demo (reference: app.py).

Serves every model family (Baseline, Global CL, Global & Local CL, LEDM,
LEDMe, TEDM) x training sizes from ``logs/<folder>/<size>/best``
checkpoints: load a CXR, predict lung masks, optionally post-process
(keep the two largest connected components + draw boundaries,
app.py:97-110), tile results into one labeled grid (app.py:114-148).

Differences by design:
* Models are cached after first load (the reference re-reads the
  checkpoint on every request, app.py:46-79 — 10-35 s/model on CPU;
  cached TPU predictions are milliseconds).
* Connected components via scipy.ndimage (no skimage/cv2 dependency);
  labels drawn with PIL.
* The gradio UI is optional: ``python -m tedm_tpu.serve.app`` launches it
  when gradio is installed; the ``predict``/``Predictor`` API works
  headless either way.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

IMG_SIZE = 128

MODEL_FOLDERS = {
    "Baseline": "baseline",
    "Global CL": "global_finetune",
    "Global & Local CL": "glob_loc_finetune",
    "LEDM": "LEDM",
    "LEDMe": "LEDMe",
    "TEDM": "TEDM",
}
MODEL_ORDER = list(MODEL_FOLDERS)


def load_img(img_file, img_size: int = IMG_SIZE) -> np.ndarray:
    """numpy / PIL / path -> (1, H, W, 1) float32 in [0, 1]
    (reference: app.py:20-43)."""
    from PIL import Image

    if isinstance(img_file, np.ndarray):
        img = img_file.astype(np.float32)
        if img.max() > 1:
            img = img / 255.0
        if img.ndim == 3:
            img = img.mean(axis=-1)
        img = np.asarray(
            Image.fromarray((img * 255).astype(np.uint8)).resize((img_size, img_size)),
            np.float32,
        ) / 255.0
    elif isinstance(img_file, str):
        img = np.asarray(
            Image.open(img_file).convert("L").resize((img_size, img_size)), np.float32
        ) / 255.0
    else:
        try:
            img = np.asarray(
                img_file.convert("L").resize((img_size, img_size)), np.float32
            ) / 255.0
        except AttributeError:
            raise TypeError("Input must be a numpy array, PIL image, or filepath")
    return img[None, :, :, None]


class Predictor:
    """Checkpoint-cached predictor over the eval-harness tasks."""

    def __init__(self, logs_root: str = "logs"):
        self.logs_root = logs_root
        self._cache: Dict[str, tuple] = {}

    def _load(self, ckpt_dir: str):
        if ckpt_dir not in self._cache:
            import jax

            from tedm_tpu.eval.harness import load_experiment

            config, state, task = load_experiment(ckpt_dir)

            @jax.jit
            def fwd(params, bs, x):
                logits, _ = task.apply(params, bs, x, jax.random.PRNGKey(0), False)
                return jax.nn.sigmoid(logits.astype(np.float32))

            self._cache[ckpt_dir] = (config, state, task, fwd)
        return self._cache[ckpt_dir]

    def predict(self, img: np.ndarray, model: str, training_size: int) -> np.ndarray:
        """Binary (H, W) mask for one model family/size
        (reference predict_* fns, app.py:45-79)."""
        ckpt_dir = os.path.join(
            self.logs_root, MODEL_FOLDERS[model], str(training_size)
        )
        # accept either the run dir itself or a timestamped subdir
        if not os.path.isdir(os.path.join(ckpt_dir, "best")):
            subs = sorted(os.listdir(ckpt_dir), reverse=True) if os.path.isdir(ckpt_dir) else []
            for s in subs:
                if os.path.isdir(os.path.join(ckpt_dir, s, "best")):
                    ckpt_dir = os.path.join(ckpt_dir, s)
                    break
        config, state, task, fwd = self._load(ckpt_dir)
        if img.shape[1] != config.img_size:
            # serve any input size against any checkpoint resolution
            img = load_img(img[0, :, :, 0], config.img_size)
        probs = np.asarray(fwd(state["params"], state["batch_stats"], img))
        if task.fold > 1:  # TEDM: ensemble sigmoids over timesteps (app.py:79)
            probs = probs.reshape(task.fold, -1, *probs.shape[1:]).mean(axis=0)
        return (probs[0, :, :, 0] > 0.5).astype(np.float32)


def postprocess(pred: np.ndarray, img: np.ndarray) -> np.ndarray:
    """Keep the two largest connected components and mark their outer
    boundaries in red on the image (reference: app.py:97-110)."""
    from scipy import ndimage

    labels, n = ndimage.label(pred)
    if n >= 2:
        sizes = ndimage.sum_labels(np.ones_like(labels), labels, range(1, n + 1))
        keep = np.argsort(sizes)[-2:] + 1
        mask = np.isin(labels, keep)
    else:
        mask = labels > 0
    rgb = np.stack([img, img, img], axis=-1)
    if mask.any():
        outer = ndimage.binary_dilation(mask) & ~mask
        rgb[outer] = (1.0, 0.0, 0.0)
    return rgb


def _put_text(img: np.ndarray, text: str, color) -> np.ndarray:
    """Label a tile bottom-left with PIL (cv2.putText stand-in)."""
    from PIL import Image, ImageDraw

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    pil = Image.fromarray(arr if arr.ndim == 3 else np.stack([arr] * 3, -1))
    ImageDraw.Draw(pil).text(
        (5, img.shape[0] - 12), text, fill=tuple(int(c * 255) for c in color)
    )
    return np.asarray(pil, np.float32) / 255.0


def predict(
    img_file,
    models: Sequence[str],
    training_sizes: Sequence[int],
    seg_img: bool = False,
    predictor: Optional[Predictor] = None,
    progress=None,
) -> np.ndarray:
    """Grid composer (reference: app.py:114-148): rows = models in
    canonical order, columns = sorted training sizes."""
    predictor = predictor or Predictor()
    img = load_img(img_file)
    models = sorted(models, key=MODEL_ORDER.index)
    rows = []
    for model in models:
        tiles = []
        for size in sorted(training_sizes):
            out = predictor.predict(img, model, size)
            color = (0.5, 0.5, 0.5)
            if seg_img:
                base = img[0, :, :, 0]
                if base.shape != out.shape:
                    base = load_img(base, out.shape[0])[0, :, :, 0]
                out = postprocess(out, base)
                color = (1.0, 1.0, 1.0)
            tiles.append(_put_text(out, f"{model} {size}", color))
        rows.append(np.concatenate(tiles, axis=1))
    grid = np.concatenate(rows, axis=0)
    if grid.shape[1] <= IMG_SIZE * 2:
        pad = (330 - grid.shape[1]) // 2
        widths = ((0, 0), (pad, pad)) + (((0, 0),) if grid.ndim == 3 else ())
        grid = np.pad(grid, widths, constant_values=1)
    return grid


ABSTRACT = (
    "Medical image segmentation is a challenging task, made more difficult by "
    "many datasets' limited size and annotations. This demo serves the TEDM "
    "family of semi-supervised diffusion-feature segmentation models "
    "(baseline / contrastive / LEDM / LEDMe / TEDM) across training sizes."
)


def write_example_images(out_dir: str, n: int = 12, img_size: int = IMG_SIZE):
    """Synthetic example CXR PNGs for the demo (the reference ships 12
    NIH examples, app.py:168-181; those images are licensed, so the demo
    generates stand-ins)."""
    import os

    from PIL import Image

    from tedm_tpu.data.datasets import SyntheticCXRDataset

    os.makedirs(out_dir, exist_ok=True)
    ds = SyntheticCXRDataset("demo", n, img_size, labelled=False)
    paths = []
    for i in range(n):
        arr = (ds[i][:, :, 0] * 255).astype(np.uint8)
        p = os.path.join(out_dir, f"example_{i:02d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def launch(logs_root: str = "logs", share: bool = False):
    """Gradio UI (reference: app.py:155-191). Requires gradio."""
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; use "
            "tedm_tpu.serve.app.predict(...) for headless serving"
        ) from e
    import tempfile

    examples = write_example_images(
        os.path.join(tempfile.gettempdir(), "tedm_tpu_examples")
    )
    predictor = Predictor(logs_root)

    def fn(img, models, sizes, seg):
        return predict(img, models, [int(s) for s in sizes], seg, predictor)

    demo = gr.Interface(
        fn=fn,
        inputs=[
            gr.Image(label="Chest X-ray", type="pil"),
            gr.CheckboxGroup(MODEL_ORDER, label="Model",
                             value=["Baseline", "LEDM", "LEDMe", "TEDM"]),
            gr.CheckboxGroup([1, 3, 6, 12, 197], label="Training size",
                             value=[1, 3, 6, 12, 197]),
            gr.Checkbox(label="Show masked image (otherwise show binary "
                              "segmentation)", value=True),
        ],
        outputs=gr.Image(label="Segmentation"),
        examples=[[p] for p in examples],
        title="Chest X-ray Segmentation with TEDM (TPU)",
        description=ABSTRACT,
        cache_examples=False,
    )
    demo.queue().launch(share=share)


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--logs", type=str, default="logs")
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    launch(args.logs, args.share)


if __name__ == "__main__":
    main()
