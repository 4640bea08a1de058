"""Classifier-head parity: the reference datasetDM Sequential (Conv1x1 MLP
with BatchNorm, models/datasetDM_model.py:57-64 / shared-weights variant
train_datasetDM.py:30-42) ported via utils/torch_port must match our fused
PixelClassifier on the same features (eval mode, running stats)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tedm_tpu.models.segmentation import PixelClassifier
from tedm_tpu.utils.torch_port import (
    classifier_batch_stats,
    convert_classifier_state_dict,
)

STAGES = (16, 8)  # tiny stand-in for (512, 256, 128, 64)


def _torch_head(c_in):
    return torch.nn.Sequential(
        torch.nn.Conv2d(c_in, 12, 1),
        torch.nn.ReLU(),
        torch.nn.BatchNorm2d(12),
        torch.nn.Conv2d(12, 5, 1),
        torch.nn.ReLU(),
        torch.nn.BatchNorm2d(5),
        torch.nn.Conv2d(5, 1, 1),
    )


@pytest.mark.parametrize("n_steps", [1, 2])
def test_head_parity(n_steps):
    torch.manual_seed(0)
    c_per_step = sum(STAGES)
    head = _torch_head(c_per_step * n_steps).eval()
    # make running stats non-trivial
    with torch.no_grad():
        head[2].running_mean.normal_(); head[2].running_var.uniform_(0.5, 2.0)
        head[5].running_mean.normal_(); head[5].running_var.uniform_(0.5, 2.0)

    params = convert_classifier_state_dict(head.state_dict())
    stats = classifier_batch_stats(head.state_dict())

    B, img = 2, 8
    rs = np.random.RandomState(0)
    # native-resolution stage features, (n_steps*B) folded step-major
    feats = [
        rs.randn(n_steps * B, img // 2, img // 2, STAGES[0]).astype(np.float32),
        rs.randn(n_steps * B, img, img, STAGES[1]).astype(np.float32),
    ]

    # reference dataflow: nearest-resize to img², concat step-major, conv MLP
    def up(f):  # nearest for integral factor
        r = img // f.shape[1]
        return np.repeat(np.repeat(f, r, axis=1), r, axis=2)

    blocks = []
    for s in range(n_steps):
        for f in feats:
            blocks.append(up(f.reshape(n_steps, B, *f.shape[1:])[s] if n_steps > 1 else f))
    concat = np.concatenate(blocks, axis=-1)  # (B, img, img, c_in)
    with torch.no_grad():
        ref = head(torch.from_numpy(concat.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    clf = PixelClassifier(
        stage_channels=STAGES, n_steps=n_steps, hidden=(12, 5),
        out_channels=1, img_size=img,
    )
    variables = {
        "params": {
            "conv1_kernel": jnp.asarray(params["conv1_kernel"]),
            "conv1_bias": jnp.asarray(params["conv1_bias"]),
            "bn1": {k: jnp.asarray(v) for k, v in params["bn1"].items()},
            "conv2": {k: jnp.asarray(v) for k, v in params["conv2"].items()},
            "bn2": {k: jnp.asarray(v) for k, v in params["bn2"].items()},
            "conv3": {k: jnp.asarray(v) for k, v in params["conv3"].items()},
        },
        "batch_stats": {
            "bn1": {"mean": jnp.asarray(stats["bn1"]["mean"]),
                    "var": jnp.asarray(stats["bn1"]["var"])},
            "bn2": {"mean": jnp.asarray(stats["bn2"]["mean"]),
                    "var": jnp.asarray(stats["bn2"]["var"])},
        },
    }
    out = clf.apply(variables, [jnp.asarray(f) for f in feats], train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
