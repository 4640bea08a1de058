"""End-to-end reference-checkpoint migration: torch.save a reference-style
``best_model.pt`` (DiffusionModel state_dict with the ``model.`` prefix,
trainers/train_base_diffusion.py:164-170) and load it through
``utils/torch_port.load_reference_checkpoint``; forwards must agree."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _reference_modules():
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvt = types.ModuleType("torchvision.transforms")
    tvu.make_grid = lambda *a, **k: None
    tvt.Resize = object
    tvt.InterpolationMode = object
    tv.utils, tv.transforms = tvu, tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    sys.modules.setdefault("torchvision.transforms", tvt)
    sys.path.insert(0, "/root/reference")
    from argparse import Namespace

    from models.diffusion_model import DiffusionModel

    return DiffusionModel, Namespace


def test_load_reference_best_model_pt(tmp_path):
    import jax.numpy as jnp

    from tedm_tpu.models.unet import Unet
    from tedm_tpu.utils.torch_port import load_reference_checkpoint

    DiffusionModel, Namespace = _reference_modules()
    cfg = Namespace(
        verbose=False, beta_schedule="cosine", timesteps=50, img_size=32,
        dim=16, dim_mults=(1, 2), channels=1, objective="pred_noise",
        device="cpu", dynamic_threshold_percentile=0.995,
        p2_loss_weight_gamma=0.0, p2_loss_weight_k=1.0,
    )
    torch.manual_seed(3)
    dm = DiffusionModel(cfg).eval()
    path = tmp_path / "best_model.pt"
    torch.save({"model_state_dict": dm.state_dict(), "config": vars(cfg),
                "step": 123}, path)

    params, ckpt = load_reference_checkpoint(str(path))
    assert ckpt["step"] == 123

    x = np.random.RandomState(2).randn(1, 32, 32, 1).astype(np.float32)
    t = np.array([7], np.int64)
    with torch.no_grad():
        ref = dm.model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    jm = Unet(dim=16, dim_mults=(1, 2), channels=1)
    out = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
