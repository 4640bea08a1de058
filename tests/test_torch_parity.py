"""Numerical parity vs the actual reference PyTorch UNet (SURVEY §7 step 2):
port randomly-initialized reference weights through
utils/torch_port.convert_unet_state_dict and assert our NHWC forward
matches the torch NCHW forward within fp32 tolerance. This exercises every
module mapping (convs, FiLM time MLPs, GroupNorm, both attentions,
down/upsample, skip concat order, final residual)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_unet_cls():
    # the reference tree imports torchvision transitively; stub it
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
    from models.unet_model import Unet as TorchUnet

    return TorchUnet


@pytest.mark.parametrize("with_time", [True, False])
def test_forward_parity_small(reference_unet_cls, with_time):
    import jax
    import jax.numpy as jnp

    from tedm_tpu.models.unet import Unet
    from tedm_tpu.utils.torch_port import convert_unet_state_dict

    dim, mults, size = 16, (1, 2), 32
    torch.manual_seed(0)
    tmodel = reference_unet_cls(dim, dim_mults=list(mults), channels=1).eval()
    params = convert_unet_state_dict(tmodel.state_dict(), n_stages=len(mults))

    x = np.random.RandomState(0).randn(2, size, size, 1).astype(np.float32)
    t = np.array([3, 777], np.int64)

    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tt = torch.from_numpy(t) if with_time else None
        ref = tmodel(tx, tt).numpy().transpose(0, 2, 3, 1)

    jmodel = Unet(dim=dim, dim_mults=mults, channels=1)
    jt = jnp.asarray(t, jnp.int32) if with_time else None
    out = jmodel.apply({"params": params}, jnp.asarray(x), jt)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_feature_extraction_parity(reference_unet_cls):
    """Decoder features equal the reference's hooked attention outputs."""
    import jax.numpy as jnp

    from tedm_tpu.models.unet import Unet
    from tedm_tpu.utils.torch_port import convert_unet_state_dict

    dim, mults, size = 16, (1, 2), 32
    torch.manual_seed(1)
    tmodel = reference_unet_cls(dim, dim_mults=list(mults), channels=1).eval()
    params = convert_unet_state_dict(tmodel.state_dict(), n_stages=len(mults))

    feats_torch = {}
    for i, (b1, b2, attn, up) in enumerate(tmodel.ups):
        attn.register_forward_hook(
            lambda mod, inp, out, i=i: feats_torch.__setitem__(i, out.detach())
        )
    x = np.random.RandomState(1).randn(1, size, size, 1).astype(np.float32)
    t = np.array([50], np.int64)
    with torch.no_grad():
        tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))

    jmodel = Unet(dim=dim, dim_mults=mults, channels=1)
    _, feats = jmodel.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        extract_features=True,
    )
    assert len(feats) == len(feats_torch)
    for i, f in enumerate(feats):
        ref = feats_torch[i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(f), ref, atol=2e-4, rtol=1e-3)
