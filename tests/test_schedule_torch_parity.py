"""Schedule-table parity against the actual reference torch implementation
(models/diffusion_model.py:16-47 schedules, :82-115 derived buffers).

Our tables are computed in fp64 then cast to fp32 (strictly more accurate
than the reference's fp32 chain), so agreement is asserted at fp32
round-off level rather than bit equality."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_model():
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
    from argparse import Namespace  # supports `in` (the reference's
                                    # config-with-defaults pattern needs it)

    from models.diffusion_model import DiffusionModel

    def build(schedule):
        cfg = Namespace(
            verbose=False, beta_schedule=schedule, timesteps=1000,
            img_size=16, dim=8, dim_mults=(1, 2), channels=1,
            objective="pred_noise", device="cpu",
            dynamic_threshold_percentile=0.995,
            p2_loss_weight_gamma=0.0, p2_loss_weight_k=1.0,
        )
        return DiffusionModel(cfg)

    return build


@pytest.mark.parametrize("schedule", ["cosine", "linear"])
def test_all_buffers_match_reference(reference_model, schedule):
    from tedm_tpu.ops.schedules import make_schedule

    ref = reference_model(schedule)
    ours = make_schedule(1000, schedule)
    # (the reference registers only the derived buffers, not betas /
    # alphas_cumprod themselves — diffusion_model.py:87-115; the derived
    # set pins the schedule completely)
    pairs = {
        "sqrt_alphas_cumprod": "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod": "sqrt_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod": "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod": "sqrt_recipm1_alphas_cumprod",
        "posterior_variance": "posterior_variance",
        "posterior_log_variance_clipped": "posterior_log_variance_clipped",
        "posterior_mean_coef1": "posterior_mean_coef1",
        "posterior_mean_coef2": "posterior_mean_coef2",
        "p2_loss_weight": "p2_loss_weight",
    }
    for ref_name, our_name in pairs.items():
        r = getattr(ref, ref_name).numpy()
        o = np.asarray(getattr(ours, our_name))
        assert o.shape == r.shape, ref_name
        np.testing.assert_allclose(
            o, r, atol=5e-4, rtol=5e-3,
            err_msg=f"{schedule}/{ref_name}",
        )
