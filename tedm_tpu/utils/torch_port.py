"""Port reference PyTorch checkpoints into this framework.

A migration path for users of the reference repo: convert the UNet weights
inside a reference ``best_model.pt`` (``model_state_dict`` of
models/unet_model.py's Unet, or of DiffusionModel which prefixes them with
``model.``) into this framework's Flax parameter pytree, and likewise the
datasetDM classifier heads. Conversions are pure numpy — torch is only
needed to unpickle ``.pt`` files.

Layout transforms:
  Conv2d  (out, in, kh, kw) -> (kh, kw, in, out)
  Linear  (out, in)         -> (in, out)
  GroupNorm weight/bias     -> scale/bias (unchanged, (C,))
  LayerNorm g (1, C, 1, 1)  -> (C,)

Also used by the numerical parity test (tests/test_torch_parity.py),
which ports a randomly-initialized reference model and asserts our
forward matches torch within fp32 tolerance — the strongest architecture
check we have (SURVEY §7 step 2).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _norm_g(g: np.ndarray) -> np.ndarray:
    return g.reshape(-1)


def _np(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _resnet_block(sd, prefix: str) -> Dict[str, Any]:
    p: Dict[str, Any] = {
        "block1": {
            "proj": {"kernel": _conv(sd[f"{prefix}.block1.proj.weight"]),
                     "bias": sd[f"{prefix}.block1.proj.bias"]},
            "norm": {"scale": sd[f"{prefix}.block1.norm.weight"],
                     "bias": sd[f"{prefix}.block1.norm.bias"]},
        },
        "block2": {
            "proj": {"kernel": _conv(sd[f"{prefix}.block2.proj.weight"]),
                     "bias": sd[f"{prefix}.block2.proj.bias"]},
            "norm": {"scale": sd[f"{prefix}.block2.norm.weight"],
                     "bias": sd[f"{prefix}.block2.norm.bias"]},
        },
    }
    if f"{prefix}.time_mlp.1.weight" in sd:  # Sequential(SiLU, Linear)
        p["time_proj"] = {"kernel": _dense(sd[f"{prefix}.time_mlp.1.weight"]),
                          "bias": sd[f"{prefix}.time_mlp.1.bias"]}
    if f"{prefix}.res_conv.weight" in sd:
        p["res_conv"] = {"kernel": _conv(sd[f"{prefix}.res_conv.weight"]),
                         "bias": sd[f"{prefix}.res_conv.bias"]}
    return p


def _linear_attn(sd, prefix: str) -> Dict[str, Any]:
    """Residual(PreNorm(LinearAttention)) -> PreNormAttn params.
    torch keys: {prefix}.fn.norm.g, {prefix}.fn.fn.to_qkv.weight,
    {prefix}.fn.fn.to_out.0.{weight,bias}, {prefix}.fn.fn.to_out.1.g."""
    return {
        "norm": {"g": _norm_g(sd[f"{prefix}.fn.norm.g"])},
        "attn": {
            "to_qkv": {"kernel": _conv(sd[f"{prefix}.fn.fn.to_qkv.weight"])},
            "to_out": {"kernel": _conv(sd[f"{prefix}.fn.fn.to_out.0.weight"]),
                       "bias": sd[f"{prefix}.fn.fn.to_out.0.bias"]},
            "out_norm": {"g": _norm_g(sd[f"{prefix}.fn.fn.to_out.1.g"])},
        },
    }


def _full_attn(sd, prefix: str) -> Dict[str, Any]:
    """Residual(PreNorm(Attention)) (mid): to_out is a plain conv."""
    return {
        "norm": {"g": _norm_g(sd[f"{prefix}.fn.norm.g"])},
        "attn": {
            "to_qkv": {"kernel": _conv(sd[f"{prefix}.fn.fn.to_qkv.weight"])},
            "to_out": {"kernel": _conv(sd[f"{prefix}.fn.fn.to_out.weight"]),
                       "bias": sd[f"{prefix}.fn.fn.to_out.bias"]},
        },
    }


def convert_unet_state_dict(
    state_dict: Dict[str, Any],
    n_stages: int = 4,
) -> Dict[str, Any]:
    """Reference Unet state_dict -> Flax params for tedm_tpu.models.unet.Unet.

    Accepts either bare Unet keys or DiffusionModel keys (prefixed
    ``model.``, reference models/diffusion_model.py:69-73)."""
    sd = _np(state_dict)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    params: Dict[str, Any] = {
        "init_conv": {"kernel": _conv(sd["init_conv.weight"]),
                      "bias": sd["init_conv.bias"]},
        "time_mlp": {
            "fc1": {"kernel": _dense(sd["time_mlp.1.weight"]),
                    "bias": sd["time_mlp.1.bias"]},
            "fc2": {"kernel": _dense(sd["time_mlp.3.weight"]),
                    "bias": sd["time_mlp.3.bias"]},
        },
        "mid_block1": _resnet_block(sd, "mid_block1"),
        "mid_attn": _full_attn(sd, "mid_attn"),
        "mid_block2": _resnet_block(sd, "mid_block2"),
        "final_res_block": _resnet_block(sd, "final_res_block"),
        "final_conv": {"kernel": _conv(sd["final_conv.weight"]),
                       "bias": sd["final_conv.bias"]},
    }
    for i in range(n_stages):
        is_last = i == n_stages - 1
        params[f"downs_{i}_0"] = _resnet_block(sd, f"downs.{i}.0")
        params[f"downs_{i}_1"] = _resnet_block(sd, f"downs.{i}.1")
        params[f"downs_{i}_2"] = _linear_attn(sd, f"downs.{i}.2")
        if is_last:  # plain conv (reference: unet_model.py:307-309)
            params[f"downs_{i}_3"] = {
                "kernel": _conv(sd[f"downs.{i}.3.weight"]),
                "bias": sd[f"downs.{i}.3.bias"],
            }
        else:  # strided Downsample conv
            params[f"downs_{i}_3"] = {"conv": {
                "kernel": _conv(sd[f"downs.{i}.3.weight"]),
                "bias": sd[f"downs.{i}.3.bias"],
            }}
        params[f"ups_{i}_0"] = _resnet_block(sd, f"ups.{i}.0")
        params[f"ups_{i}_1"] = _resnet_block(sd, f"ups.{i}.1")
        params[f"ups_{i}_2"] = _linear_attn(sd, f"ups.{i}.2")
        if is_last:  # plain conv
            params[f"ups_{i}_3"] = {
                "kernel": _conv(sd[f"ups.{i}.3.weight"]),
                "bias": sd[f"ups.{i}.3.bias"],
            }
        else:  # Sequential(nearest Upsample, Conv) -> key .1
            params[f"ups_{i}_3"] = {"conv": {
                "kernel": _conv(sd[f"ups.{i}.3.1.weight"]),
                "bias": sd[f"ups.{i}.3.1.bias"],
            }}
    return params


def convert_classifier_state_dict(
    state_dict: Dict[str, Any], shared_weights: bool = False
) -> Dict[str, Any]:
    """datasetDM classifier Sequential -> PixelClassifier params.

    Reference layout (models/datasetDM_model.py:57-64 and the
    shared-weights rebuild, trainers/train_datasetDM.py:30-42): conv
    indices shift by 1 when the Rearrange layer leads the Sequential.
    Layer-1 conv (C_in, 128, 1, 1) becomes the fused kernel (C_in, 128).
    """
    sd = _np(state_dict)
    if any(k.startswith("classifier.") for k in sd):
        sd = {k[len("classifier."):]: v for k, v in sd.items()
              if k.startswith("classifier.")}
    o = 1 if shared_weights else 0  # Rearrange occupies index 0
    w1 = sd[f"{o}.weight"]  # (128, C_in, 1, 1)
    return {
        "conv1_kernel": np.ascontiguousarray(w1[:, :, 0, 0].T),
        "conv1_bias": sd[f"{o}.bias"],
        "bn1": {"scale": sd[f"{o+2}.weight"], "bias": sd[f"{o+2}.bias"]},
        "conv2": {"kernel": _conv(sd[f"{o+3}.weight"]), "bias": sd[f"{o+3}.bias"]},
        "bn2": {"scale": sd[f"{o+5}.weight"], "bias": sd[f"{o+5}.bias"]},
        "conv3": {"kernel": _conv(sd[f"{o+6}.weight"]), "bias": sd[f"{o+6}.bias"]},
    }


def classifier_batch_stats(
    state_dict: Dict[str, Any], shared_weights: bool = False
) -> Dict[str, Any]:
    """BatchNorm running stats from the torch Sequential."""
    sd = _np(state_dict)
    if any(k.startswith("classifier.") for k in sd):
        sd = {k[len("classifier."):]: v for k, v in sd.items()
              if k.startswith("classifier.")}
    o = 1 if shared_weights else 0
    return {
        "bn1": {"mean": sd[f"{o+2}.running_mean"], "var": sd[f"{o+2}.running_var"]},
        "bn2": {"mean": sd[f"{o+5}.running_mean"], "var": sd[f"{o+5}.running_var"]},
    }


def infer_n_stages(state_dict: Dict[str, Any]) -> int:
    """Number of down/up stages from the state-dict keys."""
    stages = set()
    for k in state_dict:
        k = k[len("model."):] if k.startswith("model.") else k
        if k.startswith("downs."):
            stages.add(int(k.split(".")[1]))
    return max(stages) + 1 if stages else 4


def load_reference_checkpoint(path: str):
    """Load a reference ``best_model.pt`` and return
    (unet_params, raw_checkpoint_dict). Requires torch for unpickling."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    return convert_unet_state_dict(sd, n_stages=infer_n_stages(sd)), ckpt
