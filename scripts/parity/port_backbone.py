"""Port the TORCH-trained reference backbone into a tedm_tpu checkpoint.

The strongest feature-parity probe in the head-to-head (VERDICT r1 next
#1): take the reference's own trained ``best_model.pt`` DDPM, convert its
weights via utils/torch_port (layout-exact, pinned ≤2e-4 forward parity by
tests/test_torch_parity.py), save it as an Orbax checkpoint, and train
tedm_tpu's TEDM head on the PORTED features. If the Dice matches the
all-torch chain, the frozen-feature path (q_sample -> UNet decoder ->
interpolate+concat -> classifier) is equivalent end-to-end.

    python scripts/parity/port_backbone.py \
        --torch_ckpt /tmp/tedm_parity/ref_logs/CXR14/run/best_model.pt \
        --out /tmp/tedm_parity/tpu_logs/CXR14_ported/run/best
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


class StrPath(str):
    """Unpickle target: run_reference.py stores config.log_dir as a
    __main__.StrPath inside the torch checkpoint; this script runs as
    __main__ too, so redefining it here lets torch.load resolve it."""

    def __truediv__(self, other):
        return StrPath(os.path.join(str(self), str(other)))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--platform", type=str, default="cpu",
                    help="jax platform for the conversion (cpu is fine)")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    from tedm_tpu.config import Config
    from tedm_tpu.utils.checkpoint import save_checkpoint
    from tedm_tpu.utils.torch_port import load_reference_checkpoint

    params, ckpt = load_reference_checkpoint(args.torch_ckpt)
    ref_cfg = vars(ckpt["config"])
    config = Config(
        experiment="img_only",
        dim=int(ref_cfg.get("dim", 64)),
        dim_mults=tuple(ref_cfg.get("dim_mults", (1, 2, 4, 8))),
        channels=int(ref_cfg.get("channels", 1)),
        img_size=int(ref_cfg.get("img_size", 128)),
        timesteps=int(ref_cfg.get("timesteps", 1000)),
        beta_schedule=str(ref_cfg.get("beta_schedule", "cosine")),
        lr=float(ref_cfg.get("lr", 1e-4)),
        normalize=bool(ref_cfg.get("normalize", True)),
        log_dir=os.path.dirname(args.out),
    )
    state = {
        "params": params,
        "opt_state": optax.adam(config.lr).init(params),
        "step": int(ckpt.get("step", 0)),
    }
    save_checkpoint(args.out, state, config)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"ported {n:,} params from {args.torch_ckpt} (torch step "
          f"{ckpt.get('step', 0)}) -> {args.out}")


if __name__ == "__main__":
    main()
