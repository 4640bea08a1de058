"""Quick-tier trainer smoke (VERDICT r3 #6): one debug-mode run of the
three core experiment families (img_only backbone -> TEDM head, plus
baseline) at 16^2 synthetic, so `pytest -m quick` catches dispatcher /
trainer wiring regressions without waiting ~30 min for the full suite.

Also regression-tests the ADVICE r3 restore-template fix: a backbone
trained with --weight_decay (adamw's chain state differs structurally
from adam's) must restore through BOTH downstream loaders
(datasetdm.load_backbone via the TEDM trainer, and
eval.harness.load_diffusion_experiment).
"""

import os

from tedm_tpu.train import main as train_main

# timesteps must exceed the TEDM preset's largest extraction step (800):
# the backbone's EMBEDDED timesteps drive the head's schedule, and a
# 10-entry table would silently clamp 7 of the 8 extraction timesteps to
# t=9 — the smoke would then never exercise multi-noise-level extraction
ARGS = [
    "--synthetic_data", "--dim", "8", "--dim_mults", "1", "2",
    "--img_size", "16", "--batch_size", "4", "--timesteps", "801",
    "--num_workers", "1", "--val_steps", "5", "--max_val_steps", "1",
    "--n_sampled_imgs", "2",
]


def test_trainer_smoke_chain(tmp_path):
    # img_only backbone: 2 real steps incl. one validation + best ckpt,
    # trained with weight_decay so the ckpt carries adamw chain state
    train_main([
        "--experiment", "img_only", "--log_dir", str(tmp_path / "bb"),
        "--max_steps", "2", "--val_freq", "2", "--log_freq", "2",
        "--weight_decay", "0.01", "--ddim_steps", "25",
    ] + ARGS)
    best = os.path.join(str(tmp_path / "CXR14" / "bb"), "best")
    assert os.path.isdir(os.path.join(best, "state"))

    # load_diffusion_experiment must build an adamw template for this ckpt
    from tedm_tpu.eval.harness import load_diffusion_experiment

    cfg, params, unet, sched = load_diffusion_experiment(
        str(tmp_path / "CXR14" / "bb")
    )
    assert cfg.weight_decay == 0.01 and params is not None

    # TEDM consumes the same ckpt through datasetdm.load_backbone
    train_main([
        "--experiment", "TEDM", "--debug", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "tedm"),
        "--saved_diffusion_model", best,
    ] + ARGS)

    # supervised baseline, one debug step
    train_main([
        "--experiment", "baseline", "--debug", "--n_labelled_images", "3",
        "--log_dir", str(tmp_path / "base"),
    ] + ARGS)
