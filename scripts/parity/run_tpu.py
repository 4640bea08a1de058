"""Run the tedm_tpu chain on the exported parity corpus (same pixels the
torch reference trains on — see export_data.py / run_reference.py) and
record Dice for the head-to-head.

Chain: img_only backbone -> heads in --experiments at n in --sizes ->
run_tests / testing_shared_weights eval over JSRT_val/JSRT_test/NIH/
Montgomery. Everything goes through the stock CLI (tedm_tpu.train) and
eval harnesses; the only parity-specific wiring is --data_dir/--splits_dir
pointing at the export.

--experiments covers the paper's full protocol (VERDICT r4 #3; reference
print_tests_shared_weights.py:16,42,89): baseline, LEDM, LEDMe, TEDM, and
Step_<t> (the PDDM per-timestep probe at single timestep t, the
reference's Step_N dirs — datasetDM_per_step.py via --experiment PDDM
--t_steps_to_save t).

    python scripts/parity/run_tpu.py --root /tmp/tedm_parity \
        --out /tmp/tedm_parity/tpu_logs --img_size 64 \
        --backbone_steps 800 --head_steps 300 --sizes 1 3 6 12 \
        --experiments baseline LEDM LEDMe TEDM Step_1 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def summarize(outputs: dict) -> dict:
    import numpy as np

    res = {}
    for key, out in outputs.items():
        d = np.asarray(out["dice"]).squeeze()
        p = np.asarray(out["precision"]).squeeze()
        r = np.asarray(out["recall"]).squeeze()
        res[key] = {
            "dice_mean": float(np.nanmean(d)),
            "dice_std": float(np.nanstd(d[~np.isnan(d)])),
            "precision_mean": float(np.nanmean(p)),
            "recall_mean": float(np.nanmean(r)),
            "n": int(d.shape[0]),
        }
    return res


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="/tmp/tedm_parity")
    ap.add_argument("--out", type=str, default="/tmp/tedm_parity/tpu_logs")
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--backbone_steps", type=int, default=800)
    ap.add_argument("--head_steps", type=int, default=300)
    ap.add_argument("--sizes", nargs="+", type=int, default=[1, 3])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu) before first use")
    ap.add_argument("--skip_backbone", action="store_true")
    ap.add_argument("--skip_baseline", action="store_true")
    ap.add_argument("--skip_tedm", action="store_true")
    ap.add_argument("--experiments", nargs="+", default=["baseline", "TEDM"],
                    help="protocol arms: baseline LEDM LEDMe TEDM Step_<t> "
                         "(Step_1 = PDDM probe at timestep 1); "
                         "--skip_baseline/--skip_tedm still filter for "
                         "backwards compatibility")
    ap.add_argument("--backbone_dir", type=str, default=None,
                    help="use this backbone checkpoint dir "
                         "(e.g. the torch-ported one from port_backbone.py)")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="train the backbone with --ema_decay (EMA quality "
                         "evidence, VERDICT r3 #5); downstream TEDM heads "
                         "then consume the averaged weights automatically")
    ap.add_argument("--serve_raw_params", action="store_true",
                    help="TEDM heads read the RAW weights from an --ema_decay "
                         "backbone checkpoint instead of the EMA weights "
                         "(same-checkpoint EMA-vs-raw A/B)")
    ap.add_argument("--extract_unnormalized", action="store_true",
                    help="mechanism flip (RESULTS_parity.md): train/eval the "
                         "TEDM head with the reference's unnormalized feature "
                         "extraction (--extract_unnormalized in the CLI)")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra CLI args appended to every train invocation "
                         "(e.g. --extra --dim 16 for a fast driver-logic "
                         "smoke that skips the ~25-min full-UNet CPU compile)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tedm_tpu.train import main as train_main
    from tedm_tpu.eval.run_tests import evaluate_experiment
    from tedm_tpu.eval.testing_shared_weights import evaluate_shared_weights

    os.makedirs(args.out, exist_ok=True)
    common = [
        "--data_dir", "", "--splits_dir", os.path.join(args.root, "data"),
        "--img_size", str(args.img_size), "--batch_size", str(args.batch_size),
        "--seed", str(args.seed), "--num_workers", "2",
    ] + list(args.extra)
    nih = os.path.join(args.root, "NIH")
    mon = os.path.join(args.root, "Montgomery")

    backbone = args.backbone_dir or os.path.join(args.out, "CXR14", "run")
    if not args.skip_backbone and not os.path.isdir(os.path.join(backbone, "best")):
        print("=== tedm_tpu backbone (img_only) ===")
        train_main([
            "--experiment", "img_only",
            "--log_dir", os.path.join(args.out, "run"),
            "--max_steps", str(args.backbone_steps),
            "--log_freq", "100",
            "--val_freq", str(max(args.backbone_steps // 2, 1)),
            "--max_val_steps", "4", "--n_sampled_imgs", "2",
            # the val-time sampled grid is visualization only (the torch
            # side's sample_plot_image is a patched no-op — it crashes as
            # shipped); DDIM keeps it from dominating the backbone run
            "--ddim_steps", "25",
        ] + (["--ema_decay", str(args.ema_decay)] if args.ema_decay else [])
          + [a if a else os.path.join(args.root, "CXR14") for a in common])

    mechanism = {"extract_unnormalized": bool(args.extract_unnormalized),
                 "ema_decay": args.ema_decay,
                 "serve_raw_params": bool(args.serve_raw_params)}
    summary = {"img_size": args.img_size, "backbone_steps": args.backbone_steps,
               "head_steps": args.head_steps, "framework": "tedm_tpu",
               "extract_unnormalized": bool(args.extract_unnormalized),
               "ema_decay": args.ema_decay,
               "serve_raw_params": bool(args.serve_raw_params),
               "experiments": {}}
    # partial reruns (e.g. baselines only) update the existing summary;
    # each experiment entry carries its own "mechanism" stamp so a merge
    # across invocations with different flags stays correctly labeled
    # (the top-level flags describe THIS invocation only)
    prev = os.path.join(args.out, "summary.json")
    if os.path.exists(prev):
        with open(prev) as f:
            summary["experiments"] = json.load(f).get("experiments", {})
    jsrt_common = [a if a else os.path.join(args.root, "JSRT") for a in common]

    backbone_arg = (backbone if os.path.isdir(os.path.join(backbone, "state"))
                    else os.path.join(backbone, "best"))
    mech_flags = (
        (["--extract_unnormalized"] if args.extract_unnormalized else [])
        + (["--serve_raw_params"] if args.serve_raw_params else []))

    exps = [e for e in args.experiments
            if not (e == "baseline" and args.skip_baseline)
            and not (e == "TEDM" and args.skip_tedm)]
    for exp in exps:
        # Step_<t>: the PDDM probe pinned to ONE timestep — the reference's
        # Step_N experiment dirs (datasetDM_per_step.py; the dispatcher
        # never calls it there, fixed here — train.py docstring).
        step_t = int(exp.split("_", 1)[1]) if exp.startswith("Step_") else None
        cli_exp = "PDDM" if step_t is not None else exp
        for n in args.sizes:
            print(f"=== tedm_tpu {exp} n={n} ===")
            tag = {"baseline": "b", "LEDM": "l", "LEDMe": "e", "TEDM": "t"}.get(
                cli_exp, f"s{step_t}n")
            cmd = [
                "--experiment", cli_exp, "--n_labelled_images", str(n),
                "--log_dir", os.path.join(args.out, f"{tag}{n}"),
                "--max_steps", str(args.head_steps),
                "--log_freq", "50",
                "--val_freq", str(min(50, args.head_steps)),
            ]
            if cli_exp != "baseline":
                cmd += ["--saved_diffusion_model", backbone_arg] + mech_flags
            if step_t is not None:
                cmd += ["--t_steps_to_save", str(step_t)]
            train_main(cmd + jsrt_common)
            exp_dir = os.path.join(args.out, cli_exp, str(n), f"{tag}{n}")
            if exp == "TEDM":
                results = evaluate_shared_weights(
                    exp_dir, nih_path=nih, mon_path=mon)
                summ = summarize(results)
                # per-timestep Dice from the npz artifacts (mirrors the
                # reference summary's per_timestep block)
                import glob as _glob

                import numpy as np
                for key in summ:
                    per_t = {}
                    for f in _glob.glob(os.path.join(
                            exp_dir, f"{key}_timestep*_predictions.npz")):
                        t_str = f.rsplit("timestep", 1)[1].split("_")[0]
                        d = np.asarray(np.load(f)["dice"]).squeeze()
                        per_t[t_str] = {
                            "dice_mean": float(np.nanmean(d)),
                            "dice_std": float(np.nanstd(d[~np.isnan(d)]))}
                    if per_t:
                        summ[key]["per_timestep"] = per_t
            else:
                outputs = evaluate_experiment(
                    exp_dir, nih_path=nih, mon_path=mon)
                summ = summarize(outputs)
            summary["experiments"][f"{exp}/{n}"] = dict(
                summ, mechanism=mechanism)
            with open(os.path.join(args.out, "summary.json"), "w") as f:
                json.dump(summary, f, indent=2)
            if step_t is not None:
                # reporting layout: tables.collect_metrics looks for
                # <logs_root>/Step_<t>/<n>/...; the PDDM CLI logs under
                # PDDM/<n>/s<t>n<n> (several Step_t runs share PDDM/<n>)
                link_dir = os.path.join(args.out, exp)
                os.makedirs(link_dir, exist_ok=True)
                link = os.path.join(link_dir, str(n))
                if not os.path.exists(link):
                    os.symlink(exp_dir, link)

    print(json.dumps(summary, indent=2))
    print(f"wrote {os.path.join(args.out, 'summary.json')}")


if __name__ == "__main__":
    main()
