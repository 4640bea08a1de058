"""End-to-end train-LOOP throughput: host pipeline vs device-side synthetic.

Round-1: loop measured 430-459 imgs/s (host-generation-bound) vs 1108
imgs/s device-side capability. This benches the REAL diffusion trainer
loop (trainers/diffusion.main) for a fixed step budget with
--data_backend threads vs device and reports imgs/s from metrics.jsonl.

    python scripts/bench_loop.py [--steps 120] [--backends threads device]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_one(backend: str, steps: int, batch: int) -> float:
    from tedm_tpu.train import main as train_main

    logdir = tempfile.mkdtemp(prefix=f"benchloop_{backend}_")
    train_main([
        "--experiment", "img_only", "--synthetic_data",
        "--data_backend", backend,
        "--log_dir", os.path.join(logdir, "run"),
        "--max_steps", str(steps), "--batch_size", str(batch),
        "--log_freq", "20", "--val_freq", str(10 * steps),
        "--num_workers", "4",
    ])
    metrics = os.path.join(logdir, "CXR14", "run", "metrics.jsonl")
    rates = []
    with open(metrics) as f:
        for line in f:
            rec = json.loads(line)
            if "train/imgs_per_sec" in rec and rec["step"] > 20:
                rates.append(rec["train/imgs_per_sec"])
    shutil.rmtree(logdir, ignore_errors=True)
    return max(rates) if rates else float("nan")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--backends", nargs="+", default=["threads", "device"])
    args = ap.parse_args(argv)
    for b in args.backends:
        r = run_one(b, args.steps, args.batch)
        print(f"backend={b}: {r:.1f} imgs/s (peak logged window)")


if __name__ == "__main__":
    main()
