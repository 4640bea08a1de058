"""TRUE multi-process multihost training (VERDICT r1 weak #7 / next #6).

Spawns 2 OS processes x 4 virtual CPU devices each, joined into one
8-device mesh via ``jax.distributed.initialize`` (localhost coordinator,
Gloo CPU collectives), and runs the REAL baseline trainer through
``train_main --multihost`` in both. This exercises the per-host sharded
loader (each process loads only its shard), the lockstep batch contract,
and ``make_array_from_process_local_data`` global-batch assembly
(parallel/mesh.py) — none of which a single-process mesh can reach.

Correctness bar: the 2-host loss trajectory must equal the single-process
8-device trajectory on the same seed. The global batch rows arrive in a
different order (host-strided shards) but the loss is a masked mean, so
only reduction-order float noise may differ.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

PORT = 12731

WORKER = """
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); logdir = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
if nproc > 1:
    os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:%d"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)
else:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from tedm_tpu.train import main
args = ["--experiment", "baseline", "--synthetic_data",
        "--n_labelled_images", "24", "--dim", "8", "--dim_mults", "1", "2",
        "--img_size", "16", "--timesteps", "8", "--num_workers", "1",
        "--max_steps", "6", "--val_freq", "1000", "--log_freq", "2",
        "--seed", "3", "--log_dir", logdir,
        "--batch_size", "8" if nproc == 1 else "4"]
if nproc > 1:
    args.append("--multihost")
main(args)
print("WORKER DONE", pid)
""" % PORT


def _losses(logdir):
    path = os.path.join(logdir, "baseline", "24", "run", "metrics.jsonl")
    with open(path) as f:
        return [
            (json.loads(l)["step"], json.loads(l)["train/loss"])
            for l in f
            if "train/loss" in l
        ]


def _run(pid, nproc, logdir):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), str(nproc), logdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo",
    )


def test_two_process_matches_single_process(tmp_path):
    # single process, 8 virtual devices, global batch 8
    p = _run(0, 1, str(tmp_path / "single" / "run"))
    out, _ = p.communicate(timeout=420)
    assert p.returncode == 0, out
    single = _losses(str(tmp_path / "single"))
    assert len(single) == 3

    # two processes x 4 devices, per-host batch 4 => same global batch 8
    pa = _run(0, 2, str(tmp_path / "mh0" / "run"))
    pb = _run(1, 2, str(tmp_path / "mh1" / "run"))
    out_a, _ = pa.communicate(timeout=420)
    out_b, _ = pb.communicate(timeout=420)
    assert pa.returncode == 0, out_a
    assert pb.returncode == 0, out_b
    assert "multihost: process" in out_a
    multi = _losses(str(tmp_path / "mh0"))

    steps_s, loss_s = zip(*single)
    steps_m, loss_m = zip(*multi)
    assert steps_s == steps_m
    np.testing.assert_allclose(loss_m, loss_s, rtol=2e-4, atol=1e-6)

    # both hosts observed the same (replicated) global loss
    multi_b = _losses(str(tmp_path / "mh1"))
    np.testing.assert_allclose(
        [l for _, l in multi_b], loss_m, rtol=1e-6, atol=0
    )
