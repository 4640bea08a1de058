"""Attribute the 256² sampling step's HBM bytes (VERDICT r3 #4).

ROOFLINE_256.json: 22.7 GB bytes-accessed per reverse step at 256² vs
3.63 GB at 128² — 6.3× for 4× the pixels, MFU 35%→24.7%. This script
traces the 256² sampling scan on-device and prints

  (a) time per HLO category (fusion / convolution / copy / reshape / ...)
  (b) the top-20 individual ops by total time

so the growth is attributable to named ops (relayout copies, padded
convs, attention transposes) rather than a ratio. Bandwidth-bound
categories (copy/transpose/reshape run at ~HBM speed) convert to bytes
at the measured 569 GB/s.

    python scripts/profile_bytes_256.py [--img 256] [--steps 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30,
                    help="reverse steps in the traced scan")
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    on_tpu = jax.default_backend() == "tpu"
    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=jnp.bfloat16, use_pallas=on_tpu and not args.no_pallas)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu = unet.clone(use_pallas=False)
        params = cpu.init(jax.random.PRNGKey(0),
                          np.zeros((1, args.img, args.img, 1), np.float32),
                          np.zeros((1,), np.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    # schedule truncated to --steps so the traced scan is short but the
    # per-step program is the full sampler body
    sched = make_schedule(args.steps, "cosine")

    @jax.jit
    def run(p, r):
        return sample_loop(lambda xt, t: unet.apply({"params": p}, xt, t),
                           sched, r, (args.batch, args.img, args.img, 1))

    out = run(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

    tdir = f"/tmp/trace_bytes_{args.img}"
    with jax.profiler.trace(tdir):
        out = run(params, jax.random.PRNGKey(1))
        jax.block_until_ready(out)

    files = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)

    cats = collections.Counter()
    ops = collections.Counter()
    op_cat = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if not (isinstance(a, dict) and "hlo_category" in a):
            continue
        dur_ms = e.get("dur", 0) / 1e3
        cats[a["hlo_category"]] += dur_ms
        name = e.get("name", "?")
        ops[name] += dur_ms
        op_cat[name] = a["hlo_category"]

    per_step = {k: round(v / args.steps, 3) for k, v in cats.most_common()}
    total = sum(cats.values()) / args.steps
    print(f"\n=== {args.img}^2 b{args.batch} sampling, per-step HLO-category ms "
          f"(total {total:.2f} ms) ===")
    for k, v in per_step.items():
        print(f"  {k:24s} {v:8.3f} ms  ({100*v/total:4.1f}%)")

    print(f"\n=== top-20 ops by total time (ms per step) ===")
    top = []
    for name, dur in ops.most_common(20):
        row = {"op": name[:110], "category": op_cat[name],
               "ms_per_step": round(dur / args.steps, 3)}
        top.append(row)
        print(f"  {row['ms_per_step']:8.3f}  [{row['category']:<12s}] {row['op']}")

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        f"PROFILE_{args.img}.json")
    with open(out_path, "w") as f:
        json.dump({"img": args.img, "batch": args.batch, "steps": args.steps,
                   "no_pallas": args.no_pallas,
                   "per_step_category_ms": per_step,
                   "total_ms_per_step": round(total, 3),
                   "top_ops": top}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
