"""Roofline measurement for the two headline programs (VERDICT r2 #3).

Programs:
  (a) the full 1000-step DDPM sampling scan (bf16, batch 8, 128²) — the
      bench.py headline;
  (b) the bf16 train step (loss+grad+Adam, batch 16, 128²) — the training
      headline (67.4 ms/step, BASELINE.md).

For each: analytic HLO flops (lowered cost analysis — backend-independent
model flops), POST-OPTIMIZATION bytes accessed (compiled cost analysis —
XLA's estimate of HBM traffic after fusion), an honest scan-harness
timing, and the derived MFU + achieved-HBM-bandwidth against TPU v5e
peaks (197 TFLOP/s bf16, 819 GB/s — cloud.google.com/tpu/docs/v5e).

Writes ROOFLINE.json at the repo root (bench.py reads
sampling_bytes_per_run from it to report hbm_gbps every round) and prints
a markdown paragraph for BASELINE.md.

    python scripts/roofline.py [--skip_train] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def cost_of(lowered, exe):
    """(flops, bytes): analytic flops from the lowering (pre-optimization,
    backend-independent), bytes accessed from the compiled executable
    (post-fusion HBM-traffic estimate)."""
    flops = bytes_ = None
    try:
        c = lowered.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0)) or None
    except Exception as e:
        print(f"  lowered cost_analysis unavailable: {e}")
    try:
        c = exe.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        bytes_ = float(c.get("bytes accessed", 0.0)) or None
        # post-opt flops (after algebraic simplification) if present
        f2 = float(c.get("flops", 0.0)) or None
        if f2:
            flops = flops or f2
    except Exception as e:
        print(f"  compiled cost_analysis unavailable: {e}")
    return flops, bytes_


def build_model(dtype, use_pallas, img=128):
    from tedm_tpu.models.unet import Unet

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=dtype, use_pallas=use_pallas)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_unet = unet.clone(use_pallas=False)
        params = cpu_unet.init(
            jax.random.PRNGKey(0), np.zeros((1, img, img, 1), np.float32),
            np.zeros((1,), np.int32))["params"]
    return unet, jax.device_put(params, jax.devices()[0])


def sampling_program(batch=8, steps=1000, img=128):
    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.ops.schedules import make_schedule

    on_tpu = jax.default_backend() == "tpu"
    unet, params = build_model(jnp.bfloat16 if on_tpu else jnp.float32, on_tpu,
                               img=img)
    sched = make_schedule(steps, "cosine")
    apply_fn = lambda x, t: unet.apply({"params": params}, x, t)

    @jax.jit
    def run(r):
        y = sample_loop(apply_fn, sched, r, (batch, img, img, 1))
        # scalar out: block_until_ready can return early for large outputs
        # on this stack (r4 harness fix; see bench_shapes.bench_fwd) — the
        # mean is negligible in the cost analysis and makes the float()
        # sync in time_and_cost a true wait
        return jnp.asarray(y, jnp.float32).mean()

    return run, (jax.random.PRNGKey(0),)


def train_program(batch=16, iters=1, img=128, remat=False):
    import optax

    from tedm_tpu.models.diffusion import train_loss
    from tedm_tpu.ops.schedules import make_schedule

    on_tpu = jax.default_backend() == "tpu"
    unet, params = build_model(jnp.bfloat16 if on_tpu else jnp.float32, on_tpu, img=img)
    sched = make_schedule(1000, "cosine")
    tx = optax.adam(1e-4)
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])
    key = jax.random.PRNGKey(0)

    # mirror the product --remat (Unet.remat, block-level nn.remat): the
    # stored-activation backward OOMs HBM at 512^2 even at batch 2, and a
    # whole-model jax.checkpoint does not cut the peak (measured OOM at
    # b4) — only per-block remat does
    if remat:
        unet = unet.clone(remat=True)

    def loss_fn(p, x, r):
        return train_loss(
            lambda xt, t: unet.apply({"params": p}, xt, t), sched, r, x)

    @jax.jit
    def run(p, o, x):
        def body(c, i):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p, x, jax.random.fold_in(key, i))
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), l

        (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(iters))
        return ls

    x = jax.device_put(
        np.random.RandomState(0).randn(batch, img, img, 1).astype(np.float32))
    return run, (params, opt_state, x)


def measure(name, run, args, per_div):
    """Compile, cost-analyze, and time (honest: the program is one jit whose
    iterations are chained by data dependency — scan carries).

    COST-ANALYSIS SEMANTICS (measured on this stack, r3): XLA counts each
    HLO op ONCE — a While/scan body is NOT multiplied by its trip count.
    Both programs here are a single scan whose body dominates (setup ops
    are negligible), so the reported flops/bytes ARE per-iteration values
    and pair with elapsed/per_div, not elapsed. Sanity anchor: sampling
    flops came back 475.93e9 == one UNet fwd (474 GFLOP, DESIGN.md) +
    posterior math, NOT 1000x that. bytes is XLA's post-fusion "bytes
    accessed" HBM-traffic estimate — an upper bound (it misses some
    fusion-internal reuse), so hbm_frac slightly above 1.0 reads "at the
    roof within model error".
    """
    print(f"== {name} ==", flush=True)
    lowered = run.lower(*args)
    exe = lowered.compile()  # the ONE compile; executed via AOT below
    flops, bytes_ = cost_of(lowered, exe)
    # device_get = true host sync; block_until_ready alone can return
    # early on this stack (r4 harness fix — programs here end in small
    # outputs so the transfer cost is nil)
    jax.device_get(exe(*args))  # warmup/dispatch
    t0 = time.perf_counter()
    jax.device_get(exe(*args))
    dt = time.perf_counter() - t0
    rec = derive(dt, flops, bytes_, per_div)
    for k, v in rec.items():
        print(f"  {k}: {v}")
    return rec


def derive(dt, flops, bytes_, per_div):
    """Derived roofline fields from raw (elapsed_s, per-ITER flops/bytes)."""
    unit_s = dt / per_div
    rec = {"elapsed_s": dt, "flops_per_unit": flops, "bytes_per_unit": bytes_,
           "per": per_div, "ms_per_unit": unit_s * 1e3}
    if flops:
        rec["mfu"] = flops / unit_s / V5E_PEAK_BF16_FLOPS
        rec["compute_floor_ms"] = flops / V5E_PEAK_BF16_FLOPS * 1e3
    if bytes_:
        rec["hbm_gbps"] = bytes_ / unit_s / 1e9
        rec["hbm_frac"] = rec["hbm_gbps"] / V5E_PEAK_HBM_GBPS
        rec["bandwidth_floor_ms"] = bytes_ / (V5E_PEAK_HBM_GBPS * 1e9) * 1e3
    return rec


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_sampling", action="store_true")
    ap.add_argument("--iters", type=int, default=20,
                    help="train-step scan length")
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--steps", type=int, default=1000,
                    help="sampling scan length; shorten at 512^2 where a "
                    "1000-step scan is a single ~3-min device execution that "
                    "trips the tunnel's RPC deadline (per-step cost is "
                    "schedule-length independent: the UNet fwd dominates)")
    ap.add_argument("--train_batch", type=int, default=16)
    ap.add_argument("--train_remat", action="store_true",
                    help="jax.checkpoint the UNet in the train step "
                    "(required to fit 512^2)")
    ap.add_argument("--out", type=str, default=None,
                    help="default: ROOFLINE.json at 128, ROOFLINE_<img>.json "
                    "otherwise (bench.py derives MFU from ROOFLINE.json and "
                    "assumes its 128^2 shape — never overwrite it with "
                    "another shape's per-step flops/bytes)")
    args = ap.parse_args(argv)
    if args.out is None:
        args.out = ("ROOFLINE.json" if args.img == 128
                    else f"ROOFLINE_{args.img}.json")

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0]),
           "peaks": {"bf16_tflops": V5E_PEAK_BF16_FLOPS / 1e12,
                     "hbm_gbps": V5E_PEAK_HBM_GBPS}}

    path = os.path.join(REPO, args.out)

    def flush():
        # write after EVERY phase: a 512^2 train-step OOM (or tunnel fault)
        # must not discard the sampling measurement that already succeeded
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {path}", flush=True)

    out["img"] = args.img
    if not args.skip_sampling:
        run, a = sampling_program(steps=args.steps, img=args.img)
        rec = measure(f"sampling scan (bf16 b8 {args.img}^2, "
                      f"{args.steps} steps)", run, a, args.steps)
        out["sampling"] = rec
        # bench.py reads these to derive MFU/hbm_gbps from ITS measured dt
        if rec.get("bytes_per_unit"):
            out["sampling_bytes_per_step"] = rec["bytes_per_unit"]
        if rec.get("flops_per_unit"):
            out["sampling_flops_per_step"] = rec["flops_per_unit"]
        flush()

    if not args.skip_train:
        run, a = train_program(batch=args.train_batch, iters=args.iters,
                               img=args.img, remat=args.train_remat)
        rec = measure(
            f"train step (bf16 b{args.train_batch} {args.img}^2, "
            f"{args.iters} chained{', remat' if args.train_remat else ''})",
            run, a, args.iters)
        out["train"] = rec
        flush()

    # BASELINE.md paragraph
    print("\n--- roofline paragraph ---")
    for key, per, unit in (("sampling", "reverse step", "step"),
                           ("train", "train step", "step")):
        r = out.get(key)
        if not r:
            continue
        line = f"**{key}**: {r['ms_per_unit']:.2f} ms/{unit}"
        if r.get("mfu") is not None:
            line += f", MFU {100 * r['mfu']:.1f}%"
        if r.get("hbm_gbps") is not None:
            line += (f", {r['hbm_gbps']:.0f} GB/s achieved "
                     f"({100 * r['hbm_frac']:.0f}% of 819 GB/s HBM peak)")
        print(line)


if __name__ == "__main__":
    main()
