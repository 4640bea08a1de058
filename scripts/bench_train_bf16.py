"""Root-cause the bf16-slower-than-fp32 train step (VERDICT r1 weak #4).

Round-1 measured the bf16 DDPM train step at 16.9 ms vs 14.4 ms fp32
("conv backward layouts") and shipped training fp32. This script times
the jitted step honestly (params thread through the loop, so iterations
are data-dependent — no tunnel dedup) and captures a profiler trace per
variant, printing the HLO-category breakdown so the regression is
attributable.

Variants:
  fp32            — the shipping config
  bf16            — model dtype bf16 (params fp32, activations bf16)
  bf16+remat      — jax.checkpoint on the UNet apply
  bf16+nhwc_grad  — conv_general_dilated backward forced via explicit
                    preferred_element_type on the forward convs (flax
                    default already does this; kept for A/B clarity)

    python scripts/bench_train_bf16.py [--profile]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def hlo_breakdown(trace_dir: str, iters: int) -> dict:
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return {}
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    agg = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if isinstance(args, dict) and "hlo_category" in args:
            agg[args["hlo_category"]] += e.get("dur", 0) / 1e3
    return {k: round(v / iters, 3) for k, v in agg.most_common(12)}


def build_step(dtype, use_pallas, remat, batch):
    from tedm_tpu.models.diffusion import train_loss
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=dtype, use_pallas=use_pallas)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                        use_pallas=False)
        params = cpu_unet.init(
            jax.random.PRNGKey(0), np.zeros((1, 128, 128, 1), np.float32),
            np.zeros((1,), np.int32))["params"]
        sched = make_schedule(1000, "cosine")
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    opt_state = jax.device_put(opt_state, dev)

    apply_fn = lambda p, xt, t: unet.apply({"params": p}, xt, t)
    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def loss_fn(p, x, r):
        return train_loss(lambda xt, t: apply_fn(p, xt, t), sched, r, x)

    # HONEST harness (CLAUDE.md timing trap): the whole multi-step loop is
    # ONE jit with params/opt_state as the scan carry — every iteration is
    # data-dependent on the last, so the axon tunnel can neither dedup nor
    # pipeline-hide the steps. An async chain of per-step jits measured
    # fp32 at 5.77 ms/step while its own profile showed ~14 ms: fiction.
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
    def run(p, o, x, iters):
        def body(c, i):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p, x, jax.random.fold_in(key, i))
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), l

        (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(iters))
        return p, o, ls

    x = jax.device_put(
        np.random.RandomState(0).randn(batch, 128, 128, 1).astype(np.float32))
    return run, params, opt_state, x


def bench(name, dtype, use_pallas, remat, batch, iters, profile):
    run, params, opt_state, x = build_step(dtype, use_pallas, remat, batch)
    params, opt_state, l = run(params, opt_state, x, iters)  # compile
    jax.block_until_ready(l)
    t0 = time.perf_counter()
    params, opt_state, l = run(params, opt_state, x, iters)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / iters
    line = f"{name}: {dt*1e3:6.2f} ms/step ({batch/dt:5.0f} imgs/s)"
    if profile:
        tdir = f"/tmp/trace_{name}"
        with jax.profiler.trace(tdir):
            _, _, l = run(params, opt_state, x, iters)
            jax.block_until_ready(l)
        line += f"  {hlo_breakdown(tdir, iters)}"
    print(line, flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    bench("fp32", jnp.float32, on_tpu, False, args.batch, args.iters, args.profile)
    bench("bf16", jnp.bfloat16, on_tpu, False, args.batch, args.iters, args.profile)
    bench("bf16_remat", jnp.bfloat16, on_tpu, True, args.batch, args.iters,
          args.profile)


if __name__ == "__main__":
    main()
