"""Round-5 sampling-headroom probes (VERDICT r4 #6).

ROOFLINE.json bounds 128² sampling headroom at <=1.56x: the measured step
is compute floor + bandwidth floor ADDED (phases don't overlap; see
CLAUDE.md roofline notes). Two concrete experiments against that bound:

  lhs     — recompile the SAME sampling scan with XLA's latency-hiding
            scheduler (compiler_options on AOT compile, so the option
            rides the compile request through the axon tunnel) and
            A/B the per-step time against the default schedule.
  gn_bf16 — GroupNorm stats in bf16 instead of fp32 at --img 256
            (rejected at 128² with a 3% win, r1; stats reduces are a
            LARGER share of the step at 256² — PROFILE_256.json), via a
            monkeypatched stats reference (measurement only, not a
            product flag unless it wins).

Harness: the honest scan-in-one-jit data-dependency chain from bench.py
(CLAUDE.md TIMING TRAP + r4 block_until_ready trap): reps chained through
the PRNG key inside one jit, in-jit scalar output, sync via device_get,
warmup and timed runs on different keys, each execution kept under ~15 s.

Appends one JSON line per measurement to BENCH_shapes.jsonl-style stdout.

    python scripts/bench_headroom.py --only lhs
    python scripts/bench_headroom.py --only gn_bf16 --img 256
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T0 = time.perf_counter()


def progress(msg: str) -> None:
    print(f"[headroom +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def build_sampler(img: int, batch: int, scan_steps: int):
    import jax
    import jax.numpy as jnp

    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    on_tpu = jax.default_backend() == "tpu"
    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                use_pallas=on_tpu)
    init_unet = unet.clone(use_pallas=False) if on_tpu else unet
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, img, img, 1)),
            jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    sched = make_schedule(scan_steps, "cosine")
    apply_fn = lambda x, t: unet.apply({"params": params}, x, t)

    def run_reps(r, reps):
        def body(r, _):
            r, sub = jax.random.split(r)
            out = sample_loop(apply_fn, sched, sub, (batch, img, img, 1))
            r = r + (out.sum() * 0).astype(r.dtype)
            return r, out[0, 0, 0, 0]
        _, lasts = jax.lax.scan(body, r, None, length=reps)
        return lasts

    return run_reps


def timed(compiled, reps, keys):
    """warmup on keys[0], two timed windows on keys[1:], keep the min."""
    import jax

    jax.device_get(compiled(keys[0]))
    best = float("inf")
    for k in keys[1:]:
        t0 = time.perf_counter()
        jax.device_get(compiled(k))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def measure_lhs(img: int, batch: int, scan_steps: int, reps: int):
    import jax

    run_reps = build_sampler(img, batch, scan_steps)
    fn = jax.jit(lambda r: run_reps(r, reps))
    keys = [jax.random.PRNGKey(i) for i in (2, 3, 4)]

    results = {}
    for tag, opts in [
        ("default", None),
        ("latency_hiding", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ]:
        lowered = fn.lower(keys[0])
        progress(f"compiling {tag} (~4-5 min remote)")
        try:
            compiled = (lowered.compile(compiler_options=opts)
                        if opts else lowered.compile())
        except Exception as e:
            progress(f"{tag}: compile failed ({type(e).__name__}: {e}); "
                     "retrying once")
            compiled = (lowered.compile(compiler_options=opts)
                        if opts else lowered.compile())
        dt = timed(compiled, reps, keys)
        steps_s = batch * scan_steps / dt
        results[tag] = steps_s
        print(json.dumps({
            "bench": f"sampling/lhs_{tag}", "img": img, "batch": batch,
            "ms_per_rep": round(dt * 1e3, 2),
            "steps_per_sec_per_chip": round(steps_s, 2),
        }), flush=True)
    if "latency_hiding" in results:
        print(json.dumps({
            "bench": "sampling/lhs_ratio",
            "ratio": round(results["latency_hiding"] / results["default"], 4),
        }), flush=True)


def measure_gn_bf16(img: int, batch: int, scan_steps: int, reps: int):
    import jax
    import jax.numpy as jnp

    from tedm_tpu.ops.pallas import groupnorm as gnmod

    keys = [jax.random.PRNGKey(i) for i in (2, 3, 4)]

    def run(tag):
        run_reps = build_sampler(img, batch, scan_steps)
        fn = jax.jit(lambda r: run_reps(r, reps))
        lowered = fn.lower(keys[0])
        progress(f"compiling {tag}")
        try:
            compiled = lowered.compile()
        except Exception as e:
            progress(f"{tag}: compile failed ({e}); retrying once")
            compiled = lowered.compile()
        dt = timed(compiled, reps, keys)
        print(json.dumps({
            "bench": f"sampling/gn_{tag}", "img": img, "batch": batch,
            "ms_per_rep": round(dt * 1e3, 2),
            "steps_per_sec_per_chip": round(batch * scan_steps / dt, 2),
        }), flush=True)
        return dt

    dt_fp32 = run("fp32stats")

    orig = gnmod._reference

    def _bf16_stats(x, gamma, beta, scale, shift, groups, eps):
        # identical math with the stats traversal in bf16 (inputs already
        # bf16 on the sampling path, so this skips the fp32 convert+reduce)
        bsz, h, w, c = x.shape
        xf = x.astype(jnp.bfloat16).reshape(bsz, h * w, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        ex2 = (xf * xf).mean(axis=(1, 3), keepdims=True)
        var = jnp.maximum((ex2 - mean * mean).astype(jnp.float32), 0.0)
        xhat = ((xf.astype(jnp.float32) - mean.astype(jnp.float32))
                * jax.lax.rsqrt(var + eps)).reshape(bsz, h, w, c)
        gn = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        f = gn * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
        return (f * jax.nn.sigmoid(f)).astype(x.dtype)

    gnmod._reference = _bf16_stats
    try:
        dt_bf16 = run("bf16stats")
    finally:
        gnmod._reference = orig
    print(json.dumps({
        "bench": "sampling/gn_bf16_ratio",
        "ratio": round(dt_fp32 / dt_bf16, 4),
    }), flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["lhs", "gn_bf16"], required=True)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan_steps", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    progress(f"backend={jax.default_backend()}")
    if args.only == "lhs":
        measure_lhs(args.img, args.batch, args.scan_steps, args.reps)
    else:
        measure_gn_bf16(args.img, args.batch, args.scan_steps, args.reps)


if __name__ == "__main__":
    main()
