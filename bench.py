"""Headline benchmark: DDPM reverse-sampling throughput per chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: single-image-equivalent UNet reverse steps per second per chip —
(batch * scan_steps) / elapsed / n_chips — on the full-size backbone
(dim=64, mults 1/2/4/8, 1x128x128, 36,245,377 params; parity with
reference models/unet_model.py measured in-tree), sampling via the jitted
``lax.scan`` ancestral loop with dynamic thresholding
(tedm_tpu/models/diffusion.py:sample_loop).

Harness: the reps are chained by a DATA DEPENDENCY inside one jit (each
rep's PRNG key is perturbed by 0*sum(previous output)), so the device
cannot overlap or dedupe them and the final block_until_ready transitively
waits for every rep. Through the axon tunnel, independent dispatches +
one final block measure dispatch rate, not execution (CLAUDE.md "TIMING
TRAP") — this harness is immune by construction and matches the profiler.

Extra fields (VERDICT r2 #3): "mfu" — model FLOPs utilization, analytic
HLO flops (jax lowered cost analysis) / elapsed / chip peak;
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
import time

BASELINE_STEPS_PER_SEC = 1.178  # torch-CPU reference UNet fwd, batch 1

# TPU v5e (1 chip) peaks — cloud.google.com/tpu/docs/v5e: 197 TFLOP/s
# bf16 matmul, 819 GB/s HBM bandwidth.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_GBPS = 819.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    n_chips = jax.local_device_count()

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

    reps = 3 if on_tpu else 1

    @jax.jit
    def run_reps(r):
        # Chain reps through the PRNG key: rep i+1's key depends on rep i's
        # output, so execution is strictly serialized on device and the
        # final block waits for all of it (the async-chain tunnel trap
        # cannot occur). The 0* keeps the sampled keys identical to split().
        def body(r, _):
            r, sub = jax.random.split(r)
            out = sample_loop(apply_fn, sched, sub, (batch, 128, 128, 1))
            r = r + (out.sum() * 0).astype(r.dtype)
            return r, out[0, 0, 0, 0]
        _, lasts = jax.lax.scan(body, r, None, length=reps)
        return lasts

    # Warmup/compile. jax.device_get (not block_until_ready) is the sync:
    # on this stack block_until_ready can return without waiting (r4
    # harness fix, see CLAUDE.md) — a host transfer of the (reps,) output
    # is a true wait and costs nothing at this size.
    jax.device_get(run_reps(jax.random.PRNGKey(1)))
    t0 = time.perf_counter()
    jax.device_get(run_reps(jax.random.PRNGKey(2)))
    dt = (time.perf_counter() - t0) / reps

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
            import os
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
