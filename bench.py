"""Headline benchmark: DDPM reverse-sampling throughput per chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: single-image-equivalent UNet reverse steps per second per chip —
(batch * scan_steps) / elapsed / n_chips — on the full-size backbone
(dim=64, mults 1/2/4/8, 1x128x128, 36,245,377 params; parity with
reference models/unet_model.py measured in-tree), sampling via the jitted
``lax.scan`` ancestral loop with dynamic thresholding
(tedm_tpu/models/diffusion.py:sample_loop).

Baseline: the PyTorch reference on CPU runs the same UNet forward at
batch 1 in 849 ms → 1.178 steps/sec (measured in this image from
/root/reference models/unet_model.py, torch 1-thread; consistent with the
reference's own 10-35 s/model statement, app.py:187). BASELINE.md target:
>= 5x this.
"""

import json
import time

BASELINE_STEPS_PER_SEC = 1.178  # torch-CPU reference UNet fwd, batch 1


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

    @jax.jit
    def run(r):
        return sample_loop(apply_fn, sched, r, (batch, 128, 128, 1))

    # Warmup/compile.
    run(jax.random.PRNGKey(1)).block_until_ready()
    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    steps_per_sec = batch * scan_steps / dt / max(n_chips, 1)
    print(json.dumps({
        "metric": "ddpm_sampling_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "unet_reverse_steps/s/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
