"""One-off: sampling-loop throughput sweep on the real chip.

Measures steps/s/chip for the jitted ancestral sample_loop at several batch
sizes, plus a variant with the dynamic-threshold quantile computed via
top_k order statistics instead of a full sort (exact same value: the 0.995
quantile of 16384 elements needs only the top 83).
"""
import time

import jax
import jax.numpy as jnp

from tedm_tpu.models.diffusion import sample_loop
from tedm_tpu.models.unet import Unet
from tedm_tpu.ops.schedules import make_schedule


def main():
    on_tpu = jax.default_backend() == "tpu"
    steps = 1000 if on_tpu else 3
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=dtype, use_pallas=on_tpu)
    init_unet = unet.clone(use_pallas=False) if on_tpu else unet
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)),
            jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    sched = make_schedule(steps, "cosine")
    apply_fn = lambda x, t: unet.apply({"params": params}, x, t)

    for batch in (8, 16, 32):
        @jax.jit
        def run(r):
            return sample_loop(apply_fn, sched, r, (batch, 128, 128, 1))

        t0 = time.perf_counter()
        run(jax.random.PRNGKey(1)).block_until_ready()
        compile_s = time.perf_counter() - t0
        reps = 2 if on_tpu else 1
        t0 = time.perf_counter()
        for i in range(reps):
            out = run(jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        sps = batch * steps / dt
        print(f"batch={batch:3d}  {dt*1e3:8.1f} ms/loop  "
              f"{sps:8.1f} steps/s/chip  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
