"""One-off: DDPM train-step throughput, fp32 vs bf16 (mixed_precision).

Full-size backbone, batch 16, loss+grad+Adam as one jitted donated step —
the same step the img_only trainer runs.
"""
import time

import jax
import jax.numpy as jnp
import optax

from tedm_tpu.models.diffusion import train_loss
from tedm_tpu.models.unet import Unet
from tedm_tpu.ops.schedules import make_schedule


def bench(dtype, use_pallas, batch=16):
    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=dtype, use_pallas=use_pallas)
    init_unet = unet.clone(use_pallas=False) if use_pallas else unet
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)),
            jnp.zeros((1,), jnp.int32))["params"]
        sched = make_schedule(1000, "cosine")
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    opt_state = jax.device_put(opt_state, dev)

    def loss_fn(p, x, r):
        return train_loss(lambda xt, t: unet.apply({"params": p}, xt, t),
                          sched, r, x)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(p, o, x, r):
        l, g = jax.value_and_grad(loss_fn)(p, x, r)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    x = jnp.zeros((batch, 128, 128, 1), jnp.float32)
    params, opt_state, l = step(params, opt_state, x, jax.random.PRNGKey(1))
    jax.block_until_ready(l)
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, l = step(params, opt_state, x, jax.random.PRNGKey(i))
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / n
    print(f"dtype={jnp.dtype(dtype).name} pallas={use_pallas}: "
          f"{dt*1e3:6.1f} ms/step -> {batch/dt:5.0f} imgs/s", flush=True)


def main():
    on_tpu = jax.default_backend() == "tpu"
    bench(jnp.float32, on_tpu)
    bench(jnp.bfloat16, on_tpu)


if __name__ == "__main__":
    main()
