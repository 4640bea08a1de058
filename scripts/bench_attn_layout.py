"""One-off: full-size UNet fwd with the three linear-attention layouts.

(a) pallas kernel (current default, needs (B,heads,d,N) transposes)
(b) XLA einsum, heads_major layout (same transposes)
(c) XLA einsum, nhwc layout (no transposes)
"""
import time

import jax
import jax.numpy as jnp

from tedm_tpu.models.unet import Unet


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8

    base = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1, dtype=dtype)
    with jax.default_device(jax.devices("cpu")[0]):
        params = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)),
            jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    x = jnp.zeros((batch, 128, 128, 1), dtype)
    t = jnp.zeros((batch,), jnp.int32)

    for name, kw in [
        ("pallas+transpose", dict(use_pallas=on_tpu)),
        ("xla heads_major ", dict(use_pallas=False, attn_layout="heads_major")),
        ("xla nhwc        ", dict(use_pallas=False, attn_layout="nhwc")),
    ]:
        unet = base.clone(**kw)

        @jax.jit
        def fwd(x, t):
            return unet.apply({"params": params}, x, t)

        fwd(x, t).block_until_ready()
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(x, t)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:6.2f} ms ({batch/dt:5.0f} imgs/s)", flush=True)


if __name__ == "__main__":
    main()
