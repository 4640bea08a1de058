"""One-off: op-level profile of the full-size UNet forward on the TPU.

Captures a jax.profiler trace of the jitted bf16 batch-8 forward (the body
of the sampling scan = the headline bench) and prints the HLO op-stats
table via tensorboard_plugin_profile — no TensorBoard UI needed.
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

from tedm_tpu.models.unet import Unet

TRACE_DIR = "/tmp/unet_trace"


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=dtype, use_pallas=on_tpu)
    init_unet = unet.clone(use_pallas=False) if on_tpu else unet
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1)),
            jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])

    @jax.jit
    def fwd(x, t):
        return unet.apply({"params": params}, x, t)

    x = jnp.zeros((batch, 128, 128, 1), dtype)
    t = jnp.zeros((batch,), jnp.int32)
    fwd(x, t).block_until_ready()  # compile

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(x, t)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"fwd batch={batch} {dtype.__name__}: {dt*1e3:.2f} ms "
          f"({batch/dt:.0f} imgs/s)", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = fwd(x, t)
        out.block_until_ready()

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        sys.exit("no trace captured")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
            out_path = f"/tmp/unet_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out_path, mode) as f:
                f.write(data)
            print(f"wrote {out_path} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool} failed: {e}", flush=True)


if __name__ == "__main__":
    main()
