"""A/B the fused-ResnetBlock kernel in the full UNet forward on the TPU.

Honest harness (CLAUDE.md): a data-dependency `lax.scan` of the forward
inside ONE jit — the axon tunnel dedupes identical in-flight dispatches,
so async-chain timings are fiction.

    python scripts/bench_resblock.py [--batch 8] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(use_resblock: bool, batch: int, iters: int, dtype=jnp.bfloat16,
          size: int = 128) -> float:
    from tedm_tpu.models.unet import Unet

    on_tpu = jax.default_backend() == "tpu"
    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1, dtype=dtype,
                use_pallas=on_tpu, use_pallas_resblock=use_resblock)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                        use_pallas=False)
        params = cpu_unet.init(
            jax.random.PRNGKey(0), np.zeros((1, size, size, 1), np.float32),
            np.zeros((1,), np.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])

    t = jax.device_put(np.arange(batch, dtype=np.int32))

    def body(c, _):
        return unet.apply({"params": params}, c, t).astype(c.dtype), ()

    scan = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    x0 = jax.device_put(
        np.random.RandomState(0).randn(batch, size, size, 1).astype(np.float32)
    ).astype(dtype)

    out = jax.block_until_ready(scan(x0))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(scan(x0))
    dt = (time.perf_counter() - t0) / iters
    print(f"use_pallas_resblock={use_resblock}: {dt*1e3:.2f} ms/fwd "
          f"(batch {batch}, {jnp.dtype(dtype).name}, {size}²) "
          f"out_mean={float(jnp.mean(out.astype(jnp.float32))):.5f}",
          flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()
    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    base = bench(False, args.batch, args.iters, dt, args.size)
    fused = bench(True, args.batch, args.iters, dt, args.size)
    print(f"speedup (all stages): {base / fused:.3f}x", flush=True)
    # wide-stages-only variant: the narrow 64-ch 128² stage starves the
    # MXU in the 9-matmul decomposition; gate it to C>=128 and re-measure
    os.environ["TEDM_RESBLOCK_MIN_C"] = "128"
    gated = bench(True, args.batch, args.iters, dt, args.size)
    print(f"speedup (C>=128 stages only): {base / gated:.3f}x", flush=True)


if __name__ == "__main__":
    main()
