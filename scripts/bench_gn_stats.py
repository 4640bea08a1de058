"""A/B GroupNorm stats formulations on the real chip (VERDICT r1 weak #3).

Round-1 profile: 3.7 ms of a 9.9 ms bf16 batch-8 UNet forward is standalone
GroupNorm stats reduces. Hypothesis: the (b, hw, g, c/g) reshape + mean
over (1, 3) reduces over an 8-wide minor axis (c/g = 8 lanes of 128) —
lane-starved. Variant B does a per-CHANNEL reduce over hw first (full
lanes, contiguous) and combines the (b, c) sums into (b, g) stats with a
tiny second reduce. Mathematically identical (same E[x^2]-mu^2 form).

    python scripts/bench_gn_stats.py          # microbench per stage shape
    python scripts/bench_gn_stats.py --full   # full UNet fwd A/B
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def stats_a(x, groups=8):
    b, hw, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, hw, groups, c // groups)
    mean = xf.mean(axis=(1, 3))
    ex2 = (xf * xf).mean(axis=(1, 3))
    return mean, ex2


def stats_b(x, groups=8):
    b, hw, c = x.shape
    xf = x.astype(jnp.float32)
    s1 = xf.sum(axis=1)            # (b, c): contiguous lane-wide reduce
    s2 = (xf * xf).sum(axis=1)
    denom = hw * (c // groups)
    mean = s1.reshape(b, groups, c // groups).sum(-1) / denom
    ex2 = s2.reshape(b, groups, c // groups).sum(-1) / denom
    return mean, ex2


def timeit(fn, x, iters=50):
    # Data-dependency scan: the axon tunnel dedupes identical async
    # dispatches, so an independent-call loop measures nothing (CLAUDE.md).
    def body(c, _):
        m, _e = fn(c)
        return c + (m[0, 0] * 1e-30).astype(c.dtype), ()

    scan = jax.jit(lambda x: jax.lax.scan(body, x, None, length=iters)[0])
    jax.block_until_ready(scan(x))
    t0 = time.perf_counter()
    jax.block_until_ready(scan(x))
    return (time.perf_counter() - t0) / iters * 1e3


def micro():
    shapes = [(8, 128 * 128, 64), (8, 64 * 64, 128), (8, 32 * 32, 256),
              (8, 16 * 16, 512)]
    print(f"{'shape':>22} {'A reshape-mean':>15} {'B chan-major':>14}")
    for shp in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), shp, jnp.bfloat16)
        ta = timeit(stats_a, x)
        tb = timeit(stats_b, x)
        print(f"{str(shp):>22} {ta:>13.3f}ms {tb:>12.3f}ms")


def full():
    # NB: a data-dependency scan, NOT an async chain of independent calls —
    # the axon tunnel dedupes identical in-flight executions and an async
    # harness "measures" 0.6 ms for this 10 ms forward (see CLAUDE.md).
    from tedm_tpu.models.unet import Unet

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1, dtype=jnp.bfloat16,
                use_pallas=True)
    x = jax.device_put(
        np.random.RandomState(0).randn(8, 128, 128, 1).astype(np.float32)
    ).astype(jnp.bfloat16)
    t = jnp.zeros((8,), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                        use_pallas=False)
        params = cpu_unet.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 1), np.float32),
                               np.zeros((1,), np.int32))["params"]
    params = jax.device_put(
        jax.tree_util.tree_map(lambda a: np.asarray(a), params), jax.devices()[0]
    )

    def body(c, _):
        return unet.apply({"params": params}, c, t), ()

    scan = jax.jit(lambda x: jax.lax.scan(body, x, None, length=30)[0])
    jax.block_until_ready(scan(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(scan(x))
        best = min(best, (time.perf_counter() - t0) / 30 * 1e3)
    print(f"full fwd bf16 batch8: {best:.3f} ms  ({8 / best * 1e3:.0f} imgs/s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    if args.full:
        full()
    else:
        micro()
