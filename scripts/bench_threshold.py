"""Isolate the dynamic-threshold cost inside the sampling scan.

Context: the r4 1024² sampling row initially measured 1984.9 ms against a
455.8 ms forward. The non-UNet work in the scan body is posterior math
(elementwise, negligible) and `dynamic_threshold`, whose top-k runs at
k≈0.005·N (5243 of 1,048,576 at 1024²). This bench times a scan of JUST
dynamic_threshold per shape.

HARNESS (r4, CLAUDE.md): jit returns an in-jit scalar; sync via float().
block_until_ready can return WITHOUT waiting for large outputs on this
stack (measured here first: a 300-step scan "blocked" in 0.8 ms vs ~30 s
of execution) — that discovery is why every bench harness now float-syncs.

Measured (v5e, fp32): threshold/shipped 1024²b2 ≈ 10.2 ms/step,
dominated by the (2, 1M) top_k sort — 2% of the honest sampling step.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from tedm_tpu.models.diffusion import dynamic_threshold


def bench_shape(batch, img, steps=30, mode="shipped"):
    if mode == "shipped":
        body = lambda c: dynamic_threshold(c, 0.995)
    elif mode == "sort":
        def body(c):
            flat = jnp.abs(c.reshape(c.shape[0], -1)).astype(jnp.float32)
            s = jnp.quantile(flat, 0.995, axis=1)
            s = jnp.maximum(s, 1.0).reshape(-1, *((1,) * (c.ndim - 1)))
            return jnp.clip(c, -s, s) / s
    else:
        raise ValueError(mode)

    @jax.jit
    def run(key):
        x = jax.random.normal(key, (batch, img, img, 1), jnp.float32) * 2.0
        def step(c, _):
            # carry stays live: each threshold output feeds the next iter
            return body(c) * 2.0, ()
        y, _ = jax.lax.scan(step, x, length=steps)
        return y.mean()

    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(2)))
    ms = (time.perf_counter() - t0) / steps * 1000.0
    return ms, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=["shipped"])
    ap.add_argument("--shapes", nargs="*",
                    default=["8x256", "8x512", "2x1024"])
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    for spec in args.shapes:
        b, img = (int(v) for v in spec.split("x"))
        for mode in args.modes:
            ms, comp = bench_shape(b, img, args.steps, mode)
            print(json.dumps({
                "name": f"threshold/{mode}", "img": img, "batch": b,
                "ms": round(ms, 3), "compile_s": round(comp, 1),
                "backend": jax.default_backend(),
            }), flush=True)


if __name__ == "__main__":
    main()
