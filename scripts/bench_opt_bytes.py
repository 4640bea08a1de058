"""Train-step byte-reduction levers A/B (VERDICT r3 #3).

The bf16 train step measures at ~101% of the HBM roof (ROOFLINE.json:
55.1 GB bytes-accessed, 66.5 ms at batch 16) — "nothing left but moving
fewer bytes". This script measures the named levers honestly (scan-in-one-
jit, params/opt_state as carry — the CLAUDE.md tunnel-timing trap):

  adam_fp32      — shipping config (fp32 mu/nu)
  adam_mu_bf16   — optax.adam(mu_dtype=bf16): first moment stored bf16
  adam_munu_bf16 — custom scale_by_adam with BOTH moments stored bf16
                   (update math in fp32; storage-only cast)
  batch sweep    — 8 / 16 / 32 at the shipping optimizer

Expectation math first (v5e, 819 GB/s): Adam state traffic per step =
read {p, g, mu, nu} + write {p, mu, nu} = 7 x 145 MB = 1.01 GB = 1.24 ms.
Casting mu+nu to bf16 saves 2 x 145 MB read + 2 x 72.5 MB... at most
~0.5 ms of a 66.5 ms step (<1%). The levers are measured anyway so the
rejection (or win) is a number, not an estimate — DESIGN.md records it.

    python scripts/bench_opt_bytes.py [--iters 20] [--img 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial
from typing import NamedTuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ScaleByAdamBF16State(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_bf16(b1=0.9, b2=0.999, eps=1e-8):
    """Adam with BOTH moments stored bf16 (math in fp32, storage-only cast).

    optax.adam only exposes mu_dtype; nu (the second moment) stays fp32
    there. Here nu is bf16 too — the maximum optimizer-state byte cut
    without changing the update rule's compute precision."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
        nu = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.bfloat16), params)
        return ScaleByAdamBF16State(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        b1c = 1 - b1 ** count.astype(jnp.float32)
        b2c = 1 - b2 ** count.astype(jnp.float32)

        def upd(g, m, v):
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g)
            out = (m32 / b1c) / (jnp.sqrt(v32 / b2c) + eps)
            return out, m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)

        flat, treedef = jax.tree_util.tree_flatten(updates)
        mu_f = treedef.flatten_up_to(state.mu)
        nu_f = treedef.flatten_up_to(state.nu)
        outs = [upd(g, m, v) for g, m, v in zip(flat, mu_f, nu_f)]
        updates = treedef.unflatten([o[0] for o in outs])
        mu = treedef.unflatten([o[1] for o in outs])
        nu = treedef.unflatten([o[2] for o in outs])
        return updates, ScaleByAdamBF16State(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_bf16_states(lr):
    return optax.chain(scale_by_adam_bf16(), optax.scale(-lr))


def build_step(tx, batch, img):
    from tedm_tpu.models.diffusion import train_loss
    from tedm_tpu.models.unet import Unet
    from tedm_tpu.ops.schedules import make_schedule

    on_tpu = jax.default_backend() == "tpu"
    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1,
                dtype=jnp.bfloat16, use_pallas=on_tpu)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu_unet = unet.clone(use_pallas=False)
        params = cpu_unet.init(
            jax.random.PRNGKey(0), np.zeros((1, img, img, 1), np.float32),
            np.zeros((1,), np.int32))["params"]
        sched = make_schedule(1000, "cosine")
        opt_state = jax.eval_shape(tx.init, params)
        opt_state = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), opt_state)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    opt_state = jax.device_put(opt_state, dev)

    def loss_fn(p, x, r):
        return train_loss(lambda xt, t: unet.apply({"params": p}, xt, t),
                          sched, r, x)

    key = jax.random.PRNGKey(0)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
    def run(p, o, x, iters):
        def body(c, i):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p, x, jax.random.fold_in(key, i))
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), l

        (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(iters))
        return p, o, ls

    x = jax.device_put(
        np.random.RandomState(0).randn(batch, img, img, 1).astype(np.float32))
    return run, params, opt_state, x


def bench(name, tx, batch, img, iters, record):
    run, params, opt_state, x = build_step(tx, batch, img)
    t0 = time.perf_counter()
    params, opt_state, l = run(params, opt_state, x, iters)
    jax.block_until_ready(l)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    params, opt_state, l = run(params, opt_state, x, iters)
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:6.2f} ms/step ({batch/dt:6.1f} imgs/s) "
          f"[compile {compile_s:.0f}s]", flush=True)
    record({"name": name, "img": img, "batch": batch, "ms": round(dt * 1e3, 3),
            "imgs_per_sec": round(batch / dt, 2),
            "compile_s": round(compile_s, 1)})
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--out", type=str, default="BENCH_opt_bytes.jsonl")
    args = ap.parse_args()

    rows = []

    def record(r):
        r["backend"] = jax.default_backend()
        rows.append(r)
        with open(args.out, "a") as f:
            f.write(json.dumps(r) + "\n")

    bench("train/adam_fp32_b16", optax.adam(1e-4), 16, args.img, args.iters, record)
    bench("train/adam_mu_bf16_b16", optax.adam(1e-4, mu_dtype=jnp.bfloat16),
          16, args.img, args.iters, record)
    bench("train/adam_munu_bf16_b16", adam_bf16_states(1e-4), 16, args.img,
          args.iters, record)
    bench("train/adam_fp32_b8", optax.adam(1e-4), 8, args.img, args.iters, record)
    bench("train/adam_fp32_b32", optax.adam(1e-4), 32, args.img, args.iters, record)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
