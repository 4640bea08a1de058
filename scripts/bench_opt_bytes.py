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
from typing import NamedTuple

# repo root AND scripts/ (for bench_shapes) on the path
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, ".."))
sys.path.insert(0, _here)

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


def bench(name, tx, batch, img, iters, record):
    """Delegates to the single honest train-step harness
    (scripts/bench_shapes.py bench_train) with a custom optimizer."""
    from bench_shapes import bench_train

    def rec(nm, im, b, dt, compile_s, **extra):
        print(f"{nm}: {dt*1e3:6.2f} ms/step ({b/dt:6.1f} imgs/s) "
              f"[compile {compile_s:.0f}s]", flush=True)
        record({"name": nm, "img": im, "batch": b, "ms": round(dt * 1e3, 3),
                "imgs_per_sec": round(b / dt, 2),
                "compile_s": round(compile_s, 1)})

    bench_train(img, batch, iters, rec, tx=tx, name=name)


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
