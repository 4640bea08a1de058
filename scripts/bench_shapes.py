"""256² scaling point + per-shape kernel-gate measurements (VERDICT r2 #5).

Round-2 calibrated every kernel gate at 128²/batch-8 only. This script
measures, at --img (default 256), with the honest scan-in-one-jit harness
(CLAUDE.md timing trap — a final block does NOT transitively wait through
the axon tunnel for independent dispatches):

  fwd/default    — shipping config (fused attn-block where fits_vmem admits)
  fwd/no_pallas  — XLA attention everywhere
  fwd/gn         — + fused GroupNorm kernel (opt-in; predicted to flip at
                   larger shapes, models/unet.py)
  fwd/resblock   — + fused ResnetBlock kernel (VMEM guard falls back at
                   wide stages by design)
  sample/default — full 1000-step sampling scan, batch 8
  train/default  — bf16 train step (loss+grad+Adam), batch --train_batch

Appends one JSON line per measurement to BENCH_shapes.jsonl.

    python scripts/bench_shapes.py [--img 256] [--iters 30] [--skip ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def build(img, dtype, **unet_kw):
    from tedm_tpu.models.unet import Unet

    unet = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1, dtype=dtype,
                **unet_kw)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu = unet.clone(use_pallas=False, use_pallas_groupnorm=False,
                         use_pallas_resblock=False, use_pallas_flash=False)
        params = cpu.init(jax.random.PRNGKey(0),
                          np.zeros((1, img, img, 1), np.float32),
                          np.zeros((1,), np.int32))["params"]
    return unet, jax.device_put(params, jax.devices()[0])


def bench_fwd(name, img, batch, iters, record, **unet_kw):
    unet, params = build(img, jnp.bfloat16, **unet_kw)
    t = jnp.zeros((batch,), jnp.int32)

    # r4 HARNESS FIX: the jit returns an IN-JIT SCALAR and timing syncs via
    # float(). On this stack block_until_ready can return WITHOUT waiting
    # for large outputs (measured: a 300-step scan with an 8 MB result
    # "blocked" in 0.8 ms while the execution took ~30 s) — only a host
    # transfer is a true sync. Inputs come from the key so warmup/timed
    # runs are distinct executions (no in-flight dedupe).
    @jax.jit
    def loop(key):
        x = jax.random.normal(key, (batch, img, img, 1), jnp.bfloat16)
        def body(c, _):
            y = unet.apply({"params": params}, c, t)
            return y.astype(c.dtype), ()
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y.astype(jnp.float32).mean()

    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(jax.random.PRNGKey(2)))
    dt = (time.perf_counter() - t0) / iters
    record(f"fwd/{name}", img, batch, dt, compile_s)


def bench_sampling(img, batch, steps, record):
    from tedm_tpu.models.diffusion import sample_loop
    from tedm_tpu.ops.schedules import make_schedule

    unet, params = build(img, jnp.bfloat16, use_pallas=True)
    sched = make_schedule(steps, "cosine")
    apply_fn = lambda x, t: unet.apply({"params": params}, x, t)

    # scalar-out + float() sync: see bench_fwd's r4 harness-fix comment
    @jax.jit
    def run(r):
        y = sample_loop(apply_fn, sched, r, (batch, img, img, 1))
        return jnp.asarray(y, jnp.float32).mean()

    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(jax.random.PRNGKey(2)))
    dt = (time.perf_counter() - t0) / steps
    record("sample/default", img, batch, dt, compile_s,
           steps_per_sec_per_chip=batch * steps / (dt * steps))


def bench_train(img, batch, iters, record, remat=False, tx=None, name=None):
    """The one honest train-step harness (scan-in-one-jit, donated carry —
    the CLAUDE.md tunnel-timing trap). scripts/bench_opt_bytes.py reuses it
    with custom optimizers instead of keeping its own copy."""
    import optax

    from tedm_tpu.models.diffusion import train_loss
    from tedm_tpu.ops.schedules import make_schedule

    unet, params = build(img, jnp.bfloat16, use_pallas=True)
    sched = make_schedule(1000, "cosine")
    tx = optax.adam(1e-4) if tx is None else tx
    with jax.default_device(jax.devices("cpu")[0]):
        # shape-only init on CPU (custom optimizers may hold bf16 state)
        opt_state = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(tx.init, params))
    opt_state = jax.device_put(opt_state, jax.devices()[0])
    key = jax.random.PRNGKey(0)

    # mirror the product --remat (Unet.remat, block-level nn.remat): at
    # 512^2 the fp32 GN activations kept for backward exceed HBM even at
    # batch 2 (15.76G of 15.75G). A whole-model jax.checkpoint does NOT
    # fix it (the rematerialized fwd holds the full set again; measured
    # OOM at b4) — only per-block remat cuts the peak.
    if remat:
        unet = unet.clone(remat=True)

    def loss_fn(p, x, r):
        return train_loss(
            lambda xt, t: unet.apply({"params": p}, xt, t), sched, r, x)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(p, o, x):
        def body(c, i):
            p, o = c
            l, g = jax.value_and_grad(loss_fn)(p, x, jax.random.fold_in(key, i))
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), l
        (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(iters))
        return p, o, ls

    x = jax.device_put(
        np.random.RandomState(0).randn(batch, img, img, 1).astype(np.float32))
    # float(ls[-1]) = true host sync (see bench_fwd's r4 harness-fix
    # comment); the donated params/opt_state chain already makes the two
    # runs distinct executions
    t0 = time.perf_counter()
    params, opt_state, ls = run(params, opt_state, x)
    float(ls[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    params, opt_state, ls = run(params, opt_state, x)
    float(ls[-1])
    dt = (time.perf_counter() - t0) / iters
    record(name or ("train/remat" if remat else "train/default"), img,
           batch, dt, compile_s, imgs_per_sec=batch / dt)


def bench_train_accum(img, batch, accum, iters, record, remat=False):
    """--grad_accum through the PRODUCT step (trainers.diffusion.make_steps):
    the global batch scanned as `accum` microbatches inside one jitted step.
    The point at 512²+: a global batch that OOMs HBM even under block remat
    (only b4 fits at 512²) trains at ~unchanged imgs/s by keeping one
    microbatch's activations live at a time. Honest harness: iters steps
    chained in one jit (donated carry), float() sync."""
    import optax

    from tedm_tpu.config import Config
    from tedm_tpu.ops.schedules import make_schedule
    from tedm_tpu.trainers import diffusion as D

    config = Config(
        experiment="img_only", img_size=img, batch_size=batch,
        grad_accum=accum, remat=remat, mixed_precision=True, timesteps=1000,
    )
    unet = D.build_model(config)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu = unet.clone(use_pallas=False, use_pallas_groupnorm=False,
                         use_pallas_resblock=False, use_pallas_flash=False)
        params = cpu.init(jax.random.PRNGKey(0),
                          np.zeros((1, img, img, 1), np.float32),
                          np.zeros((1,), np.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    sched = make_schedule(1000, "cosine")
    tx = optax.adam(1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        # shape-only init on CPU (Adam's init state is all-zeros anyway)
        opt_state = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(tx.init, params))
    opt_state = jax.device_put(opt_state, jax.devices()[0])
    train_step, _, _ = D.make_steps(config, unet, sched, tx)

    cond = np.zeros((1,), np.float32)
    valid = np.ones((batch,), np.float32)
    key = jax.random.PRNGKey(0)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(p, o, x):
        def body(c, i):
            p, o = c
            p, o, l, _ = train_step(p, o, x, cond, valid,
                                    jax.random.fold_in(key, i))
            return (p, o), l
        (p, o), ls = jax.lax.scan(body, (p, o), jnp.arange(iters))
        return p, o, ls

    x = jax.device_put(
        np.random.RandomState(0).randn(batch, img, img, 1).astype(np.float32))
    t0 = time.perf_counter()
    params, opt_state, ls = run(params, opt_state, x)
    float(ls[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    params, opt_state, ls = run(params, opt_state, x)
    float(ls[-1])
    dt = (time.perf_counter() - t0) / iters
    record(f"train/accum{accum}" + ("_remat" if remat else ""), img, batch,
           dt, compile_s, imgs_per_sec=batch / dt)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000,
                    help="sampling scan length (shorten >=512^2: a 1000-step "
                    "scan is one multi-minute device execution that trips "
                    "the tunnel RPC deadline; per-step cost is "
                    "schedule-length independent)")
    ap.add_argument("--fwd_batch", type=int, default=8)
    ap.add_argument("--train_remat", action="store_true",
                    help="jax.checkpoint the UNet in the train step "
                    "(required to fit 512^2: OOM at any batch without it)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help=">1 adds a train/accum{N} row: the product "
                    "--grad_accum step (microbatch scan) at --train_batch")
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset: default no_pallas gn resblock flash "
                    "sample train accum")
    args = ap.parse_args(argv)

    out_path = os.path.join(REPO, "BENCH_shapes.jsonl")

    def record(name, img, batch, dt, compile_s, **extra):
        rec = {"name": name, "img": img, "batch": batch,
               "ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 1),
               "backend": jax.default_backend(), **{
                   k: round(v, 2) for k, v in extra.items()}}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    want = lambda k: args.only is None or k in args.only

    failures = []

    def go(fn, *a, **kw):
        # one gate failing (OOM at an extreme shape, a tunnel fault) must
        # not abort the remaining measurements — but the process still
        # exits nonzero so automation can't mistake a failed sweep for a
        # clean one (stale JSONL rows would otherwise pass silently)
        try:
            fn(*a, **kw)
        except Exception as e:
            failures.append(fn.__name__)
            print(f"[bench_shapes] {fn.__name__}{a[:2]} FAILED: "
                  f"{type(e).__name__}: {str(e)[:400]}", flush=True)
    if want("default"):
        go(bench_fwd, "default", args.img, args.fwd_batch, args.iters, record, use_pallas=True)
    if want("no_pallas"):
        go(bench_fwd, "no_pallas", args.img, args.fwd_batch, args.iters, record, use_pallas=False)
    if want("gn"):
        go(bench_fwd, "gn", args.img, args.fwd_batch, args.iters, record,
                  use_pallas=True, use_pallas_groupnorm=True)
    if want("resblock"):
        go(bench_fwd, "resblock", args.img, args.fwd_batch, args.iters, record,
                  use_pallas=True, use_pallas_resblock=True)
    if want("flash"):
        go(bench_fwd, "flash", args.img, args.fwd_batch, args.iters, record,
                  use_pallas=True, use_pallas_flash=True)
    if want("sample"):
        go(bench_sampling, args.img, args.fwd_batch, args.steps, record)
    if want("train"):
        go(bench_train, args.img, args.train_batch, 20, record,
           remat=args.train_remat)
    if want("accum") and args.grad_accum <= 1:
        # ADVICE r4: --only accum with grad_accum=1 would silently record
        # nothing and read as a passing-but-empty bench run.
        if args.only and "accum" in args.only:  # --only is a list (nargs=*)
            raise SystemExit(
                "--only accum requires --grad_accum N (N > 1); got "
                f"--grad_accum {args.grad_accum}")
    if want("accum") and args.grad_accum > 1:  # opt-in: needs --grad_accum N
        # 512^2 accum4 b16 is ~3.4 s/step: 20 iters = ~68 s in ONE device
        # execution, which reproducibly crashes the tunnel's TPU worker
        # ("UNAVAILABLE: TPU worker process crashed"); the compiled program
        # itself is fine (memory_analysis: 13.1 GB of 16). Keep each
        # execution under ~20 s like every other recorded row.
        accum_iters = 20 if args.img < 512 else 5
        go(bench_train_accum, args.img, args.train_batch, args.grad_accum,
           accum_iters, record, remat=args.train_remat)
    if failures:
        raise SystemExit(f"{len(failures)} gate(s) failed: {failures}")


if __name__ == "__main__":
    main()
