"""On-chip compiled-kernel parity gate (VERDICT r1 next #7).

CI exercises the Pallas kernels only through the interpreter / jnp paths
(CPU); the COMPILED Mosaic kernels run nowhere automatically, so a Mosaic
or layout regression would ship silently. This script runs each compiled
kernel on the real TPU against its jnp reference on identical inputs
(fwd AND VJP where the kernel defines one) and writes a KERNELS.json
verdict. Run it before each BENCH:

    python scripts/kernel_check.py [--out KERNELS.json]

Serialized with other TPU jobs (only one process can hold the axon chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _maxabs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="KERNELS.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    report = {"backend": backend, "time": time.strftime("%Y-%m-%d %H:%M:%S"),
              "kernels": {}, "ok": True}
    if backend != "tpu":
        report["ok"] = False
        report["error"] = f"not on TPU (backend={backend}); compiled kernels not exercised"
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report, indent=2))
        sys.exit(1)

    rng = jax.random.PRNGKey(args.seed)
    tol_fwd, tol_vjp = 2e-5, 2e-4  # fp32 accumulation on both sides

    def record(name, fwd_err, vjp_err=None, extra=None):
        entry = {"fwd_max_abs_err": fwd_err, "tol_fwd": tol_fwd}
        ok = fwd_err <= tol_fwd
        if vjp_err is not None:
            entry["vjp_max_abs_err"] = vjp_err
            entry["tol_vjp"] = tol_vjp
            ok = ok and vjp_err <= tol_vjp
        if extra:
            entry.update(extra)
        entry["ok"] = ok
        report["kernels"][name] = entry
        report["ok"] = report["ok"] and ok
        print(f"{name}: fwd {fwd_err:.2e}" +
              (f", vjp {vjp_err:.2e}" if vjp_err is not None else "") +
              ("  OK" if ok else "  FAIL"))

    # ---- linear attention (default-on in the UNet), fwd + VJP ----------
    from tedm_tpu.ops.pallas.linear_attention import (
        linear_attention, linear_attention_reference,
    )

    for (b, h, d, n) in [(2, 4, 32, 1024), (2, 4, 32, 4096)]:
        k1, k2, k3, k4, rng = jax.random.split(rng, 5)
        q = jax.random.normal(k1, (b, h, d, n), jnp.float32)
        k_ = jax.random.normal(k2, (b, h, d, n), jnp.float32)
        v = jax.random.normal(k3, (b, h, d, n), jnp.float32)
        g = jax.random.normal(k4, (b, h, d, n), jnp.float32)
        scale = float(d) ** -0.5

        fk = jax.jit(lambda q, k, v: linear_attention(q, k, v, scale, interpret=False))
        fr = jax.jit(lambda q, k, v: linear_attention_reference(q, k, v, scale))
        ok_ = fk(q, k_, v)
        or_ = fr(q, k_, v)
        fwd_err = _maxabs(ok_, or_)

        vjk = jax.jit(lambda q, k, v, g: jax.vjp(
            lambda *a: linear_attention(*a, scale, interpret=False), q, k, v)[1](g))
        vjr = jax.jit(lambda q, k, v, g: jax.vjp(
            lambda *a: linear_attention_reference(*a, scale), q, k, v)[1](g))
        gk = vjk(q, k_, v, g)
        gr = vjr(q, k_, v, g)
        vjp_err = max(_maxabs(a, b) for a, b in zip(gk, gr))
        record(f"linear_attention[N={n}]", fwd_err, vjp_err)

    # ---- flash cosine attention (opt-in mid-stage kernel) --------------
    from tedm_tpu.ops.pallas.flash_attention import (
        cosine_attention_reference, flash_cosine_attention,
    )

    for (b, h, n, d) in [(2, 4, 256, 32), (1, 4, 1024, 32)]:
        k1, k2, k3, rng = jax.random.split(rng, 4)
        q = jax.random.normal(k1, (b, h, n, d), jnp.float32)
        k_ = jax.random.normal(k2, (b, h, n, d), jnp.float32)
        v = jax.random.normal(k3, (b, h, n, d), jnp.float32)
        fk = jax.jit(lambda q, k, v: flash_cosine_attention(q, k, v, 16.0, interpret=False))
        fr = jax.jit(lambda q, k, v: cosine_attention_reference(
            q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d), 16.0
        ).reshape(b, h, n, d))
        fwd_err = _maxabs(fk(q, k_, v), fr(q, k_, v))
        record(f"flash_cosine_attention[N={n}]", fwd_err)

    # ---- fused GroupNorm+FiLM+SiLU (opt-in), fwd + VJP -----------------
    from tedm_tpu.ops.pallas.groupnorm import (
        fused_group_norm_film_silu, gn_fits_vmem,
        group_norm_film_silu_reference,
    )

    for (b, hh, ww, c) in [(4, 32, 32, 128), (2, 16, 16, 512)]:
        # a gated-out shape would run the reference against itself and
        # report a vacuous pass — assert the kernel path is actually taken
        assert gn_fits_vmem(hh * ww, c, 4), \
            f"gn gate shape {hh}x{ww}x{c} no longer fits VMEM — pick another"
        k1, k2, k3, k4, k5, k6, rng = jax.random.split(rng, 7)
        x = jax.random.normal(k1, (b, hh, ww, c), jnp.float32)
        gamma = jax.random.normal(k2, (c,), jnp.float32)
        beta = jax.random.normal(k3, (c,), jnp.float32)
        scale = jax.random.normal(k4, (b, c), jnp.float32) * 0.1
        shift = jax.random.normal(k5, (b, c), jnp.float32) * 0.1
        g = jax.random.normal(k6, (b, hh, ww, c), jnp.float32)

        fk = jax.jit(lambda *a: fused_group_norm_film_silu(*a, interpret=False))
        fr = jax.jit(group_norm_film_silu_reference)
        fwd_err = _maxabs(fk(x, gamma, beta, scale, shift),
                          fr(x, gamma, beta, scale, shift))
        vjk = jax.jit(lambda x, ga, be, s, sh, g: jax.vjp(
            lambda *a: fused_group_norm_film_silu(*a, interpret=False),
            x, ga, be, s, sh)[1](g))
        vjr = jax.jit(lambda x, ga, be, s, sh, g: jax.vjp(
            group_norm_film_silu_reference, x, ga, be, s, sh)[1](g))
        vjp_err = max(_maxabs(a, b) for a, b in
                      zip(vjk(x, gamma, beta, scale, shift, g),
                          vjr(x, gamma, beta, scale, shift, g)))
        record(f"fused_groupnorm[{hh}x{ww}x{c}]", fwd_err, vjp_err)

    # ---- fused PreNorm linear-attention block (default-on), fwd + VJP --
    from tedm_tpu.ops.pallas.attn_block import (
        fits_vmem as attn_fits_vmem,
        prenorm_linear_attention, prenorm_linear_attention_reference,
    )

    # The 256² UNet's widest stage (N=65536) must be gated OUT by the VMEM
    # fit guard (its slab chain is ~300 MB); running it through the gate
    # would vacuously compare the XLA fallback to itself.
    assert not attn_fits_vmem(65536, 64), \
        "attn_block fits_vmem no longer excludes the 256² widest stage"

    # fp32 at the two smaller stages (fp32 slabs at N=16k exceed VMEM — the
    # UNet gates the fused kernel to bf16 on TPU for exactly that reason);
    # bf16 at the production 128² stage with compute-dtype tolerance, plus
    # the 256² second stage (N=16384, C=128 — the widest shape the VMEM
    # guard admits at 256²).
    for (b, n, c, dt, tf) in [
        (2, 4096, 128, jnp.float32, tol_fwd),
        (2, 1024, 256, jnp.float32, tol_fwd),
        (2, 16384, 64, jnp.bfloat16, 5e-2),
        (2, 16384, 128, jnp.bfloat16, 5e-2),
    ]:
        # Guard against a vacuous pass (see resblock below): the gate shape
        # must actually take the fused path.
        assert attn_fits_vmem(n, c), \
            f"attn_block gate shape N={n},C={c} no longer fits VMEM"
        ks = jax.random.split(rng, 8)
        rng = ks[7]
        x = jax.random.normal(ks[0], (b, n, c), jnp.float32).astype(dt)
        g_in = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
        w_qkv = jax.random.normal(ks[2], (c, 384), jnp.float32) * c**-0.5
        w_out = jax.random.normal(ks[3], (128, c), jnp.float32) * 128**-0.5
        b_out = 0.1 * jax.random.normal(ks[4], (c,), jnp.float32)
        g_out = 1.0 + 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)
        g = jax.random.normal(ks[6], (b, n, c), jnp.float32)

        fk = jax.jit(lambda *a: prenorm_linear_attention(*a, interpret=False))
        fr = jax.jit(prenorm_linear_attention_reference)
        fwd_err = _maxabs(fk(x, g_in, w_qkv, w_out, b_out, g_out),
                          fr(x, g_in, w_qkv, w_out, b_out, g_out))
        entry_ok = fwd_err <= tf
        if dt == jnp.float32:
            vjk = jax.jit(lambda x, gi, wq, wo, bo, go, g: jax.vjp(
                lambda *a: prenorm_linear_attention(*a, interpret=False),
                x, gi, wq, wo, bo, go)[1](g))
            vjr = jax.jit(lambda x, gi, wq, wo, bo, go, g: jax.vjp(
                prenorm_linear_attention_reference, x, gi, wq, wo, bo, go)[1](g))
            vjp_err = max(_maxabs(a, b) for a, b in
                          zip(vjk(x, g_in, w_qkv, w_out, b_out, g_out, g),
                              vjr(x, g_in, w_qkv, w_out, b_out, g_out, g)))
            entry_ok = entry_ok and vjp_err <= tol_vjp
        else:
            vjp_err = None  # bwd is the jnp reference itself — nothing compiled
        name = f"attn_block[N={n},C={c},{jnp.dtype(dt).name}]"
        entry = {"fwd_max_abs_err": fwd_err, "tol_fwd": tf}
        if vjp_err is not None:
            entry.update(vjp_max_abs_err=vjp_err, tol_vjp=tol_vjp)
        entry["ok"] = entry_ok
        report["kernels"][name] = entry
        report["ok"] = report["ok"] and entry_ok
        print(f"{name}: fwd {fwd_err:.2e}" +
              (f", vjp {vjp_err:.2e}" if vjp_err is not None else "") +
              ("  OK" if entry_ok else "  FAIL"))

    # ---- fused ResnetBlock (conv3x3+GN+FiLM+SiLU x2 + residual) --------
    from tedm_tpu.ops.pallas.resblock import (
        fused_resnet_block, resnet_block_reference, uses_fused_kernel,
    )

    # one shape per UNet stage family: high-res small-C, mid, deep big-C;
    # bf16 at the production 128² shape with compute-dtype tolerance.
    for (b, hh, ww, cin, cout, dt, tf) in [
        (2, 32, 32, 128, 128, jnp.float32, tol_fwd),
        (2, 16, 16, 512, 512, jnp.float32, tol_fwd),
        (2, 64, 64, 128, 64, jnp.float32, tol_fwd),   # Cin != Cout (res_conv)
        (4, 128, 128, 64, 64, jnp.bfloat16, 5e-2),
    ]:
        ks = jax.random.split(rng, 12)
        rng = ks[11]
        x = jax.random.normal(ks[0], (b, hh, ww, cin), jnp.float32).astype(dt)
        w1 = jax.random.normal(ks[1], (3, 3, cin, cout)) * (9 * cin) ** -0.5
        b1 = 0.05 * jax.random.normal(ks[2], (cout,))
        g1 = 1.0 + 0.1 * jax.random.normal(ks[3], (cout,))
        be1 = 0.05 * jax.random.normal(ks[4], (cout,))
        w2 = jax.random.normal(ks[5], (3, 3, cout, cout)) * (9 * cout) ** -0.5
        b2 = 0.05 * jax.random.normal(ks[6], (cout,))
        g2 = 1.0 + 0.1 * jax.random.normal(ks[7], (cout,))
        be2 = 0.05 * jax.random.normal(ks[8], (cout,))
        scale = 0.1 * jax.random.normal(ks[9], (b, cout))
        shift = 0.1 * jax.random.normal(ks[10], (b, cout))
        if cin != cout:
            wres = jax.random.normal(ks[2], (cin, cout)) * cin ** -0.5
            bres = 0.05 * jax.random.normal(ks[4], (cout,))
        else:
            wres = bres = None

        # Guard against a vacuous pass: if the shape is gated out (e.g. a
        # tighter fits_vmem), fused_resnet_block would silently run the XLA
        # reference against itself and report ~0 error.
        if not uses_fused_kernel(hh, ww, cin, cout, dt, min_c=0):
            raise AssertionError(
                f"resblock gate shape {hh}x{ww} {cin}->{cout} no longer "
                "takes the fused path — gate would be vacuous")
        fk = jax.jit(lambda x, s, sh: fused_resnet_block(
            x, w1, b1, g1, be1, s, sh, w2, b2, g2, be2, wres, bres,
            interpret=False, min_c=0))
        fr = jax.jit(lambda x, s, sh: resnet_block_reference(
            x, w1, b1, g1, be1, s, sh, w2, b2, g2, be2, wres, bres))
        fwd_err = _maxabs(fk(x, scale, shift), fr(x, scale, shift))
        name = f"resblock[{hh}x{ww} {cin}->{cout},{jnp.dtype(dt).name}]"
        entry = {"fwd_max_abs_err": fwd_err, "tol_fwd": tf, "ok": fwd_err <= tf}
        report["kernels"][name] = entry
        report["ok"] = report["ok"] and entry["ok"]
        print(f"{name}: fwd {fwd_err:.2e}" + ("  OK" if entry["ok"] else "  FAIL"))

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}: {'OK' if report['ok'] else 'FAIL'}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
