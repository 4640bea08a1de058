"""One-off: GroupNorm+FiLM+SiLU strategy shootout on the real chip.

Per-iteration cost of (a) XLA reduce-based stats (current), (b) MXU
matmul-based stats (xT x diag + ones matvec), (c) the fused Pallas kernel —
each as carry = f(carry) inside one jitted fori_loop (100 iters) so
dispatch overhead and cross-iteration fusion are excluded. Sizes = the four
UNet stages at batch 8.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp


def gn_reduce(x, gamma, beta, scale, shift, groups=8, eps=1e-5):
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    xg = xf.reshape(*x.shape[:-1], groups, c // groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(xf.shape) * gamma + beta
    out = out * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
    return jax.nn.silu(out).astype(x.dtype)


def gn_matmul(x, gamma, beta, scale, shift, groups=8, eps=1e-5):
    b, h, w, c = x.shape
    n = h * w
    cg = c // groups
    xr = x.reshape(b, n, c)
    ones = jnp.ones((b, n), x.dtype)
    s = jnp.einsum("bnc,bn->bc", xr, ones, preferred_element_type=jnp.float32)
    q = jnp.einsum("bnc,bnd->bcd", xr, xr, preferred_element_type=jnp.float32)
    qd = jnp.diagonal(q, axis1=1, axis2=2)  # (b, c) sum of squares
    s_g = s.reshape(b, groups, cg).sum(-1)
    q_g = qd.reshape(b, groups, cg).sum(-1)
    cnt = n * cg
    mean = s_g / cnt
    var = jnp.maximum(q_g / cnt - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    a = rstd_c * gamma * (scale + 1.0)
    bias = (beta - mean_c * rstd_c * gamma) * (scale + 1.0) + shift
    y = x.astype(jnp.float32) * a[:, None, None, :] + bias[:, None, None, :]
    return jax.nn.silu(y).astype(x.dtype)


def gn_pallas(x, gamma, beta, scale, shift, groups=8, eps=1e-5):
    from tedm_tpu.ops.pallas.groupnorm import fused_group_norm_film_silu

    return fused_group_norm_film_silu(x, gamma, beta, scale, shift,
                                      groups=groups, eps=eps)


def bench(fn, x, gamma, beta, scale, shift, iters=100):
    @jax.jit
    def run(x0):
        def body(i, xc):
            return fn(xc, gamma, beta, scale, shift)
        return jax.lax.fori_loop(0, iters, body, x0)

    run(x).block_until_ready()
    t0 = time.perf_counter()
    run(x).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(0)
    total = {"reduce": 0.0, "matmul": 0.0, "pallas": 0.0}
    for (hw, c) in [(128, 64), (64, 128), (32, 256), (16, 512)]:
        x = jax.random.normal(key, (8, hw, hw, c), dtype)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        scale = jnp.zeros((8, c), jnp.float32)
        shift = jnp.zeros((8, c), jnp.float32)
        row = []
        for name, fn in [("reduce", gn_reduce), ("matmul", gn_matmul),
                         ("pallas", gn_pallas)]:
            dt = bench(fn, x, gamma, beta, scale, shift)
            total[name] += dt
            row.append(f"{name} {dt*1e6:7.1f} us")
        print(f"({hw}x{hw}, C={c}): " + " | ".join(row), flush=True)
    print("sum over stages:", {k: f"{v*1e6:.0f} us" for k, v in total.items()})


if __name__ == "__main__":
    main()
