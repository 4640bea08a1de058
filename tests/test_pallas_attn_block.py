"""Fused PreNorm linear-attention block: kernel vs reference vs the unfused
module chain (SURVEY §2 C3: reference models/unet_model.py:29-36, 178-210).

Three contracts:
1. The Pallas kernel (interpreter on CPU; compiled on TPU) matches the jnp
   reference it was derived from, tightly.
2. The reference matches the UNFUSED flax module composition
   (ChanLayerNorm -> Conv1x1 -> softmaxes/einsums -> Conv1x1 -> ChanLayerNorm
   -> residual) at compute-dtype tolerance — the kernel normalizes the
   context after its matmul, the module chain before, so they differ at
   rounding level only.
3. The fused path inside the UNet (PreNormAttn + LinearAttention with
   use_pallas=True) is parameter-tree-identical to the unfused path and
   produces the same output, and its gradients match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.models.unet import LinearAttention, PreNormAttn
from tedm_tpu.ops.pallas.attn_block import (
    prenorm_linear_attention_interpret,
    prenorm_linear_attention_reference,
)


def _inputs(key, b, n, c, hidden=128):
    ks = jax.random.split(key, 6)
    return dict(
        x=jax.random.normal(ks[0], (b, n, c), jnp.float32),
        g_in=1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32),
        w_qkv=jax.random.normal(ks[2], (c, 3 * hidden), jnp.float32) * c**-0.5,
        w_out=jax.random.normal(ks[3], (hidden, c), jnp.float32) * hidden**-0.5,
        b_out=0.1 * jax.random.normal(ks[4], (c,), jnp.float32),
        g_out=1.0 + 0.1 * jax.random.normal(ks[5], (c,), jnp.float32),
    )


@pytest.mark.parametrize("n,c", [(256, 64), (64, 128)])
def test_kernel_matches_reference(n, c):
    inp = _inputs(jax.random.PRNGKey(0), 2, n, c)
    ref = prenorm_linear_attention_reference(**inp)
    pal = prenorm_linear_attention_interpret(**inp)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_fused_path_matches_unfused_module():
    """Same params, same input: fused (use_pallas=True -> reference fallback
    on CPU) vs unfused module chain; and identical param trees."""
    b, h, w, c = 2, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c), jnp.float32)

    unfused = PreNormAttn(c, LinearAttention(c, use_pallas=False), jnp.float32)
    fused = PreNormAttn(c, LinearAttention(c, use_pallas=True), jnp.float32)

    params = unfused.init(jax.random.PRNGKey(2), x)["params"]
    params_f = fused.init(jax.random.PRNGKey(2), x)["params"]

    flat_u = jax.tree_util.tree_map(np.asarray, params)
    flat_f = jax.tree_util.tree_map(np.asarray, params_f)
    pu = jax.tree_util.tree_flatten_with_path(flat_u)[0]
    pf = jax.tree_util.tree_flatten_with_path(flat_f)[0]
    assert [k for k, _ in pu] == [k for k, _ in pf]
    for (ku, vu), (kf, vf) in zip(pu, pf):
        np.testing.assert_array_equal(vu, vf, err_msg=str(ku))

    out_u = unfused.apply({"params": params}, x)
    out_f = fused.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=5e-5, rtol=1e-4
    )


def test_fused_path_gradients_match_unfused():
    b, h, w, c = 2, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, c), jnp.float32)
    unfused = PreNormAttn(c, LinearAttention(c, use_pallas=False), jnp.float32)
    fused = PreNormAttn(c, LinearAttention(c, use_pallas=True), jnp.float32)
    params = unfused.init(jax.random.PRNGKey(4), x)["params"]

    def loss(mod, p, x):
        return jnp.sum(jnp.sin(mod.apply({"params": p}, x)))

    gu, gxu = jax.grad(lambda p, x: loss(unfused, p, x), argnums=(0, 1))(params, x)
    gf, gxf = jax.grad(lambda p, x: loss(fused, p, x), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gxf), np.asarray(gxu), atol=1e-4, rtol=1e-3)
    for (ku, vu), (kf, vf) in zip(
        jax.tree_util.tree_flatten_with_path(gu)[0],
        jax.tree_util.tree_flatten_with_path(gf)[0],
    ):
        assert ku == kf
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vu), atol=1e-4, rtol=1e-3, err_msg=str(ku)
        )


def test_bf16_paths_close():
    """bf16 compute dtype (the sampling configuration): fused vs unfused
    within bf16 rounding noise."""
    b, h, w, c = 2, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, c), jnp.float32).astype(jnp.bfloat16)
    unfused = PreNormAttn(c, LinearAttention(c, dtype=jnp.bfloat16, use_pallas=False), jnp.bfloat16)
    fused = PreNormAttn(c, LinearAttention(c, dtype=jnp.bfloat16, use_pallas=True), jnp.bfloat16)
    params = unfused.init(jax.random.PRNGKey(6), x)["params"]
    out_u = unfused.apply({"params": params}, x).astype(jnp.float32)
    out_f = fused.apply({"params": params}, x).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), atol=0.08, rtol=0.05)


def test_vmem_fit_gate():
    """Per-shape VMEM dispatch (VERDICT r2 #5): the 128² stages fit, the
    256² widest stage (N=65536) does not and must fall back to the
    reference path even when the compiled kernel is requested."""
    from tedm_tpu.ops.pallas.attn_block import (
        fits_vmem, prenorm_linear_attention, prenorm_linear_attention_reference,
    )

    # every 128² UNet stage fits (the shipping default since round 2)
    for n, c in [(16384, 64), (4096, 128), (1024, 256), (256, 512)]:
        assert fits_vmem(n, c)
    assert fits_vmem(16384, 128)       # 256²'s second stage: newly admitted
    assert not fits_vmem(65536, 64)    # 256²'s widest stage: gated out

    # A gated-out shape dispatches to the reference even with
    # interpret=False — on CPU this would otherwise crash in pallas_call.
    # (dim_head=512 makes a small-N shape exceed the budget.)
    b, n, c, hidden = 1, 2048, 64, 4 * 512
    assert not fits_vmem(n, c, heads=4, dim_head=512)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, n, c), jnp.float32)
    g_in = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    w_qkv = jax.random.normal(ks[2], (c, 3 * hidden)) * c**-0.5
    w_out = jax.random.normal(ks[3], (hidden, c)) * hidden**-0.5
    b_out = 0.1 * jax.random.normal(ks[4], (c,))
    g_out = 1.0 + 0.1 * jax.random.normal(ks[5], (c,))
    got = prenorm_linear_attention(
        x, g_in, w_qkv, w_out, b_out, g_out, heads=4, dim_head=512,
        interpret=False)
    ref = prenorm_linear_attention_reference(
        x, g_in, w_qkv, w_out, b_out, g_out, heads=4, dim_head=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
