"""Fused GroupNorm+FiLM+SiLU kernel: parity with the unfused composition
(flax nn.GroupNorm -> FiLM -> SiLU, as the reference's Block,
models/unet_model.py:119-135), forward and gradients, compiled-kernel
semantics via interpret mode."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.ops.pallas.groupnorm import (
    fused_group_norm_film_silu,
    fused_group_norm_film_silu_interpret,
)


def _unfused(x, gamma, beta, scale, shift, groups=8, eps=1e-5):
    g = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    out = g.apply({"params": {"scale": gamma, "bias": beta}}, x)
    if scale is not None:
        out = out * (scale[:, None, None, :] + 1.0) + shift[:, None, None, :]
    return nn.silu(out).astype(x.dtype)


def _rand(key, b=2, h=16, w=16, c=32):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32) * 2.0 + 0.3
    gamma = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.1
    scale = jax.random.normal(ks[3], (b, c)) * 0.3
    shift = jax.random.normal(ks[4], (b, c)) * 0.3
    return x, gamma, beta, scale, shift


@pytest.mark.parametrize("film", [True, False])
@pytest.mark.parametrize("shape", [(2, 16, 16, 32), (1, 8, 8, 64), (3, 4, 12, 16)])
def test_jnp_path_matches_flax_groupnorm(shape, film):
    b, h, w, c = shape
    x, gamma, beta, scale, shift = _rand(jax.random.PRNGKey(0), b, h, w, c)
    if not film:
        scale = shift = None
    got = fused_group_norm_film_silu(x, gamma, beta, scale, shift, groups=8)
    ref = _unfused(x, gamma, beta, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("film", [True, False])
def test_pallas_kernel_interpret_matches(film):
    x, gamma, beta, scale, shift = _rand(jax.random.PRNGKey(1))
    if not film:
        scale = shift = None
    got = fused_group_norm_film_silu_interpret(x, gamma, beta, scale, shift)
    ref = _unfused(x, gamma, beta, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_kernel_bf16_interpret():
    x, gamma, beta, scale, shift = _rand(jax.random.PRNGKey(2))
    xb = x.astype(jnp.bfloat16)
    got = fused_group_norm_film_silu_interpret(xb, gamma, beta, scale, shift)
    assert got.dtype == jnp.bfloat16
    ref = _unfused(xb, gamma, beta, scale, shift)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


def test_odd_shapes_fall_back_not_crash():
    """H*W not divisible by 8 (or C % groups != 0) must fall back to the
    jnp reference in BOTH public entries, never ZeroDivisionError."""
    x = jnp.ones((1, 3, 5, 8))
    g, b = jnp.ones((8,)), jnp.zeros((8,))
    ref = _unfused(x, g, b, None, None)
    for fn in (fused_group_norm_film_silu, fused_group_norm_film_silu_interpret):
        out = fn(x, g, b, groups=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # C not divisible by groups
    x9 = jnp.ones((1, 8, 8, 9))
    out = fused_group_norm_film_silu_interpret(
        x9, jnp.ones((9,)), jnp.zeros((9,)), groups=3
    )
    assert np.isfinite(np.asarray(out)).all()


def test_vmem_fit_guard_calibration():
    """Pin gn_fits_vmem against the on-chip calibration (r3): at 256²
    C=64 bf16 the compiler demanded 64.01 MB for the 8 MB slab (8x) and
    failed the 64 MB limit by 8 KB — that shape MUST fall back; every
    shape the 128² UNet pass uses, and the C>=128 stages of a 256² pass,
    MUST stay on the kernel."""
    from tedm_tpu.ops.pallas.groupnorm import gn_fits_vmem

    # 128² UNet forward stages (N = H*W at each resolution), bf16 + fp32
    for itemsize in (2, 4):
        assert gn_fits_vmem(128 * 128, 64, itemsize)
        assert gn_fits_vmem(64 * 64, 128, itemsize)
        assert gn_fits_vmem(32 * 32, 256, itemsize)
        assert gn_fits_vmem(16 * 16, 512, itemsize)
    # the shape that OOMed scoped vmem on-chip (by 8 KB at a 64 MB limit)
    assert not gn_fits_vmem(256 * 256, 64, 2)
    assert not gn_fits_vmem(256 * 256, 64, 4)
    # 256² C>=128 stages still fit in bf16
    assert gn_fits_vmem(128 * 128, 128, 2)
    assert gn_fits_vmem(64 * 64, 256, 2)


def test_vmem_guard_dispatches_to_reference():
    """A gated-out shape must run (via the reference path), not crash at
    trace time, on any backend."""
    from tedm_tpu.ops.pallas.groupnorm import gn_fits_vmem

    n_big = 256 * 256
    assert not gn_fits_vmem(n_big, 64, 2)
    x = jnp.ones((1, 256, 256, 8), jnp.float32)  # C=8 keeps it cheap
    g, b = jnp.ones((8,)), jnp.zeros((8,))
    out = fused_group_norm_film_silu(x, g, b, groups=8)
    ref = _unfused(x, g, b, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_custom_vjp_matches_autodiff():
    """Analytic backward == XLA autodiff of the unfused composition, for
    every input (x, gamma, beta, scale, shift)."""
    x, gamma, beta, scale, shift = _rand(jax.random.PRNGKey(3))

    def loss_fused(args):
        out = fused_group_norm_film_silu_interpret(*args)
        return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

    def loss_ref(args):
        out = _unfused(*args)
        return jnp.sum(out * jnp.cos(out))

    args = (x, gamma, beta, scale, shift)
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for a, b, name in zip(g_fused, g_ref, "x gamma beta scale shift".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_unet_param_tree_unchanged():
    """GNFilmSiLU must keep nn.GroupNorm's param names/shapes (checkpoint +
    torch-port compatibility) and the 36M golden count at full size is
    pinned elsewhere; here: tiny model tree equality across use_pallas."""
    from tedm_tpu.models.unet import Unet

    def tree(use_pallas, use_pallas_gn):
        u = Unet(dim=8, dim_mults=(1, 2), channels=1, use_pallas=use_pallas,
                 use_pallas_groupnorm=use_pallas_gn)
        v = jax.eval_shape(
            u.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32),
        )
        return jax.tree_util.tree_map(lambda s: (s.shape, str(s.dtype)), v)

    assert tree(False, False) == tree(True, True) == tree(True, False)
    # and norm params keep the flax GroupNorm names
    u = Unet(dim=8, dim_mults=(1, 2), channels=1)
    p = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
               jnp.zeros((1,), jnp.int32))["params"]
    norm = p["mid_block1"]["block1"]["norm"]
    assert set(norm) == {"scale", "bias"}
    assert norm["scale"].shape == (16,) and norm["bias"].shape == (16,)


def test_linear_attention_nhwc_layout_matches():
    """The 'nhwc' (transpose-free) einsum layout computes the same linear
    attention as the reference 'heads_major' layout."""
    from tedm_tpu.models.unet import LinearAttention

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 32))
    m0 = LinearAttention(32, layout="heads_major")
    params = m0.init(jax.random.PRNGKey(7), x)["params"]
    y0 = m0.apply({"params": params}, x)
    y1 = LinearAttention(32, layout="nhwc").apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_unet_forward_same_with_and_without_fusion():
    """On CPU use_pallas falls back to the jnp reference — outputs must
    match the unfused model closely (same params)."""
    from tedm_tpu.models.unet import Unet

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    u0 = Unet(dim=8, dim_mults=(1, 2), channels=1, use_pallas=False)
    params = u0.init(jax.random.PRNGKey(5), x, t)["params"]
    y0 = u0.apply({"params": params}, x, t)
    y1 = Unet(dim=8, dim_mults=(1, 2), channels=1, use_pallas=True,
              use_pallas_groupnorm=True).apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
