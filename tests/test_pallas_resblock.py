"""Fused ResnetBlock Pallas kernel vs its jnp reference (interpret mode),
plus equivalence to the unfused flax module chain and gradient parity.
Reference block: models/unet_model.py:119-175."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.ops.pallas.resblock import (
    fused_resnet_block,
    fused_resnet_block_interpret,
    resnet_block_reference,
)


def _params(key, cin, cout, film=True, res=True):
    ks = jax.random.split(key, 8)
    p = dict(
        w1=jax.random.normal(ks[0], (3, 3, cin, cout)) * 0.1,
        b1=jax.random.normal(ks[1], (cout,)) * 0.05,
        g1=1.0 + 0.1 * jax.random.normal(ks[2], (cout,)),
        be1=0.05 * jax.random.normal(ks[3], (cout,)),
        w2=jax.random.normal(ks[4], (3, 3, cout, cout)) * 0.1,
        b2=jax.random.normal(ks[5], (cout,)) * 0.05,
        g2=1.0 + 0.1 * jax.random.normal(ks[6], (cout,)),
        be2=0.05 * jax.random.normal(ks[7], (cout,)),
    )
    return p


@pytest.mark.parametrize("shape,cout,film,res", [
    ((2, 8, 8, 16), 16, True, True),
    ((2, 8, 8, 16), 16, False, False),   # identity residual, no FiLM
    ((1, 16, 8, 8), 24, True, True),     # H != W, Cin != Cout
])
def test_kernel_matches_reference(shape, cout, film, res):
    b, h, w, cin = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32)
    p = _params(jax.random.PRNGKey(1), cin, cout)
    scale = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (b, cout)) if film else None
    shift = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (b, cout)) if film else None
    wres = (jax.random.normal(jax.random.PRNGKey(4), (cin, cout)) * 0.1
            if res else None)
    bres = (0.05 * jax.random.normal(jax.random.PRNGKey(5), (cout,))
            if res else None)

    want = resnet_block_reference(x, p["w1"], p["b1"], p["g1"], p["be1"],
                                  scale, shift, p["w2"], p["b2"], p["g2"],
                                  p["be2"], wres, bres)
    got = fused_resnet_block_interpret(x, p["w1"], p["b1"], p["g1"], p["be1"],
                                       scale, shift, p["w2"], p["b2"],
                                       p["g2"], p["be2"], wres, bres)
    assert got.shape == (b, h, w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_identity_residual_requires_matching_dims():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    p = _params(jax.random.PRNGKey(1), 16, 16)
    out = fused_resnet_block_interpret(
        x, p["w1"], p["b1"], p["g1"], p["be1"], None, None,
        p["w2"], p["b2"], p["g2"], p["be2"], None, None)
    # zero weights except residual path -> out == silu(gn(...)) + x; just
    # assert the identity residual actually flows
    zero = fused_resnet_block_interpret(
        jnp.zeros_like(x), p["w1"], p["b1"], p["g1"], p["be1"], None, None,
        p["w2"], p["b2"], p["g2"], p["be2"], None, None)
    diff = np.abs(np.asarray(out - zero - x))
    assert np.isfinite(np.asarray(out)).all()
    # residual contributes x exactly in the zero-input direction only if the
    # nonlinear part were linear; instead check out != nonres version
    assert diff.mean() > 0  # smoke: paths differ


def test_gradients_match_reference():
    b, h, w, cin, cout = 1, 8, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin))
    p = _params(jax.random.PRNGKey(1), cin, cout)
    scale = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (b, cout))
    shift = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (b, cout))
    wres = jax.random.normal(jax.random.PRNGKey(4), (cin, cout)) * 0.1
    bres = 0.05 * jax.random.normal(jax.random.PRNGKey(5), (cout,))

    def loss_kernel(x, w1, scale):
        out = fused_resnet_block_interpret(
            x, w1, p["b1"], p["g1"], p["be1"], scale, shift,
            p["w2"], p["b2"], p["g2"], p["be2"], wres, bres)
        return jnp.sum(out * out)

    def loss_ref(x, w1, scale):
        out = resnet_block_reference(
            x, w1, p["b1"], p["g1"], p["be1"], scale, shift,
            p["w2"], p["b2"], p["g2"], p["be2"], wres, bres)
        return jnp.sum(out * out)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, p["w1"], scale)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p["w1"], scale)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_compute_dtype():
    b, h, w, cin, cout = 2, 8, 8, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin)).astype(jnp.bfloat16)
    p = _params(jax.random.PRNGKey(1), cin, cout)
    got = fused_resnet_block_interpret(
        x, p["w1"], p["b1"], p["g1"], p["be1"], None, None,
        p["w2"], p["b2"], p["g2"], p["be2"], None, None)
    want = resnet_block_reference(
        x, p["w1"], p["b1"], p["g1"], p["be1"], None, None,
        p["w2"], p["b2"], p["g2"], p["be2"], None, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_unet_fused_resblock_param_tree_and_forward_parity():
    """use_pallas_resblock must keep the param tree IDENTICAL (same ckpts,
    same torch ports) and the fp32 forward equal to the unfused path."""
    from tedm_tpu.models.unet import Unet

    kw = dict(dim=8, dim_mults=(1, 2), channels=1)
    m0 = Unet(**kw)
    m1 = Unet(**kw, use_pallas_resblock=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    p0 = m0.init(jax.random.PRNGKey(42), x, t)
    p1 = m1.init(jax.random.PRNGKey(42), x, t)

    paths0 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_leaves_with_path(p0)}
    paths1 = {jax.tree_util.keystr(k): v.shape
              for k, v in jax.tree_util.tree_leaves_with_path(p1)}
    assert paths0 == paths1

    # same seed -> same params; forward must agree at fp32 tolerance
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o0 = m0.apply(p0, x, t)
    o1 = m1.apply(p1, x, t)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-4, atol=1e-4)

    # gradients flow through the fused path (custom VJP over the reference)
    g = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t) ** 2))(p1)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_vmem_fit_guard_calibration():
    """Pin the calibrated VMEM fit decisions (Mosaic's actual stack demand
    is ~2.5x the naive slab estimate; fp32 at 128p/64ch demanded 124.5 MB
    against the 110 MB scoped limit on-chip and must fall back, while the
    bf16 production shape and every deeper fp32 stage fit)."""
    from tedm_tpu.ops.pallas.resblock import fits_vmem

    assert not fits_vmem(128, 128, 64, 64, jnp.float32)   # measured OOM
    assert fits_vmem(128, 128, 64, 64, jnp.bfloat16)      # ran on-chip
    assert fits_vmem(64, 64, 128, 64, jnp.float32)        # gate shape
    assert fits_vmem(32, 32, 128, 128, jnp.float32)       # gate shape
    assert fits_vmem(16, 16, 512, 512, jnp.float32)       # gate shape
    assert not fits_vmem(256, 256, 64, 64, jnp.bfloat16)  # 256p falls back
