"""UNet architecture goldens (SURVEY §4): parameter count 36,245,377 at
dim=64/mults(1,2,4,8)/channels=1 (reference: models/unet_model.py:246-331),
decoder feature maps [512@16², 256@32², 128@64², 64@128²]
(reference: models/datasetDM_model.py:50-53, verified empirically)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.models.unet import Unet, count_params, l2norm


def test_param_count_golden():
    m = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    shapes = jax.eval_shape(
        m.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 128, 1)),
        jnp.zeros((1,), jnp.int32),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    assert n == 36_245_377


def test_feature_shapes_golden():
    m = Unet(dim=64, dim_mults=(1, 2, 4, 8), channels=1)
    out, feats = jax.eval_shape(
        lambda p, x, t: m.apply(p, x, t, extract_features=True),
        jax.eval_shape(
            m.init,
            jax.random.PRNGKey(0),
            jnp.zeros((2, 128, 128, 1)),
            jnp.zeros((2,), jnp.int32),
        ),
        jnp.zeros((2, 128, 128, 1)),
        jnp.zeros((2,), jnp.int32),
    )
    assert out.shape == (2, 128, 128, 1)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 512),
        (2, 32, 32, 256),
        (2, 64, 64, 128),
        (2, 128, 128, 64),
    ]
    # 960 feature channels per timestep (SURVEY §2 C5)
    assert sum(f.shape[-1] for f in feats) == 960


@pytest.fixture(scope="module")
def small_unet():
    m = Unet(dim=8, dim_mults=(1, 2), channels=1)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t)
    return m, params


def test_forward_finite_and_shape(small_unet):
    m, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    t = jnp.array([3, 7], jnp.int32)
    out = m.apply(params, x, t)
    assert out.shape == (2, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_without_time(small_unet):
    """timestep=None path (used by the CL encoders, global_local_cl.py:35)."""
    m, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    out = m.apply(params, x, None)
    assert out.shape == (1, 16, 16, 1)


def test_time_embedding_changes_output(small_unet):
    m, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 1))
    o1 = m.apply(params, x, jnp.array([1], jnp.int32))
    o2 = m.apply(params, x, jnp.array([900], jnp.int32))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_cond_is_ignored(small_unet):
    """Parity with the reference's dead cond arg (models/unet_model.py:333)."""
    m, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 1))
    t = jnp.array([5], jnp.int32)
    o1 = m.apply(params, x, t)
    o2 = m.apply(params, x, t, cond=x * 2)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_l2norm():
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(l2norm(x)), [[0.6, 0.8]], rtol=1e-6)


def test_sinusoidal_pos_emb_matches_reference_formula():
    from tedm_tpu.models.unet import SinusoidalPosEmb
    import math

    dim = 16
    t = jnp.array([0.0, 100.0])
    emb = SinusoidalPosEmb(dim)(t)
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    expected = np.concatenate(
        [np.sin(np.asarray(t)[:, None] * freqs), np.cos(np.asarray(t)[:, None] * freqs)],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-4, atol=1e-4)


def test_torch_matched_kernel_init():
    """UNet convs/denses ship the torch-default init: kaiming_uniform(a=sqrt(5))
    == uniform with variance 1/(3*fan_in), one third of flax's lecun_normal
    (torch nn.Conv2d/Linear reset_parameters). Measured decisive for low-data
    generalization — baseline n=1 on the parity corpus: 0.937 val Dice with
    lecun_normal (val loss diverging) vs 0.995 with this init, matching the
    torch reference trajectory exactly (see RESULTS_parity.md)."""
    from tedm_tpu.models.unet import _torch_kernel_init

    fan_in = 3 * 3 * 64
    k = _torch_kernel_init(jax.random.PRNGKey(0), (3, 3, 64, 128), jnp.float32)
    w = np.asarray(k)
    bound = np.sqrt(1.0 / fan_in)  # uniform(-b, b) with b = sqrt(3 * var)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.9 * bound  # actually uniform, not degenerate
    np.testing.assert_allclose(w.var(), 1.0 / (3.0 * fan_in), rtol=0.05)

    m = Unet(dim=8, dim_mults=(1, 2), channels=1)
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,), jnp.int32)
    )
    flat = jax.tree_util.tree_leaves_with_path(params)
    checked = 0
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        if "kernel" not in name or leaf.ndim < 2:
            continue
        fi = int(np.prod(leaf.shape[:-1]))
        b = np.sqrt(1.0 / fi)
        assert np.abs(np.asarray(leaf)).max() <= b + 1e-6, name
        checked += 1
    assert checked > 10


def test_use_pallas_flash_param_neutral_and_equivalent(small_unet):
    """use_pallas_flash routes the mid attention through the flash-cosine
    kernel (ops/pallas/flash_attention.py). The kernel fuses the l2norm and
    has NO parameters of its own, so the flag must (a) leave the param tree
    identical (flippable on an existing checkpoint) and (b) preserve the
    forward output (off-TPU the kernel wrapper falls back to the same
    cosine-attention math; kernel-vs-reference numerics are pinned in
    tests/test_pallas_flash_attention.py)."""
    m, params = small_unet
    mf = m.clone(use_pallas_flash=True)
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    t = jnp.array([0, 5], jnp.int32)
    pf = mf.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(params)
    y = m.apply(params, x, t)
    yf = mf.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf), atol=1e-6)


def test_remat_param_neutral_forward_and_grads(small_unet):
    """Unet.remat wraps every ResnetBlock/attention block in nn.remat so
    the backward recomputes one block at a time (the 512²+ training
    enabler — a whole-model jax.checkpoint does NOT cut peak memory; see
    docs/DESIGN.md "remat granularity"). nn.remat is a lifted transform:
    the param tree must be identical (flippable on an existing
    checkpoint), and forward AND gradients must match exactly."""
    m, params = small_unet
    mr = m.clone(remat=True)
    x = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    t = jnp.array([1, 7], jnp.int32)
    pr = mr.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(
        np.asarray(m.apply(params, x, t)),
        np.asarray(mr.apply(params, x, t)), atol=1e-6)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x, t) ** 2)

    g = jax.grad(lambda p: loss(m, p))(params)
    gr = jax.grad(lambda p: loss(mr, p))(params)
    # atol absorbs recompute float-reordering on near-zero leaves (the
    # conv proj biases feeding GroupNorms have ~1e-6 true gradients built
    # from large cancelling sums; measured reorder noise <= 2.6e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-6)
