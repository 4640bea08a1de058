"""CL models and losses (reference: models/global_local_cl.py,
trainers/train_global_cl.py:36-44, trainers/train_local_cl.py:36-77)."""

import jax
import jax.numpy as jnp
import numpy as np

from tedm_tpu.models.contrastive import (
    GlobalCL,
    LocalCL,
    global_nt_xent,
    local_region_loss,
)
from tedm_tpu.ops.augment import augment_and_concat, crop_batch


def test_global_nt_xent_identical_views_minimizes():
    """Identical positive pairs => positive term dominates; loss should be
    lower than for random pairs."""
    k = jax.random.PRNGKey(0)
    f = jax.random.normal(k, (4, 16))
    same = jnp.concatenate([f, f], axis=0)
    rand = jnp.concatenate([f, jax.random.normal(jax.random.PRNGKey(1), (4, 16))], axis=0)
    l_same = float(global_nt_xent(same, 4, 0.1))
    l_rand = float(global_nt_xent(rand, 4, 0.1))
    assert l_same < l_rand


def test_global_nt_xent_matches_manual():
    f = jax.random.normal(jax.random.PRNGKey(2), (6, 8))
    b, tau = 3, 0.5
    fn = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    sim = np.exp(np.asarray(fn @ fn.T) / tau)
    p1 = np.diagonal(sim[:b, b:]); n1 = sim[:b].sum(-1) - np.diagonal(sim[:b, :b])
    p2 = np.diagonal(sim[b:, :b]); n2 = sim[b:].sum(-1) - np.diagonal(sim[b:, b:])
    manual = (-np.log(p1 / n1).mean() - np.log(p2 / n2).mean()) / 2
    np.testing.assert_allclose(float(global_nt_xent(f, b, tau)), manual, rtol=1e-5)


def test_local_region_loss_finite_and_prefers_identical_views():
    k = jax.random.PRNGKey(3)
    f = jax.random.normal(k, (4, 16, 16, 8))  # (2B, H, W, C), B=2
    same = jnp.concatenate([f[:2], f[:2]], axis=0)
    l_same = float(local_region_loss(jax.random.PRNGKey(0), same, 2, 0.1, n_regions=5))
    l_rand = float(local_region_loss(jax.random.PRNGKey(0), f, 2, 0.1, n_regions=5))
    assert np.isfinite(l_same) and np.isfinite(l_rand)
    assert l_same < l_rand


def test_crop_batch_shapes_and_mask_binary():
    k = jax.random.PRNGKey(4)
    imgs = jax.random.uniform(k, (3, 128, 128, 1))
    masks = (jax.random.uniform(jax.random.PRNGKey(5), (3, 128, 128, 1)) > 0.5).astype(jnp.float32)
    ci, cm = crop_batch(k, imgs, masks)
    assert ci.shape == imgs.shape and cm.shape == masks.shape
    assert set(np.unique(np.asarray(cm))) <= {0.0, 1.0}


def test_augment_and_concat_two_distinct_views():
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 128, 128, 1))
    v = augment_and_concat(jax.random.PRNGKey(7), x)
    assert v.shape == (4, 128, 128, 1)
    assert not np.allclose(np.asarray(v[:2]), np.asarray(v[2:]))


def test_cl_models_shapes():
    g = GlobalCL(img_size=32, dim=8, dim_mults=(1, 2), channels=1)
    x = jnp.zeros((2, 32, 32, 1))
    gv = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(gv, x)
    assert out.shape == (2, 128)

    l = LocalCL(img_size=32, dim=8, dim_mults=(1, 2), channels=1, l=1)
    lv = l.init(jax.random.PRNGKey(0), x, train=False)
    out = l.apply(lv, x, train=False)
    # one up stage from 16² mid -> 32², channels = dims[-2] = 8
    assert out.shape == (2, 32, 32, 8)


def test_cl_heads_torch_matched_init():
    """CL heads (g1 MLP, g2 convs) must ship the torch-default kernel init
    (uniform, variance 1/(3*fan_in)) like the UNet — reference heads are
    plain nn.Linear/nn.Conv2d (models/global_local_cl.py:29-66); round 2
    measured flax's lecun_normal 3x variance harmful at low n."""
    g = GlobalCL(img_size=32, dim=8, dim_mults=(1, 2), channels=1)
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 1)))
    for name in ("g1_fc1", "g1_fc2"):
        w = np.asarray(gv["params"][name]["kernel"])
        fi = w.shape[0]
        b = np.sqrt(1.0 / fi)
        assert np.abs(w).max() <= b + 1e-6, name
        np.testing.assert_allclose(w.var(), 1.0 / (3.0 * fi), rtol=0.15, err_msg=name)

    l = LocalCL(img_size=32, dim=8, dim_mults=(1, 2), channels=1, l=1)
    lv = l.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 1)), train=False)
    for name in ("g2_conv1", "g2_conv2"):
        w = np.asarray(lv["params"][name]["kernel"])
        fi = int(np.prod(w.shape[:-1]))
        b = np.sqrt(1.0 / fi)
        assert np.abs(w).max() <= b + 1e-6, name
        np.testing.assert_allclose(w.var(), 1.0 / (3.0 * fi), rtol=0.5, err_msg=name)
