"""Flash cosine attention kernel vs the jnp reference (mid Attention math,
reference models/unet_model.py:213-241), incl. multi-block and VJP paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.ops.pallas.flash_attention import (
    cosine_attention_reference,
    flash_cosine_attention_interpret,
    _flash_bhdn,
)

SCALE = 16.0


def _qkv(key, shape):
    kq, kk, kv = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in (kq, kk, kv))


@pytest.mark.parametrize("n", [256, 1024])  # single-block and multi-block (block=512)
def test_forward_matches_reference(n):
    q, k, v = _qkv(jax.random.PRNGKey(0), (1, 2, n, 32))
    ref = cosine_attention_reference(
        q.reshape(2, n, 32), k.reshape(2, n, 32), v.reshape(2, n, 32), SCALE
    ).reshape(1, 2, n, 32)
    out = flash_cosine_attention_interpret(q, k, v, SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_vjp_matches_reference():
    # kernel layout (BH, d, N)
    q, k, v = _qkv(jax.random.PRNGKey(1), (2, 32, 256))

    def f_pal(q, k, v):
        return jnp.sum(jnp.tanh(_flash_bhdn(q, k, v, SCALE, True)))

    def f_ref(q, k, v):
        t = lambda x: x.transpose(0, 2, 1)
        return jnp.sum(jnp.tanh(t(cosine_attention_reference(t(q), t(k), t(v), SCALE))))

    gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
