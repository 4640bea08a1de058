"""Pallas fused linear attention vs the jnp reference path (SURVEY §2 C3:
reference models/unet_model.py:178-210). Runs the kernel through the Pallas
interpreter on CPU; on TPU the same test exercises the compiled kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tedm_tpu.ops.pallas.linear_attention import (
    linear_attention_interpret,
    linear_attention_reference,
    _linear_attention_bhdn,
)

SCALE = 32**-0.5


def _qkv(key, shape):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, shape, jnp.float32),
        jax.random.normal(kk, shape, jnp.float32),
        jax.random.normal(kv, shape, jnp.float32),
    )


@pytest.mark.parametrize("n", [256, 1024])
def test_forward_matches_reference(n):
    q, k, v = _qkv(jax.random.PRNGKey(0), (2, 4, 32, n))
    out_ref = linear_attention_reference(q, k, v, SCALE)
    out_pal = linear_attention_interpret(q, k, v, SCALE)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-5, rtol=1e-5)


def test_vjp_matches_reference():
    q, k, v = _qkv(jax.random.PRNGKey(1), (1, 2, 32, 256))
    flat = lambda t: t.reshape(2, 32, 256)
    qf, kf, vf = flat(q), flat(k), flat(v)

    def f_pal(q, k, v):
        return jnp.sum(jnp.sin(_linear_attention_bhdn(q, k, v, SCALE, True)))

    def f_ref(q, k, v):
        out = linear_attention_reference(
            q[None].transpose(1, 0, 2, 3), k[None].transpose(1, 0, 2, 3),
            v[None].transpose(1, 0, 2, 3), SCALE,
        )
        return jnp.sum(jnp.sin(out))

    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(qf, kf, vf)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
