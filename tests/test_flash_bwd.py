"""Fused Pallas flash backward: output and gradient parity vs oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.flash_attention import attention_reference
from rag_dpo_tpu.ops.flash_attention_bwd import flash_attention_fused


def _qkv(b, h, s, dh, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, s, dh)
    return tuple(
        jnp.asarray(rng.standard_normal(shape), jnp.float32)
        for _ in range(3)
    )


@pytest.mark.parametrize("b,h,s,dh,bq,bk", [
    (2, 2, 128, 64, 64, 64),
    (1, 4, 200, 32, 128, 64),   # ragged → padding path
])
def test_fused_forward_matches(b, h, s, dh, bq, bk):
    q, k, v = _qkv(b, h, s, dh, seed=s)
    ref = attention_reference(q, k, v)
    out = flash_attention_fused(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("lengths", [None, (128, 70)])
def test_fused_gradients_match_reference(lengths):
    b, h, s, dh = 2, 2, 128, 32
    q, k, v = _qkv(b, h, s, dh, seed=3)
    lens = (jnp.asarray(lengths, jnp.int32) if lengths
            else jnp.full((b,), s, jnp.int32))
    mask = (jnp.arange(s)[None, :] < lens[:, None])[:, None, :, None]

    def loss_fused(q, k, v):
        out = flash_attention_fused(q, k, v, lens, block_q=64,
                                    block_k=64)
        return jnp.sum(jnp.square(out) * mask)

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, lens)
        return jnp.sum(jnp.square(out) * mask)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_fused_grad_under_jit_and_vmap_composition():
    b, h, s, dh = 1, 2, 64, 32
    q, k, v = _qkv(b, h, s, dh, seed=4)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(flash_attention_fused(q, k, v, block_q=64,
                                             block_k=64) ** 2)

    g = jax.grad(loss)(q, k, v)
    assert np.isfinite(np.asarray(g)).all()
