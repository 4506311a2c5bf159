import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.flash_attention import attention_reference, flash_attention


def _qkv(b, h, s, dh, seed=0):
    rng = np.random.default_rng(seed)
    shape = (b, h, s, dh)
    return (
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
        jnp.asarray(rng.standard_normal(shape), jnp.float32),
    )


@pytest.mark.parametrize("b,h,s,dh,bq,bk", [
    (2, 4, 256, 64, 128, 128),
    (1, 2, 200, 64, 128, 64),   # ragged seq → padding path
    (2, 1, 512, 128, 256, 256),
])
def test_flash_matches_reference(b, h, s, dh, bq, bk):
    q, k, v = _qkv(b, h, s, dh, seed=s)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_padding_mask():
    b, h, s, dh = 3, 2, 256, 64
    q, k, v = _qkv(b, h, s, dh, seed=1)
    lengths = jnp.asarray([256, 100, 1], jnp.int32)
    ref = attention_reference(q, k, v, lengths)
    out = flash_attention(q, k, v, lengths, block_q=128, block_k=128)
    # compare only valid query rows (padding-row outputs are unspecified)
    for i, L in enumerate([256, 100, 1]):
        np.testing.assert_allclose(
            np.asarray(out)[i, :, :L], np.asarray(ref)[i, :, :L],
            atol=2e-5, rtol=2e-5,
        )


def test_trainable_flash_gradients_match_reference():
    import jax

    from rag_dpo_tpu.ops.flash_attention import flash_attention_trainable

    q, k, v = _qkv(2, 2, 128, 32, seed=5)
    lengths = jnp.asarray([128, 100], jnp.int32)

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, lengths)
        mask = (jnp.arange(128)[None, :] < lengths[:, None])
        return jnp.sum(jnp.square(out) * mask[:, None, :, None])

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, lengths)
        mask = (jnp.arange(128)[None, :] < lengths[:, None])
        return jnp.sum(jnp.square(out) * mask[:, None, :, None])

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-3, rtol=2e-3)


def test_flash_bf16():
    q, k, v = _qkv(1, 2, 128, 64, seed=2)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attention_reference(q, k, v)
    out = flash_attention(qb, kb, vb, block_q=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=2e-2
    )
