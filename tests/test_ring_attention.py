import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.flash_attention import attention_reference
from rag_dpo_tpu.ops.ring_attention import make_ring_attention
from rag_dpo_tpu.parallel import MeshSpec, create_mesh


@pytest.mark.parametrize("b,h,s,dh", [(2, 2, 256, 32), (1, 4, 512, 64)])
def test_ring_matches_reference(eight_devices, b, h, s, dh):
    mesh = create_mesh(MeshSpec(shard=8))
    rng = np.random.default_rng(s)
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    ref = attention_reference(q, k, v)
    ring = make_ring_attention(mesh)
    out = ring(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_memory_is_sharded(eight_devices):
    """The point of ring attention: per-device KV slice, not full KV."""
    mesh = create_mesh(MeshSpec(shard=8))
    s = 1024
    q = jnp.ones((1, 1, s, 32), jnp.float32)
    ring = make_ring_attention(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = jax.device_put(
        q, NamedSharding(mesh, P(None, None, "shard", None))
    )
    out = ring(sharded, sharded, sharded)
    # output keeps the sequence sharding
    assert out.sharding.spec == P(None, None, "shard", None)


def test_encoder_context_parallel_matches_single_chip(eight_devices):
    """Full TransformerEncoder with attention_impl='ring' under a
    context_parallel scope == the single-chip reference encoder."""
    import dataclasses

    from rag_dpo_tpu.models.encoder import EncoderConfig, TransformerEncoder
    from rag_dpo_tpu.parallel import context_parallel

    mesh = create_mesh(MeshSpec(shard=8))
    base = EncoderConfig.tiny(use_flash_attention=False,
                              max_position_embeddings=130)
    ring_cfg = dataclasses.replace(base, attention_impl="ring")
    rng = np.random.default_rng(7)
    b, s = 2, 64  # full-length batch (ring path has no ragged masking)
    ids = jnp.asarray(rng.integers(4, base.vocab_size, (b, s)), jnp.int32)
    lengths = jnp.full((b,), s, jnp.int32)

    ref_model = TransformerEncoder(base)
    params = ref_model.init(jax.random.key(0), ids, lengths)
    ref = ref_model.apply(params, ids, lengths)

    ring_model = TransformerEncoder(ring_cfg)
    with context_parallel(mesh):
        out = ring_model.apply(params, ids, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_encoder_ring_without_scope_raises(eight_devices):
    import dataclasses

    from rag_dpo_tpu.models.encoder import EncoderConfig, TransformerEncoder

    cfg = dataclasses.replace(
        EncoderConfig.tiny(use_flash_attention=False,
                           max_position_embeddings=130),
        attention_impl="ring")
    model = TransformerEncoder(cfg)
    ids = jnp.zeros((1, 64), jnp.int32)
    lengths = jnp.full((1,), 64, jnp.int32)
    with pytest.raises(RuntimeError, match="context_parallel"):
        model.init(jax.random.key(0), ids, lengths)


def test_ring_ragged_lengths_match_reference(eight_devices):
    """Padded keys must be masked identically to the single-chip
    reference — including padding that spans whole ring devices."""
    mesh = create_mesh(MeshSpec(shard=8))
    rng = np.random.default_rng(11)
    b, h, s, dh = 3, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    # 100: cuts inside device 3; 32: exactly one device; 256: full
    lengths = jnp.asarray([100, 32, 256], jnp.int32)
    ref = attention_reference(q, k, v, lengths)
    ring = make_ring_attention(mesh)
    out = ring(q, k, v, lengths)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    for i, ln in enumerate([100, 32, 256]):
        np.testing.assert_allclose(out_np[i, :, :ln], ref_np[i, :, :ln],
                                   atol=2e-5, rtol=2e-5)
        assert np.isfinite(out_np[i]).all()


def test_encoder_context_parallel_ragged_matches_single_chip(
        eight_devices):
    import dataclasses

    from rag_dpo_tpu.models.encoder import (
        EncoderConfig,
        TransformerEncoder,
    )
    from rag_dpo_tpu.parallel import context_parallel

    mesh = create_mesh(MeshSpec(shard=8))
    base = EncoderConfig.tiny(use_flash_attention=False,
                              max_position_embeddings=130)
    ring_cfg = dataclasses.replace(base, attention_impl="ring")
    rng = np.random.default_rng(13)
    b, s = 2, 64
    ids = jnp.asarray(rng.integers(4, base.vocab_size, (b, s)), jnp.int32)
    lengths = jnp.asarray([40, 64], jnp.int32)  # ragged

    ref_model = TransformerEncoder(base)
    params = ref_model.init(jax.random.key(0), ids, lengths)
    ref = np.asarray(ref_model.apply(params, ids, lengths))

    ring_model = TransformerEncoder(ring_cfg)
    with context_parallel(mesh):
        out = np.asarray(ring_model.apply(params, ids, lengths))
    np.testing.assert_allclose(out[0, :40], ref[0, :40],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(out[1], ref[1], atol=2e-4, rtol=2e-4)
