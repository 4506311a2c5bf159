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
