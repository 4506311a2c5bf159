"""Tensor-parallel decoder: sharded generate matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
from rag_dpo_tpu.models.sharding import param_shardings, shard_params
from rag_dpo_tpu.parallel import MeshSpec, create_mesh


def test_tp_sharded_forward_matches(eight_devices):
    mesh = create_mesh(MeshSpec(data=1, model=8, shard=1))
    cfg = DecoderConfig.tiny(num_heads=8, num_kv_heads=8, hidden_size=64,
                             dtype=jnp.float32)
    model = DecoderModel(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(3, 512, (2, 12)), jnp.int32)
    params = model.init(jax.random.key(0), ids)
    ref = model.apply(params, ids)

    sharded_params = shard_params(params, mesh)
    # q/k/v kernels must actually be sharded over the model axis
    qkern = sharded_params["params"]["layer_0"]["attention"]["q_proj"][
        "kernel"]
    assert "model" in str(qkern.sharding.spec)

    out = jax.jit(model.apply)(sharded_params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_sharded_generation_matches(eight_devices):
    """Full prefill+decode with TP-sharded params == single-device."""
    from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator

    mesh = create_mesh(MeshSpec(data=1, model=2, shard=1))
    cfg = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                             dtype=jnp.float32)
    gen = TextGenerator(cfg)
    params = gen.load()
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 512, (2, 10)).astype(np.int32)
    lengths = np.asarray([10, 7])
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=5,
                              eos_id=-1)
    ref = gen.generate_ids(ids, lengths, sampling)

    gen2 = TextGenerator(cfg, params=shard_params(params, mesh))
    out = gen2.generate_ids(ids, lengths, sampling)
    np.testing.assert_array_equal(ref, out)
