"""Data-parallel corpus encode: mesh-sharded batches == single device."""

import numpy as np

from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh
from rag_dpo_tpu.providers import Embedder, EmbedderConfig


def test_dp_encode_matches_single(eight_devices):
    mesh = create_mesh(MeshSpec(data=8, model=1, shard=1))
    cfg = EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=16,
    )
    single = Embedder(cfg)
    params = single.load()
    sharded = Embedder(cfg, params=params, mesh=mesh)

    texts = [f"document numéro {i} sur la protection des données "
             f"personnelles et la conformité" for i in range(11)]
    ref = single.embed(texts)["dense"]
    out = sharded.embed(texts)["dense"]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # queries too
    q_ref = single.embed_queries(["violation de données"])
    q_out = sharded.embed_queries(["violation de données"])
    np.testing.assert_allclose(q_out, q_ref, atol=1e-5, rtol=1e-5)
