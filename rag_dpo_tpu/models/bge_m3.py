"""BGE-M3-style multi-representation embedder in Flax.

Capability superset of the reference: its `EmbeddingProvider` encodes BGE-M3
*dense-only* via sentence-transformers (`src/utils/embedding_provider.py:
118-147`, 1024-d L2-normalized so cosine = dot). BGE-M3 natively also emits
a sparse lexical head and ColBERT multi-vectors — this model produces all
three in ONE forward pass (BASELINE.json configs 3-4 exercise them):

* dense   — L2-normalized CLS hidden state               [B, H]
* sparse  — per-token lexical weight relu(w·h_t)          [B, S]
            (aggregate per term id with max, host/device side)
* colbert — per-token projected vectors, L2-normalized    [B, S, Dc]

Weight conversion from the HF `BAAI/bge-m3` torch checkpoint lives in
`models.convert` (environment here has no checkpoint cache, so tests use
`EncoderConfig.tiny()` + deterministic random params).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from .encoder import EncoderConfig, TransformerEncoder


@dataclasses.dataclass(frozen=True)
class BgeM3Config:
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    colbert_dim: int = 1024
    with_sparse: bool = True
    with_colbert: bool = True

    @classmethod
    def tiny(cls, **kw) -> "BgeM3Config":
        return cls(encoder=EncoderConfig.tiny(), colbert_dim=32, **kw)


@flax.struct.dataclass
class M3Output:
    dense: Any          # [B, H]  L2-normalized
    sparse: Any | None  # [B, S]  ≥0 token weights (0 at padding)
    colbert: Any | None  # [B, S, Dc] L2-normalized, zeroed at padding


def _l2norm(x, axis=-1, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                         keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class BgeM3Model(nn.Module):
    config: BgeM3Config

    @nn.compact
    def __call__(self, input_ids, lengths=None) -> M3Output:
        cfg = self.config
        ecfg = cfg.encoder
        if lengths is None:
            lengths = jnp.sum(
                (input_ids != ecfg.pad_token_id).astype(jnp.int32), axis=1
            )
        hidden = TransformerEncoder(ecfg, name="encoder")(input_ids, lengths)
        b, s, h = hidden.shape
        valid = (
            jnp.arange(s)[None, :] < lengths[:, None]
        )  # [B, S]

        dense = _l2norm(hidden[:, 0, :])  # CLS

        sparse = None
        if cfg.with_sparse:
            w = nn.Dense(1, dtype=ecfg.dtype, name="sparse_head")(hidden)
            sparse = nn.relu(w[..., 0].astype(jnp.float32))
            sparse = jnp.where(valid, sparse, 0.0)

        colbert = None
        if cfg.with_colbert:
            cv = nn.Dense(cfg.colbert_dim, dtype=ecfg.dtype,
                          name="colbert_head")(hidden)
            cv = _l2norm(cv)
            colbert = jnp.where(valid[:, :, None], cv, 0.0)

        return M3Output(dense=dense, sparse=sparse, colbert=colbert)
