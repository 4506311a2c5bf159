"""Cross-encoder reranker model (Jina-reranker-v2 class) in Flax.

The reference scores (query, heading+passage) pairs with sentence-
transformers' CrossEncoder on CPU/torch (`src/rag/reranker.py:74-108`,
Jina-reranker-v2-base-multilingual, 278M params, 512-token truncation).
Here the same architecture family — an XLM-RoBERTa-style backbone with a
scalar relevance head on CLS — runs batched on TPU with flash attention,
so pairs don't need 512-token truncation and the 40-pair rerank is one
device program instead of a CPU hot loop (SURVEY.md §3.1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .encoder import EncoderConfig, TransformerEncoder


class CrossEncoderModel(nn.Module):
    """[B, S] token ids of 'query </s> passage' pairs → [B] f32 scores.

    `with_head_dense=True` matches the RoBERTa classification head
    (dense → tanh → out_proj); False is a bare scalar head on CLS.
    """

    config: EncoderConfig
    with_head_dense: bool = True

    @nn.compact
    def __call__(self, input_ids, lengths=None):
        cfg = self.config
        if lengths is None:
            lengths = jnp.sum(
                (input_ids != cfg.pad_token_id).astype(jnp.int32), axis=1
            )
        hidden = TransformerEncoder(cfg, name="encoder")(input_ids, lengths)
        cls = hidden[:, 0, :].astype(jnp.float32)
        if self.with_head_dense:
            cls = jnp.tanh(
                nn.Dense(cfg.hidden_size, dtype=jnp.float32,
                         name="head_dense")(cls)
            )
        score = nn.Dense(1, dtype=jnp.float32, name="classifier")(cls)
        return score[:, 0]
