"""Flax transformer encoder backbone (XLM-RoBERTa architecture).

This replaces the torch/CUDA encoder forward passes the reference delegates
to sentence-transformers (`src/utils/embedding_provider.py:87-105` for
BGE-M3, `src/rag/reranker.py:98-101` for the Jina cross-encoder; SURVEY.md
§2.4). BGE-M3's backbone is XLM-RoBERTa-large; the Jina reranker's is an
XLM-RoBERTa variant — one backbone implementation serves both.

TPU-first choices:
* bf16 activations by default, f32 layernorm/softmax accumulation;
* attention runs through the Pallas flash kernel (`ops.flash_attention`) on
  TPU — O(S) memory, enabling true 8192-token encodes instead of the
  reference's truncation (20k-char cap, `embedding_provider.py:31,136`);
* static shapes everywhere: padding + length masks, no dynamic slicing;
* tensor-parallel sharding is applied externally by path-based param rules
  (`rag_dpo_tpu.parallel` + `models.sharding_rules`), keeping the module
  definition mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.flash_attention import attention_reference
from ..ops.flash_attention_bwd import flash_attention_fused


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250_002          # XLM-RoBERTa vocabulary
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 8194
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    dtype: Any = jnp.float32
    use_flash_attention: bool = True
    flash_block_q: int = 512
    flash_block_k: int = 512
    # 'flash' (single-chip Pallas), 'reference', or 'ring' — context
    # parallelism: the sequence shards over the mesh `shard` axis and KV
    # blocks rotate via ppermute (requires an enclosing
    # `parallel.context_parallel(mesh)` scope and full-length batches;
    # this is how documents beyond one chip's attention budget encode
    # without truncation)
    attention_impl: str = "auto"
    # rematerialize each layer in the backward pass: trades ~30% more
    # FLOPs for O(layers) less activation memory — the standard TPU
    # recipe for long-sequence / large-batch training
    remat: bool = False

    @classmethod
    def tiny(cls, **kw) -> "EncoderConfig":
        """Small config for tests / synthetic corpora."""
        defaults = dict(
            vocab_size=1024, hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, max_position_embeddings=514,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def bge_m3(cls, **kw) -> "EncoderConfig":
        """XLM-RoBERTa-large — the BGE-M3 backbone (568M params)."""
        return cls(**kw)


def position_ids_from_inputs(input_ids, pad_token_id: int):
    """RoBERTa-style positions: pad stays at pad_id, others count from it."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class SelfAttention(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden, lengths):
        cfg = self.config
        b, s, h = hidden.shape
        nh = cfg.num_heads
        dh = h // nh
        dense = lambda name: nn.Dense(h, dtype=cfg.dtype, name=name)
        q = dense("query")(hidden).reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        k = dense("key")(hidden).reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        v = dense("value")(hidden).reshape(b, s, nh, dh).transpose(0, 2, 1, 3)

        impl = cfg.attention_impl
        if impl == "auto":
            impl = "flash" if cfg.use_flash_attention else "reference"
        if impl == "ring":
            # context parallelism: sequence sharded over the mesh `shard`
            # axis, KV blocks rotate around the ICI ring — documents past
            # one chip's attention budget encode without truncation.
            # Ragged batches mask like the single-chip kernels (global
            # key positions are recomputed per rotation). Needs an
            # enclosing `parallel.context_parallel` scope.
            from ..ops.ring_attention import ring_attention_inline
            from ..parallel.mesh import active_cp_mesh

            mesh = active_cp_mesh()
            if mesh is None:
                raise RuntimeError(
                    "attention_impl='ring' needs an enclosing "
                    "`with parallel.context_parallel(mesh):` scope"
                )
            ctx = ring_attention_inline(mesh, q, k, v, lengths)
        elif impl == "flash":
            # fused Pallas forward AND backward — O(S) memory end to end
            ctx = flash_attention_fused(
                q, k, v, lengths,
                block_q=min(cfg.flash_block_q, s),
                block_k=min(cfg.flash_block_k, s),
            )
        else:
            ctx = attention_reference(q, k, v, lengths)

        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
        return nn.Dense(h, dtype=cfg.dtype, name="output")(ctx)


class EncoderLayer(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, hidden, lengths):
        cfg = self.config
        attn_out = SelfAttention(cfg, name="attention")(hidden, lengths)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="attention_norm",
        )(hidden + attn_out).astype(cfg.dtype)

        mlp = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                       name="intermediate")(hidden)
        mlp = nn.gelu(mlp, approximate=False)
        mlp = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_output")(mlp)
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="output_norm",
        )(hidden + mlp).astype(cfg.dtype)
        return hidden


class TransformerEncoder(nn.Module):
    """Post-LN encoder; returns final hidden states [B, S, H]."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, lengths=None):
        cfg = self.config
        b, s = input_ids.shape
        if lengths is None:
            lengths = jnp.sum(
                (input_ids != cfg.pad_token_id).astype(jnp.int32), axis=1
            )

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = position_ids_from_inputs(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=cfg.dtype, name="position_embeddings")(pos_ids)
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            dtype=cfg.dtype, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        hidden = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            name="embeddings_norm",
        )(word + pos + tok_type).astype(cfg.dtype)

        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=())
            if cfg.remat else EncoderLayer
        )
        for i in range(cfg.num_layers):
            hidden = layer_cls(cfg, name=f"layer_{i}")(hidden, lengths)
        return hidden
