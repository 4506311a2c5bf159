"""TPU-native decoder LLM (Llama/Mistral architecture family).

The reference outsources ALL generation to an external Ollama process
(Mistral-Nemo 12B over HTTP, `src/utils/llm_provider.py`). The provider
abstraction here keeps that option — but a complete TPU framework should
be able to serve the generator itself. This module implements the
Mistral/Llama-class decoder in Flax:

* RMSNorm, rotary position embeddings, grouped-query attention (GQA),
  SwiGLU MLP — the architecture of Mistral-Nemo/Llama/Qwen checkpoints;
* KV-cached inference: jit-compiled prefill + single-token decode step
  with static shapes (cache pre-allocated at max_seq);
* weight conversion from HF `LlamaForCausalLM` / `MistralForCausalLM`
  torch exports (`models.convert.convert_llama_state_dict`), locked by a
  torch parity test;
* Megatron-style TP sharding via the same path rules as the encoder.

Sampling/generation loop lives in `models.generate`; the provider wrapper
is `providers.tpu_llm.TPULLMProvider`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32_000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int | None = None     # defaults to hidden // heads
    intermediate_size: int = 14_336
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-5
    max_seq_len: int = 4096
    tie_embeddings: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32   # bf16 halves init/storage footprint
    # weight-only int8: projection kernels stored int8 + per-output-channel
    # f32 scales, dequantized inside the matmul read. Decode is HBM-bound
    # on weights, so this both halves the footprint vs bf16 (the
    # reference-class 12B generator fits ONE v5e chip) and speeds decode.
    quantize_weights: bool = False
    # int8 KV cache: K/V stored int8 + per-(position, kv-head) f32 scale,
    # quantize-on-write / dequantize-on-read inside the attention program.
    # Halves the HBM the slot pool spends per resident request (at
    # 12B/1536-token rows: 246 MB → 123 MB next to 12.4 GB of weights),
    # so the continuous engine fits ~2× the concurrent decodes — decode
    # throughput is weight-sweep-bound, so aggregate tok/s scales with
    # slots. The functional rewrite each step does not drift: with
    # scale = rowmax/127 the f32 dequant/requant perturbs each q by
    # <2^-22 relative — far inside the 0.5 rounding margin — so the int8
    # values are bit-stable across arbitrarily many steps (the f32 scale
    # may wobble an ulp); asserted by tests/test_kv_quant.py.
    quantize_kv: bool = False

    @property
    def dh(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "DecoderConfig":
        defaults = dict(
            vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
            num_kv_heads=2, intermediate_size=128, max_seq_len=128,
            rope_theta=10_000.0,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def mistral_nemo_12b(cls) -> "DecoderConfig":
        """The reference's generator model class (Mistral-Nemo 12B)."""
        return cls(
            vocab_size=131_072, hidden_size=5120, num_layers=40,
            num_heads=32, num_kv_heads=8, head_dim=128,
            intermediate_size=14_336, rope_theta=1_000_000.0,
            max_seq_len=16_384,
        )


class RMSNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype).astype(jnp.float32)
        norm = xf * jax.lax.rsqrt(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps
        )
        return (norm * scale).astype(dtype)


def rope(x, positions, theta: float):
    """x: [B, S, H, Dh]; positions: [B, S] → rotated x (pairwise halves,
    HF Llama convention: rotate_half)."""
    b, s, h, dh = x.shape
    half = dh // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, half]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    )
    return out.astype(x.dtype)


class QuantDense(nn.Module):
    """Weight-only int8 linear: y = (x · W_i8) ⊙ scale.

    Kernel stored int8 [in, out], per-output-channel f32 scale. The cast
    to bf16 happens inside the matmul read (XLA fuses it), so HBM traffic
    is the int8 bytes. Init draws random int8 (bench/testing); real
    weights arrive via `quantize_decoder_params` /
    `convert_llama_state_dict(..., quantize=True)`.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]

        def init_kernel(key, shape, _):
            vals = jax.random.normal(key, shape) * 42.0
            return jnp.clip(jnp.round(vals), -127, 127).astype(jnp.int8)

        kernel = self.param("kernel_q", init_kernel,
                            (in_features, self.features), jnp.int8)
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, 0.01, jnp.float32),
            (self.features,),
        )
        # MXU accumulation is f32 regardless; materialize the result in
        # the activation dtype. At bf16 this halves every [seq, feat]
        # projection temp — the f32 materialization (plus the f32
        # promotion the old `y * scale_f32` re-introduced) is what
        # RESOURCE_EXHAUSTed whole-prompt 2048-token prefill next to
        # the 12 GB weights (benchmarks/bench_chunked_prefill.py).
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype,
        )
        return y * scale.astype(self.dtype)


def _linear(cfg: DecoderConfig, features: int, name: str):
    if cfg.quantize_weights:
        return QuantDense(features, dtype=cfg.dtype, name=name)
    return nn.Dense(features, use_bias=False, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name=name)


def quantize_decoder_params(params: dict) -> dict:
    """float param tree (Dense kernels) → QuantDense tree (kernel_q +
    scale), host-side numpy, layer by layer (no double residency)."""
    import numpy as np

    def rec(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                w = np.asarray(node["kernel"], np.float32)
                amax = np.maximum(np.abs(w).max(axis=0), 1e-12)
                scale = (amax / 127.0).astype(np.float32)
                q = np.clip(np.round(w / scale[None, :]), -127,
                            127).astype(np.int8)
                return {"kernel_q": q, "scale": scale}
            return {k: rec(v) for k, v in node.items()}
        return node

    out = {}
    for key, value in params.items():
        if key in ("embed_tokens",):  # embeddings stay float
            out[key] = value
        else:
            out[key] = rec(value)
    return out


class GQAttention(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, hidden, positions, cache=None, attn_mask=None,
                 write_mask=None):
        """hidden [B, S, H]; positions [B, S]; write_mask [B, S] zeroes
        KV writes for padding tokens during prefill;
        cache: None | dict(k [B, max, KV, Dh], v, length [B]) — when given,
        new keys/values are written at `positions` and attention spans the
        cache; returns (out, new_cache)."""
        cfg = self.config
        b, s, _ = hidden.shape
        nh, nkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.dh
        dense = lambda feats, name: _linear(cfg, feats, name)
        q = dense(nh * dh, "q_proj")(hidden).reshape(b, s, nh, dh)
        k = dense(nkv * dh, "k_proj")(hidden).reshape(b, s, nkv, dh)
        v = dense(nkv * dh, "v_proj")(hidden).reshape(b, s, nkv, dh)
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        if cache is not None:
            quant = cfg.quantize_kv
            # Write the fresh K/V rows via per-row dynamic_update_slice:
            # every writer supplies CONTIGUOUS positions (prefill from
            # 0, extend/verify from a row start, decode a single slot),
            # so the update is a [S]-span at positions[:, 0] — XLA
            # updates the carried cache IN PLACE inside the decode scan.
            # (An earlier one-hot einsum formulation rebuilt the whole
            # [B, max] cache every step: O(S·max) scatter FLOPs plus
            # whole-cache read+write HBM traffic, ×layers ×scan steps —
            # it capped the 12B slot pool at ~18 tok/s aggregate.)
            #
            # Invalid tail positions (write_mask=0) write ZERO rows.
            # That is safe: the valid region grows contiguously and the
            # causal mask (key_pos ≤ q_pos) never admits a position
            # that hasn't been overwritten by a later valid write
            # before it is first attended — the same scatter-then-
            # attend argument as slot reuse. Overwrite semantics are
            # what speculative decoding needs (draft rows past the
            # accepted position are re-written next step).
            if write_mask is not None:
                k = k * write_mask[:, :, None, None].astype(k.dtype)
                v = v * write_mask[:, :, None, None].astype(v.dtype)
            start = positions[:, 0].astype(jnp.int32)

            def row_update(c, u, st):
                return jax.lax.dynamic_update_slice(
                    c, u.astype(c.dtype), (st,) + (0,) * (c.ndim - 1))

            upd = jax.vmap(row_update)
            if quant:
                # quantize ONLY the fresh rows (per-position, per-head
                # scale = rowmax/127) and attend the DEQUANTIZED cache:
                # the int8 cache is the single source of truth, so
                # outputs are invariant to how the prompt was written —
                # whole prefill, segmented prefill, prefix-cache hit
                # and decode all attend the same K/V (pool-vs-solo
                # parity stays bit-exact), and untouched entries are
                # never rewritten at all.
                new_cache = {}
                for name, t in (("k", k), ("v", v)):
                    tf = t.astype(jnp.float32)
                    amax = jnp.max(jnp.abs(tf), axis=-1)  # [B, S, KV]
                    scale = amax / 127.0
                    safe = jnp.where(scale > 0, scale, 1.0)
                    qt = jnp.clip(jnp.round(tf / safe[..., None]),
                                  -127, 127).astype(jnp.int8)
                    new_cache[name] = upd(cache[name], qt, start)
                    new_cache[name + "_scale"] = upd(
                        cache[name + "_scale"], scale, start)
                # dequantize to the activation dtype (bf16), not f32:
                # XLA materializes the dequantized cache for the
                # attention contraction, and an f32 materialization of
                # [B, max, KV, Dh] both doubled the transient footprint
                # (int8 batch 32 OOMed where bf16 batch 16 fit) and ran
                # ~19% slower per step. bf16 rounding on top of 8-bit
                # quantized values is noise (~2^-9 on ~2^-8 error);
                # pool-vs-solo parity is unaffected (both sides read
                # the same dequant).
                dq = cfg.dtype
                k_all = new_cache["k"].astype(dq) \
                    * new_cache["k_scale"][..., None].astype(dq)
                v_all = new_cache["v"].astype(dq) \
                    * new_cache["v_scale"][..., None].astype(dq)
            else:
                k_cache = upd(cache["k"], k, start)
                v_cache = upd(cache["v"], v, start)
                k_all, v_all = k_cache, v_cache
                new_cache = {"k": k_cache, "v": v_cache}
            kv_len = k_all.shape[1]
        else:
            k_all, v_all = k, v
            kv_len = s
            new_cache = None

        group = nh // nkv
        qf = q.astype(jnp.float32)
        kf = k_all.astype(jnp.float32)
        vf = v_all.astype(jnp.float32)
        qg = qf.reshape(b, s, nkv, group, dh)
        logits = jnp.einsum("bskgd,bmkd->bksgm", qg, kf) / (dh ** 0.5)
        # causal/cache mask: query at pos p sees keys at pos ≤ p
        key_pos = jnp.arange(kv_len)[None, None, None, None, :]
        q_pos = positions[:, None, :, None, None]
        mask = key_pos <= q_pos
        if attn_mask is not None:  # [B, kv_len] key validity
            mask = mask & attn_mask[:, None, None, None, :]
        logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bksgm,bmkd->bskgd", probs, vf)
        ctx = ctx.reshape(b, s, nh * dh).astype(cfg.dtype)
        out = dense(cfg.hidden_size, "o_proj")(ctx)
        return out, new_cache


class DecoderLayer(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, hidden, positions, cache=None, attn_mask=None,
                 write_mask=None):
        cfg = self.config
        attn_in = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype,
                          name="input_norm")(hidden)
        attn_out, new_cache = GQAttention(cfg, name="attention")(
            attn_in, positions, cache, attn_mask, write_mask
        )
        hidden = hidden + attn_out
        mlp_in = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype,
                         name="post_attention_norm")(hidden)
        dense = lambda feats, name: _linear(cfg, feats, name)
        gate = nn.silu(dense(cfg.intermediate_size, "gate_proj")(mlp_in))
        up = dense(cfg.intermediate_size, "up_proj")(mlp_in)
        hidden = hidden + dense(cfg.hidden_size, "down_proj")(gate * up)
        return hidden, new_cache


class DecoderModel(nn.Module):
    """→ logits [B, S, V] (+ updated caches when passed)."""

    config: DecoderConfig

    @nn.compact
    def __call__(self, input_ids, positions=None, caches=None,
                 attn_mask=None, write_mask=None, last_index=None,
                 inputs_embeds=None):
        cfg = self.config
        if inputs_embeds is not None:
            # multimodal path (models/llava.py): the caller already
            # embedded the tokens and spliced projected image patches
            # in — input_ids is ignored for content but still carries
            # the [B, S] shape
            b, s = inputs_embeds.shape[:2]
        else:
            b, s = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        embed = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="embed_tokens")
        hidden = embed(input_ids) if inputs_embeds is None \
            else inputs_embeds.astype(cfg.dtype)
        new_caches = []
        for i in range(cfg.num_layers):
            cache_i = caches[i] if caches is not None else None
            hidden, new_cache = DecoderLayer(cfg, name=f"layer_{i}")(
                hidden, positions, cache_i, attn_mask, write_mask
            )
            new_caches.append(new_cache)
        hidden = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype,
                         name="final_norm")(hidden)
        if last_index is not None:
            # project the LM head ONLY at each row's last valid position
            # — at 12B the full-prefill logits block is [B, S, 131k] f32
            # (537 MB at batch 8) computed just to keep one row; this
            # gathers [B, 1, H] first, saving that memory and the
            # S×vocab matmul FLOPs
            idx = jnp.broadcast_to(
                last_index.astype(jnp.int32)[:, None, None],
                (b, 1, hidden.shape[-1]))
            hidden = jnp.take_along_axis(hidden, idx, axis=1)
        if cfg.tie_embeddings:
            logits = embed.attend(hidden.astype(jnp.float32))
        else:
            if cfg.quantize_weights:
                logits = QuantDense(cfg.vocab_size, dtype=jnp.float32,
                                    name="lm_head")(
                    hidden.astype(jnp.float32))
            else:
                logits = nn.Dense(cfg.vocab_size, use_bias=False,
                                  dtype=jnp.float32,
                                  param_dtype=cfg.param_dtype,
                                  name="lm_head")(
                    hidden.astype(jnp.float32))
        if caches is not None:
            return logits, new_caches
        return logits

    @staticmethod
    def init_cache(cfg: DecoderConfig, batch: int,
                   length: int | None = None):
        # `length` bounds the cache rows (default: full context).
        # Attention reads kv_len from the cache's actual shape, so a
        # short-lived program (e.g. choose/score_choices) can allocate
        # only the rows it will write instead of max_seq_len — at 12B
        # that is ~180 MB instead of ~1 GB for a k=8 broadcast.
        kv_shape = (batch, length or cfg.max_seq_len,
                    cfg.num_kv_heads, cfg.dh)
        if cfg.quantize_kv:
            sc_shape = kv_shape[:-1]
            return [
                {
                    "k": jnp.zeros(kv_shape, jnp.int8),
                    "k_scale": jnp.zeros(sc_shape, jnp.float32),
                    "v": jnp.zeros(kv_shape, jnp.int8),
                    "v_scale": jnp.zeros(sc_shape, jnp.float32),
                }
                for _ in range(cfg.num_layers)
            ]
        return [
            {
                "k": jnp.zeros(kv_shape, cfg.dtype),
                "v": jnp.zeros(kv_shape, cfg.dtype),
            }
            for _ in range(cfg.num_layers)
        ]
