"""Blockwise flash attention for encoder forward passes.

The reference gets fused attention only as an *optional* CUDA flash-attn
build (`Dockerfile.cuda` stage 1, per SURVEY.md §2.4) and otherwise truncates
its way around long sequences (embedder 8192-token support capped at 20k
chars, reranker at 512 tokens — `src/utils/embedding_provider.py:31,136`,
`src/rag/reranker.py:52,144`). Here flash attention is first-class: the
O(S²) score matrix never hits HBM, so 8192-token BGE-M3 encodes and long
cross-encoder rerank pairs run at full length on one chip.

Non-causal, padding-masked (encoder workload). Online-softmax blockwise
algorithm; scores/accumulation in f32 on the MXU regardless of input dtype.

`attention_reference` is the jnp oracle (also used as the differentiable
path for training — the Pallas kernel is forward-only in round 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_default

NEG_INF = -1e30


def attention_reference(q, k, v, lengths=None, scale: float | None = None):
    """[B, H, S, Dh] ×3 (+ [B] lengths) → [B, H, S, Dh]. Pure jnp oracle."""
    b, h, s, dh = q.shape
    if scale is None:
        scale = dh ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if lengths is not None:
        mask = jnp.arange(s)[None, :] < lengths[:, None]  # [B, S]
        logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32)).astype(
        q.dtype
    )


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, out_ref,
                  acc, m_scr, l_scr, *, scale: float, block_k: int,
                  n_heads: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    batch_idx = pl.program_id(0) // n_heads

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # [TQ, Dh]
    k = k_ref[0, 0].astype(jnp.float32)  # [TK, Dh]
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TQ, TK]

    seq_len = len_ref[batch_idx]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)

    m_prev = m_scr[:, 0:1]  # [TQ, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    # Guard fully-masked blocks: keeps exp(s - m) at 0 instead of exp(0)
    # when every key in the block is padding (real scores never reach -1e20).
    m_new = jnp.maximum(m_new, -1e20)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:, 0:1] = m_new
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        # guard l=0 (a fully-masked / zero-length row): 0/0 would emit
        # NaN that survives L2-norm and poisons similarities downstream
        l_safe = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out_ref[0, 0] = (acc[:] / l_safe).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q, k, v, lengths=None, *,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """Fused non-causal attention. q/k/v: [B, H, S, Dh]; lengths: [B] i32."""
    if interpret is None:
        interpret = interpret_default()
    b, h, s, dh = q.shape
    if scale is None:
        scale = float(dh) ** -0.5
    if lengths is None:
        lengths = jnp.full((b,), s, jnp.int32)

    bq = min(block_q, s)
    bk = min(block_k, s)
    s_pad = max(-(-s // bq) * bq, -(-s // bk) * bk)
    # one padded length serves both tilings
    s_pad = -(-s_pad // bq) * bq
    s_pad = -(-s_pad // bk) * bk
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    lengths1d = lengths.astype(jnp.int32)
    grid = (b * h, s_pad // bq, s_pad // bk)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=bk,
                          n_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [B] lengths
            pl.BlockSpec((1, 1, bq, dh),
                         lambda bh, i, j, H=h: (bh // H, bh % H, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh),
                         lambda bh, i, j, H=h: (bh // H, bh % H, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh),
                         lambda bh, i, j, H=h: (bh // H, bh % H, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, dh), lambda bh, i, j, H=h: (bh // H, bh % H, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, dh), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=4 * b * h * s_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(lengths1d, q, k, v)

    return out[:, :, :s, :]


# ------------------------------------------------------- differentiable

def flash_attention_trainable(q, k, v, lengths=None, scale=None):
    """Flash forward + recompute backward.

    Forward runs the Pallas kernel (O(S) memory); backward recomputes
    attention probabilities from the saved q/k/v with the standard
    closed-form softmax-attention gradients (O(S²) memory *in the
    backward only*). A fused Pallas backward is future work; this makes
    the flash path usable in training today at encoder lengths.
    """
    if lengths is None:
        lengths = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    return _flash_vjp(q, k, v, lengths.astype(jnp.float32),
                      scale if scale is not None
                      else float(q.shape[-1]) ** -0.5)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_vjp(q, k, v, lengths_f, scale):
    return flash_attention(q, k, v, lengths_f.astype(jnp.int32),
                           scale=scale)


def _fwd(q, k, v, lengths_f, scale):
    return _flash_vjp(q, k, v, lengths_f, scale), (q, k, v, lengths_f)


def _bwd(scale, residuals, g):
    q, k, v, lengths_f = residuals
    s = q.shape[2]
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    gf = g.astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    mask = jnp.arange(s)[None, :] < lengths_f.astype(jnp.int32)[:, None]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    # softmax jacobian: dlogits = p * (dp - sum(dp * p))
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlogits, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlogits, qf) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(lengths_f))


_flash_vjp.defvjp(_fwd, _bwd)
