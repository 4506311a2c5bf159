"""Fused flash-attention backward (Pallas) — O(S) memory training.

Completes the flash stack: `flash_attention_fused` is a `custom_vjp` whose
forward is the blockwise Pallas kernel extended to emit per-row logsumexp
stats, and whose backward runs two Pallas kernels (dq; dk+dv) that
recompute attention probabilities blockwise from (q, k, lse) — the
standard FlashAttention-2 backward. Nothing O(S²) ever materializes in
either direction, unlike `flash_attention_trainable` whose backward
recomputes the full probability matrix in XLA.

Layout notes (Mosaic divisibility rules, learned on hardware via
benchmarks/hw_smoke.py): per-row stats are shaped [B, H, S, 1] so their
blocks are (1, 1, TQ, 1) — trailing singleton keeps the last-two-dims
rule satisfiable for any B·H.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_default

NEG_INF = -1e30


# ----------------------------------------------------- forward with stats

def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, out_ref, lse_ref,
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

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    seq_len = len_ref[batch_idx]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(jnp.maximum(m_prev,
                                    jnp.max(s, axis=1, keepdims=True)),
                        -1e20)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:, 0:1] = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1,
                                                    keepdims=True)
    m_scr[:, 0:1] = m_new
    acc[:] = acc[:] * alpha + jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        l_safe = jnp.maximum(l_scr[:, 0:1], 1e-30)
        out_ref[0, 0] = (acc[:] / l_safe).astype(out_ref.dtype)
        lse_ref[0, 0, :, :] = m_scr[:, 0:1] + jnp.log(l_safe)


# --------------------------------------------------------------- dq kernel

def _dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
               dq_ref, acc, *, scale: float, block_k: int, n_heads: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    batch_idx = pl.program_id(0) // n_heads

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, :]   # [TQ, 1]
    dd = dd_ref[0, 0, :, :]     # [TQ, 1]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    seq_len = len_ref[batch_idx]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    p = jnp.where(col < seq_len, jnp.exp(s - lse), 0.0)

    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dd)
    acc[:] = acc[:] + jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0, 0] = (acc[:] * scale).astype(dq_ref.dtype)


# -------------------------------------------------------------- dkv kernel

def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale: float, block_q: int, n_heads: int):
    i = pl.program_id(2)   # q-block index (inner, sequential)
    nq = pl.num_programs(2)
    batch_idx = pl.program_id(0) // n_heads

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, :, :]
    dd = dd_ref[0, 0, :, :]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TQ, TK]
    seq_len = len_ref[batch_idx]
    colk = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
        + pl.program_id(1) * s.shape[1]
    rowq = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * block_q
    valid = (colk < seq_len) & (rowq < seq_len)
    p = jnp.where(valid, jnp.exp(s - lse), 0.0)

    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dd)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


# ------------------------------------------------------------- host-side

def _pad_seq(x, s_pad):
    s = x.shape[2]
    if s_pad == s:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))


def _fwd_with_stats(q, k, v, lengths, scale, block_q, block_k, interpret):
    b, h, s, dh = q.shape
    bq, bk = min(block_q, s), min(block_k, s)
    s_pad = max(-(-s // bq) * bq, -(-s // bk) * bk)
    s_pad = -(-s_pad // bq) * bq
    s_pad = -(-s_pad // bk) * bk
    q, k, v = (_pad_seq(x, s_pad) for x in (q, k, v))
    grid = (b * h, s_pad // bq, s_pad // bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=bk,
                          n_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        out_specs=[
            pl.BlockSpec((1, 1, bq, dh),
                         lambda bh, i, j, H=h: (bh // H, bh % H, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 1),
                         lambda bh, i, j, H=h: (bh // H, bh % H, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dh), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)
    return out[:, :, :s], lse, s_pad


def flash_attention_fused(q, k, v, lengths=None, scale=None,
                          block_q: int = 512, block_k: int = 512,
                          interpret: bool | None = None):
    """Flash attention with a FUSED Pallas backward (O(S) memory both
    directions). q/k/v: [B, H, S, Dh]; lengths: [B]."""
    if lengths is None:
        lengths = jnp.full((q.shape[0],), q.shape[2], jnp.int32)
    if interpret is None:
        interpret = interpret_default()
    sc = scale if scale is not None else float(q.shape[-1]) ** -0.5
    return _fused_vjp(q, k, v, lengths.astype(jnp.float32), sc,
                      block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_vjp(q, k, v, lengths_f, scale, block_q, block_k, interpret):
    out, _, _ = _fwd_with_stats(q, k, v, lengths_f, scale, block_q,
                                block_k, interpret)
    return out


def _fused_fwd(q, k, v, lengths_f, scale, block_q, block_k, interpret):
    out, lse, _ = _fwd_with_stats(q, k, v, lengths_f, scale, block_q,
                                  block_k, interpret)
    return out, (q, k, v, lengths_f, out, lse)


def _fused_bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, lengths, out, lse = residuals
    b, h, s, dh = q.shape
    sc = scale
    bq, bk = min(block_q, s), min(block_k, s)
    s_pad = max(-(-s // bq) * bq, -(-s // bk) * bk)
    s_pad = -(-s_pad // bq) * bq
    s_pad = -(-s_pad // bk) * bk

    # D_i = Σ_d dO·O (row-wise), computed in XLA once
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)  # [B, H, S, 1]

    qp, kp, vp, gp = (_pad_seq(x, s_pad) for x in (q, k, v, g))
    ddp = _pad_seq(dd, s_pad)
    # lse already padded to s_pad by the forward
    lengths_i = lengths.astype(jnp.int32)

    stat_spec_q = pl.BlockSpec(
        (1, 1, bq, 1), lambda bh, a, c, H=h: (bh // H, bh % H, a, 0),
        memory_space=pltpu.VMEM)
    qblk = lambda idx: pl.BlockSpec(
        (1, 1, bq, dh), idx, memory_space=pltpu.VMEM)
    kblk = lambda idx: pl.BlockSpec(
        (1, 1, bk, dh), idx, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=sc, block_k=bk, n_heads=h),
        grid=(b * h, s_pad // bq, s_pad // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qblk(lambda bh, i, j, H=h: (bh // H, bh % H, i, 0)),
            kblk(lambda bh, i, j, H=h: (bh // H, bh % H, j, 0)),
            kblk(lambda bh, i, j, H=h: (bh // H, bh % H, j, 0)),
            qblk(lambda bh, i, j, H=h: (bh // H, bh % H, i, 0)),
            stat_spec_q,
            stat_spec_q,
        ],
        out_specs=qblk(lambda bh, i, j, H=h: (bh // H, bh % H, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        interpret=interpret,
    )(lengths_i, qp, kp, vp, gp, lse, ddp)

    stat_spec_i = pl.BlockSpec(
        (1, 1, bq, 1), lambda bh, j, i, H=h: (bh // H, bh % H, i, 0),
        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=sc, block_q=bq, n_heads=h),
        grid=(b * h, s_pad // bk, s_pad // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qblk(lambda bh, j, i, H=h: (bh // H, bh % H, i, 0)),
            kblk(lambda bh, j, i, H=h: (bh // H, bh % H, j, 0)),
            kblk(lambda bh, j, i, H=h: (bh // H, bh % H, j, 0)),
            qblk(lambda bh, j, i, H=h: (bh // H, bh % H, i, 0)),
            stat_spec_i,
            stat_spec_i,
        ],
        out_specs=[
            kblk(lambda bh, j, i, H=h: (bh // H, bh % H, j, 0)),
            kblk(lambda bh, j, i, H=h: (bh // H, bh % H, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, dh), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        interpret=interpret,
    )(lengths_i, qp, kp, vp, gp, lse, ddp)

    # zero grads on padded query rows (their lse/out are unspecified)
    row = jnp.arange(s)
    qvalid = (row[None, :] < lengths_i[:, None])[:, None, :, None]
    dq = jnp.where(qvalid, dq[:, :, :s], 0.0).astype(q.dtype)
    dk = dk[:, :, :s].astype(k.dtype)
    dv = dv[:, :, :s].astype(v.dtype)
    return dq, dk, dv, jnp.zeros_like(lengths)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)
