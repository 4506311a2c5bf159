"""Ring attention: context-parallel attention over the mesh.

New capability (SURVEY.md §5 "long-context"): the reference *truncates*
long inputs everywhere (20k-char embed cap, 512-token reranker cap,
map-reduce instead of long attention). Single-chip flash attention
(ops.flash_attention) already covers 8192 tokens; ring attention goes
beyond one chip's budget: the sequence is sharded over the mesh `shard`
axis, every device computes attention for its query slice while KV blocks
rotate around the ring via `jax.lax.ppermute` (ICI neighbor exchange),
with online-softmax accumulation — O(S/P) memory per device, exact
result.

This is the collective-level sibling of the Pallas flash kernel: the
blockwise math is identical; the "blocks" arrive over the interconnect
instead of from HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import AXIS_SHARD

NEG_INF = -1e30


def _ring_attention_local(q, k, v, lengths, axis_name: str,
                          scale: float):
    """Per-device body under shard_map.

    q/k/v: [B, H, S_local, Dh] — this device's sequence slice.
    lengths: [B] valid GLOBAL sequence length per batch element, or
    None for full-length batches. Rotates (k, v) around the ring;
    accumulates online softmax. After t rotations device i holds the
    KV block that started on device (i - t) mod n, so the block's
    global key positions are computable and padded keys mask exactly
    like the single-chip kernels.
    """
    n_dev = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    def block_update(carry, kv, step):
        acc, m, l = carry
        k_blk, v_blk = kv
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32),
            k_blk.astype(jnp.float32),
        ) * scale
        if lengths is not None:
            s_loc = k_blk.shape[2]
            src = jax.lax.rem(my_idx - step + n_dev, n_dev)
            key_pos = src * s_loc + jnp.arange(s_loc)       # [S_loc]
            valid = key_pos[None, :] < lengths[:, None]     # [B, S_loc]
            s = jnp.where(valid[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        return (acc, m_new, l)

    b, h, s_loc, dh = q.shape
    acc = jnp.zeros((b, h, s_loc, dh), jnp.float32)
    m = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, s_loc, 1), jnp.float32)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def ring_step(step, state):
        acc, m, l, k_cur, v_cur = state
        acc, m, l = block_update((acc, m, l), (k_cur, v_cur), step)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (acc, m, l, k_next, v_next)

    acc, m, l, _, _ = jax.lax.fori_loop(
        0, n_dev, ring_step, (acc, m, l, k, v)
    )
    # fully-masked query rows (position >= length) would divide by 0;
    # their output is garbage anyway — clamp to keep it finite
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_inline(mesh: Mesh, q, k, v, lengths=None, *,
                          axis_name: str = AXIS_SHARD,
                          scale: float | None = None):
    """Un-jitted ring attention for use INSIDE a traced module (the
    encoder's `attention_impl='ring'` path): same shard_map program as
    `make_ring_attention`, composable with the caller's jit.

    `lengths` ([B] global valid lengths, replicated) masks padded keys
    exactly like the single-chip kernels; None = full-length batch."""
    dh = q.shape[-1]
    s = scale if scale is not None else float(dh) ** -0.5
    if lengths is None:
        inner = shard_map(
            functools.partial(_ring_attention_local, lengths=None,
                              axis_name=axis_name, scale=s),
            mesh=mesh,
            in_specs=(P(None, None, axis_name, None),) * 3,
            out_specs=P(None, None, axis_name, None),
            check_vma=False,
        )
        return inner(q, k, v)
    inner = shard_map(
        functools.partial(_ring_attention_local,
                          axis_name=axis_name, scale=s),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),) * 3 + (P(),),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    return inner(q, k, v, lengths)


def make_ring_attention(mesh: Mesh, *, axis_name: str = AXIS_SHARD,
                        scale: float | None = None):
    """→ jitted ring_attention(q, k, v, lengths=None) for [B, H, S, Dh]
    inputs with S sharded over `axis_name`. Non-causal (encoder
    workload); S must be divisible by the axis size."""

    def fn(q, k, v, lengths=None):
        return ring_attention_inline(mesh, q, k, v, lengths,
                                     axis_name=axis_name, scale=scale)

    return jax.jit(fn)
