"""Weighted Reciprocal Rank Fusion on device.

Reference semantics (`src/rag/retriever.py:66-90`): each retrieval arm
contributes ``weight / (k + rank)`` with rank starting at 1; contributions
for the same chunk id are summed across arms; k = 60. Arm weights in the
candidate path (`retriever.py:372-432`): original query ×2.0, expansions
×1.0, BM25 arm ×1.5 for the original / ×0.75 for expansions.

The reference fuses with Python dicts over ≤8 rankings × ≤40 ids. Here the
fusion is a fixed-shape device program so it can sit inside the jitted query
path: duplicate-id contribution summing is a pairwise equality matmul over
the concatenated candidate list (M = arms·list_len ≤ a few hundred, so the
[M, M] mask is tiny), followed by first-occurrence dedup and `lax.top_k`.
Invalid slots are marked with id = -1 and contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def rrf_fuse_reference(rankings, weights, k_rrf: int = 60):
    """Host oracle: rankings = list of lists of ids (ordered best-first).

    Returns {id: fused_score}.
    """
    scores: dict[int, float] = {}
    for ranking, w in zip(rankings, weights):
        for rank, cid in enumerate(ranking, start=1):
            if cid < 0:
                continue
            scores[cid] = scores.get(cid, 0.0) + w / (k_rrf + rank)
    return scores


@functools.partial(jax.jit, static_argnames=("k_rrf", "topk"))
def rrf_fuse(ids, weights, *, k_rrf: int = 60, topk: int):
    """Fuse ranked id lists.

    ids:     [A, Q, L] int32 — per-arm ranked ids, best first, -1 = empty.
    weights: [A] float32 — per-arm RRF weight.
    Returns ([Q, topk] fused scores, [Q, topk] ids); empty slots are id -1
    with score -inf.
    """
    a, q, l = ids.shape
    rank = jnp.arange(1, l + 1, dtype=jnp.float32)  # [L]
    contrib = weights[:, None] / (k_rrf + rank)[None, :]  # [A, L]
    contrib = jnp.broadcast_to(contrib[:, None, :], (a, q, l))

    flat_ids = jnp.swapaxes(ids, 0, 1).reshape(q, a * l)  # [Q, M]
    flat_contrib = jnp.swapaxes(contrib, 0, 1).reshape(q, a * l)
    valid = flat_ids >= 0
    flat_contrib = jnp.where(valid, flat_contrib, 0.0)

    same = flat_ids[:, :, None] == flat_ids[:, None, :]  # [Q, M, M]
    same = same & valid[:, :, None] & valid[:, None, :]
    fused = jnp.einsum("qij,qj->qi", same.astype(jnp.float32), flat_contrib)

    # Keep only the first occurrence of each id.
    m = flat_ids.shape[1]
    earlier = jnp.tril(jnp.ones((m, m), dtype=bool), k=-1)  # j < i
    dup = jnp.any(same & earlier[None, :, :], axis=2)
    score = jnp.where(valid & ~dup, fused, NEG_INF)

    top, pos = jax.lax.top_k(score, min(topk, m))
    top_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    top_ids = jnp.where(top > NEG_INF / 2, top_ids, -1)
    if top.shape[1] < topk:
        pad = topk - top.shape[1]
        top = jnp.pad(top, ((0, 0), (0, pad)), constant_values=NEG_INF)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top, top_ids
