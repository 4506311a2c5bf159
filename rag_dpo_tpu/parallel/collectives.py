"""Cross-shard collectives for distributed retrieval.

The core distributed primitive of the framework: each device holds a shard of
the corpus embedding matrix, computes a *local* top-k for every query, and the
global top-k is obtained by all-gathering the (score, global_id) pairs and
re-selecting on every device. For k ≪ shard_size this moves k·n_shards pairs
over ICI instead of the full score matrix — the TPU-native replacement for
the reference's single-process hnswlib call (reference `src/rag/retriever.py:
215-220` does one in-process C++ HNSW query; we do a sharded exact search).

Implemented with `shard_map` so the collective pattern is explicit and Pallas
kernels can be dropped in per-shard without tracing surprises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import AXIS_SHARD


def merge_sharded_topk(local_scores, local_ids, k: int, axis_name: str):
    """Inside shard_map: merge per-shard top-k into a replicated global top-k.

    local_scores: [Q, k] per-shard best scores (descending)
    local_ids:    [Q, k] global chunk ids for those scores
    Returns ([Q, k], [Q, k]) identical on every shard along `axis_name`.
    """
    # [Q, n_shards * k] after gathering along a new axis then flattening.
    all_scores = jax.lax.all_gather(local_scores, axis_name, axis=1)  # [Q, S, k]
    all_ids = jax.lax.all_gather(local_ids, axis_name, axis=1)
    q = all_scores.shape[0]
    flat_scores = all_scores.reshape(q, -1)
    flat_ids = all_ids.reshape(q, -1)
    top_scores, pos = jax.lax.top_k(flat_scores, k)
    top_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    return top_scores, top_ids


def sharded_topk(
    mesh: Mesh,
    scores_fn,
    k: int,
    *,
    shard_axis: str = AXIS_SHARD,
):
    """Build a jitted sharded top-k search.

    scores_fn(queries, shard_embs) -> [Q, shard_N] similarity scores for one
    shard (pure, shard-local; typically a Pallas fused matmul or jnp.dot).

    Returns search(queries, embs_sharded, base_ids_sharded) -> (scores, ids)
    where embs is [N, D] sharded along `shard_axis` rows and base_ids is the
    [N] global id of each row (usually iota, but kept explicit so deletions /
    compaction can renumber).
    """

    def _local(queries, shard_embs, shard_ids):
        s = scores_fn(queries, shard_embs)  # [Q, nloc]
        kk = min(k, s.shape[1])
        loc_scores, loc_pos = jax.lax.top_k(s, kk)
        if kk < k:  # pad so the merge shape is static
            pad = k - kk
            loc_scores = jnp.pad(
                loc_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
            )
            loc_pos = jnp.pad(loc_pos, ((0, 0), (0, pad)))
        loc_ids = shard_ids[loc_pos]
        return merge_sharded_topk(loc_scores, loc_ids, k, shard_axis)

    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(shard_axis), P(shard_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_topk_multi(
    mesh: Mesh,
    local_fn,
    k: int,
    n_sharded: int,
    *,
    n_replicated: int = 0,
    shard_axis: str = AXIS_SHARD,
):
    """General sharded top-k: per-shard scoring over ANY set of row-sharded
    operands (dense embeddings, ELL term/impact arrays, posting tables,
    penalty vectors, …) with the same all-gather merge as `sharded_topk`.

    local_fn(queries, *operands) -> ([Q, kk] local scores desc,
                                     [Q, kk] LOCAL row positions)
    where operands = the shard-local views of `n_sharded` row-sharded
    arrays followed by `n_replicated` replicated arrays. Local positions
    are translated to global ids through the sharded `shard_ids` operand
    (always passed first), so tombstone renumbering stays supported.

    Returns search(queries, shard_ids, *arrays) -> (scores [Q, k],
    global ids [Q, k]) replicated on every device.
    """

    def _local(queries, shard_ids, *arrays):
        loc_scores, loc_pos = local_fn(queries, *arrays)
        kk = loc_scores.shape[1]
        if kk < k:  # static pad so the merge shape is uniform
            pad = k - kk
            loc_scores = jnp.pad(
                loc_scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
            )
            loc_pos = jnp.pad(loc_pos, ((0, 0), (0, pad)))
        elif kk > k:
            loc_scores, keep = jax.lax.top_k(loc_scores, k)
            loc_pos = jnp.take_along_axis(loc_pos, keep, axis=1)
        loc_ids = shard_ids[jnp.clip(loc_pos, 0, shard_ids.shape[0] - 1)]
        return merge_sharded_topk(loc_scores, loc_ids, k, shard_axis)

    in_specs = (
        (P(), P(shard_axis))
        + (P(shard_axis),) * n_sharded
        + (P(),) * n_replicated
    )
    fn = shard_map(
        _local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_merge_pairs(scores_a, ids_a, scores_b, ids_b, k: int):
    """Host-callable merge of two (score, id) top-k lists (e.g. two indexes)."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    top, pos = jax.lax.top_k(scores, k)
    return top, jnp.take_along_axis(ids, pos, axis=-1)
