"""Int8 index quantization: 2× corpus capacity, MXU int8 throughput.

Dense search is HBM-bandwidth-bound on the embedding matrix; storing it
int8 with per-row scales halves the traffic (and v5e MXUs run int8
matmuls at twice bf16 rate). Cosine scores with symmetric per-row
quantization lose ≲1% recall@10 — recovered by the same oversample+refine
trick the bf16 path already uses.

score(q, d) = (q_i8 · d_i8) · s_q · s_d  where  x_i8 = round(127·x/max|x|).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(x: np.ndarray | jax.Array):
    """[N, D] float → ([N, D] int8, [N] f32 scales). Symmetric per-row."""
    x = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("k", "oversample", "recall_target"))
def approx_topk_int8_refined(q_f32, e_i8, e_scale, e_ref, k: int,
                             oversample: int = 4, penalty=None,
                             recall_target: float = 0.95):
    """Int8 candidate generation + higher-precision refine.

    The int8 sweep reads HALF the HBM of bf16 (the whole cost of dense
    search at corpus scale), then the k·oversample survivors are exactly
    re-scored against `e_ref` (the bf16/f32 row store) with a tiny gather
    — so returned scores carry full precision and the ≲1% int8 ranking
    noise collapses to ties only. e_ref may be the same array as the
    quantization source; its dtype sets refine precision.

    `recall_target` is forwarded to `lax.approx_max_k` and is the
    sweep's real recall lever past oversample≈2: the 1M-chunk study
    (benchmarks/bench_oversample_study.py) shows recipe recall@10
    saturating at 0.9961 from oversample 3 up under the default 0.95
    bucketing — the misses are winners the approx reduction drops
    entirely, which more candidates cannot recover."""
    q_i8, q_scale = quantize_rows(q_f32)
    raw = jax.lax.dot_general(
        q_i8, e_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]
    if penalty is not None:
        scores = scores + penalty[None, :]
    # bf16 intermediate halves the [Q, N] HBM round-trip; the exact
    # refine below restores full precision on everything returned
    scores = scores.astype(jnp.bfloat16)
    kk = min(k * oversample, scores.shape[1])
    cvals, cids = jax.lax.approx_max_k(scores, kk,
                                       recall_target=recall_target)
    cvals = cvals.astype(jnp.float32)
    rows = e_ref[cids]                                  # [Q, C, D] gather
    exact = jnp.einsum(
        "qd,qcd->qc", q_f32, rows.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where(cvals > -1e3, exact, -1e30)  # keep penalty holes
    # ALWAYS re-sort by the exact scores — approx order can transpose
    # neighbors, and downstream RRF fuses by RANK, not score
    top, pos = jax.lax.top_k(exact, min(k, kk))
    ids = jnp.take_along_axis(cids, pos, axis=1)
    if kk < k:
        top = jnp.pad(top, ((0, 0), (0, k - kk)), constant_values=-1e30)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return top, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def dequant_refine(q_f32, e_i8, e_scale, cand_scores, cand_ids, k: int):
    """Device-side exact re-score of candidate ids against the
    dequantized int8 rows. `cand_scores` must carry the sweep's additive
    penalties (−1e4 filter/tombstone convention): slots at or below −5e3
    stay excluded. Works on sharded arrays under GSPMD (the gather
    crosses shards); used by the mesh int8 path when
    `IndexConfig.device_refine` is set."""
    safe = jnp.where(cand_ids >= 0, cand_ids, 0)
    rows = e_i8[safe].astype(jnp.float32) * e_scale[safe][:, :, None]
    exact = jnp.einsum(
        "qd,qcd->qc", q_f32.astype(jnp.float32), rows,
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where((cand_ids >= 0) & (cand_scores > -5e3), exact,
                      -1e30)
    kk = min(k, exact.shape[1])
    top, pos = jax.lax.top_k(exact, kk)
    ids = jnp.take_along_axis(safe, pos, axis=1)
    ids = jnp.where(top > -1e29, ids, -1)
    if kk < k:
        top = jnp.pad(top, ((0, 0), (0, k - kk)), constant_values=-1e30)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return top, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def approx_topk_int8_selfrefined(q_f32, e_i8, e_scale, k: int,
                                 oversample: int = 4, penalty=None):
    """Int8 sweep + refine against the DEQUANTIZED int8 rows — no
    full-precision row store required, so a 10M×1024 corpus fits one
    v5e chip (10 GB int8 vs 20 GB bf16). Returned scores are exact
    under the quantized corpus model q·(d_i8·s_d): candidate ORDER is
    fully refined (f32 accumulation, exact sort); absolute scores carry
    the ≲1/127-per-row quantization of the stored vectors."""
    q_i8, q_scale = quantize_rows(q_f32)
    raw = jax.lax.dot_general(
        q_i8, e_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]
    if penalty is not None:
        scores = scores + penalty[None, :]
    scores = scores.astype(jnp.bfloat16)
    kk = min(k * oversample, scores.shape[1])
    cvals, cids = jax.lax.approx_max_k(scores, kk)
    cvals = cvals.astype(jnp.float32)
    rows = e_i8[cids].astype(jnp.float32) \
        * e_scale[cids][:, :, None]                     # [Q, C, D] dequant
    exact = jnp.einsum(
        "qd,qcd->qc", q_f32.astype(jnp.float32), rows,
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where(cvals > -1e3, exact, -1e30)
    top, pos = jax.lax.top_k(exact, min(k, kk))
    ids = jnp.take_along_axis(cids, pos, axis=1)
    ids = jnp.where(top > -1e29, ids, -1)
    if kk < k:
        top = jnp.pad(top, ((0, 0), (0, k - kk)), constant_values=-1e30)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return top, ids.astype(jnp.int32)


def int8_blockscan_candidates(q_i8, q_scale, e_i8, e_scale, kk: int,
                              block_rows: int, penalty=None):
    """Scanned int8 sweep → (cand scores [Q, kk] f32, cand row ids
    [Q, kk] int32). Live intermediate stays at [Q, block_rows]; the
    carry holds the running top-kk merge. Plain-jnp (no jit wrapper) so
    it composes inside shard_map local functions and the jitted
    full-search entry points alike. The last block is start-clamped;
    rows re-entering from the previous block are masked so no id can
    appear twice."""
    n, d = e_i8.shape
    q = q_i8.shape[0]
    block_rows = min(block_rows, n)
    n_blocks = -(-n // block_rows)
    kk = min(kk, n)

    def step(carry, j):
        cvals, cids = carry
        start = jnp.minimum(j * block_rows, n - block_rows)
        blk = jax.lax.dynamic_slice(e_i8, (start, 0), (block_rows, d))
        bscale = jax.lax.dynamic_slice(e_scale, (start,), (block_rows,))
        raw = jax.lax.dot_general(
            q_i8, blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (raw.astype(jnp.float32)
                  * q_scale[:, None] * bscale[None, :])
        if penalty is not None:
            pblk = jax.lax.dynamic_slice(penalty, (start,), (block_rows,))
            scores = scores + pblk[None, :]
        rows_global = start + jnp.arange(block_rows, dtype=jnp.int32)
        # clamped tail block: mask rows already scored by block j-1
        scores = jnp.where(rows_global[None, :] >= j * block_rows,
                           scores, -jnp.inf).astype(jnp.bfloat16)
        bk = min(kk, block_rows)
        bvals, bidx = jax.lax.approx_max_k(scores, bk)
        bids = rows_global[bidx]
        mvals = jnp.concatenate([cvals, bvals.astype(jnp.float32)],
                                axis=1)
        mids = jnp.concatenate([cids, bids], axis=1)
        top, pos = jax.lax.top_k(mvals, kk)
        return (top, jnp.take_along_axis(mids, pos, axis=1)), None

    init = (jnp.full((q, kk), -jnp.inf, jnp.float32),
            jnp.full((q, kk), -1, jnp.int32))
    (cvals, cids), _ = jax.lax.scan(
        step, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return cvals, cids


@functools.partial(
    jax.jit, static_argnames=("k", "oversample", "block_rows"))
def approx_topk_int8_blockscan(q_f32, e_i8, e_scale, k: int,
                               oversample: int = 4,
                               block_rows: int = 1_048_576,
                               penalty=None, e_ref=None):
    """Int8 sweep scanned over row blocks — batch size no longer bounded
    by the [Q, N] score intermediate.

    The full-sweep paths materialize scores for the whole corpus at
    once: at N=10M that caps Q at ~32 before the [Q, N] f32 block
    (1.3 GB per 32 queries) crowds out the 9.5 GB corpus. Scanning
    `block_rows`-row slabs keeps the live intermediate at [Q, B] and
    carries a running top-(k·oversample) merge, so batch 256+ fits
    beside a 10M-row corpus and the corpus HBM read amortizes over 8×
    the queries. Final order comes from the same device-side dequant
    refine as `approx_topk_int8_selfrefined`.

    The last block is start-clamped (dynamic_slice semantics); rows that
    would re-enter from the previous block are masked out so no id can
    appear twice in the merged candidate set.

    `e_ref` (optional full-precision row store) switches the final
    refine from the dequantized int8 rows to an exact gather against it
    — same contract as `approx_topk_int8_refined`.
    """
    q_i8, q_scale = quantize_rows(q_f32)
    kk = min(k * oversample, e_i8.shape[0])
    cvals, cids = int8_blockscan_candidates(
        q_i8, q_scale, e_i8, e_scale, kk, block_rows, penalty=penalty)

    safe = jnp.where(cids >= 0, cids, 0)
    if e_ref is not None:
        rows = e_ref[safe].astype(jnp.float32)
    else:
        rows = e_i8[safe].astype(jnp.float32) * e_scale[safe][:, :, None]
    exact = jnp.einsum(
        "qd,qcd->qc", q_f32.astype(jnp.float32), rows,
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where((cids >= 0) & (cvals > -1e3), exact, -1e30)
    top, pos = jax.lax.top_k(exact, min(k, kk))
    ids = jnp.take_along_axis(safe, pos, axis=1)
    ids = jnp.where(top > -1e29, ids, -1)
    if kk < k:
        top = jnp.pad(top, ((0, 0), (0, k - kk)), constant_values=-1e30)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)), constant_values=-1)
    return top, ids.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def approx_topk_int8(q_i8, q_scale, e_i8, e_scale, k: int,
                     oversample: int = 4, penalty=None):
    """Int8 dense search: int8×int8→int32 matmul on the MXU, rescale,
    approx_max_k + exact refine (mirror of ops.topk.approx_topk)."""
    raw = jax.lax.dot_general(
        q_i8, e_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Q, N] int32
    scores = raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]
    if penalty is not None:
        scores = scores + penalty[None, :]
    kk = min(k * oversample, scores.shape[1])
    vals, idxs = jax.lax.approx_max_k(scores, kk)
    if kk > k:
        top, pos = jax.lax.top_k(vals, k)
        idxs = jnp.take_along_axis(idxs, pos, axis=1)
        vals = top
    elif kk < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)),
                       constant_values=-1e30)
        idxs = jnp.pad(idxs, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, idxs.astype(jnp.int32)
