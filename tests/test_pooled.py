"""Pooled-max dense sweep (ops/pooled.py): parity vs the exact oracle,
penalty masking, ragged shapes, and pooled-strip structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_dpo_tpu.ops import cosine_topk_reference
from rag_dpo_tpu.ops.pooled import pooled_group_max, pooled_topk_int8
from rag_dpo_tpu.ops.quantize import quantize_rows


def _corpus(n, d, q, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    qs = e[rng.integers(0, n, q)] + 0.1 * rng.standard_normal(
        (q, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs, e


def test_pooled_group_max_structure():
    """Every pooled slot holds the true max/argmax of its strided group."""
    qs, e = _corpus(n=8192, d=128, q=4, seed=1)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    block_n, group = 4096, 32
    vals, ids = pooled_group_max(
        jnp.asarray(qs, jnp.bfloat16), e_i8, e_s,
        block_n=block_n, group=group)
    vals, ids = np.asarray(vals), np.asarray(ids)
    ng = block_n // group

    # oracle scores with the same quantized corpus
    deq = np.asarray(e_i8, np.float32) * np.asarray(e_s)[:, None]
    s_ref = qs.astype(np.float32) @ deq.T  # [Q, N]
    for t in range(4):
        for slot in [0, 1, ng - 1, ng, ng + 5, vals.shape[1] - 1]:
            blk, g = divmod(slot, ng)
            members = blk * block_n + np.arange(group) * ng + g
            members = members[members < e.shape[0]]
            got_id = ids[t, slot]
            assert got_id in members
            # bf16 matmul tolerance vs f32 oracle
            assert abs(vals[t, slot] - s_ref[t, members].max()) < 0.02
            assert abs(s_ref[t, got_id] - s_ref[t, members].max()) < 0.02


@pytest.mark.parametrize("n,k", [(9000, 10), (40_000, 40)])
def test_pooled_topk_recall_vs_exact(n, k):
    qs, e = _corpus(n=n, d=128, q=16, seed=0)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    s, i = pooled_topk_int8(jnp.asarray(qs), e_i8, e_s, embs, k,
                            oversample=8, block_n=4096, group=32)
    rs, ri = cosine_topk_reference(jnp.asarray(qs), embs, k)
    i, ri = np.asarray(i), np.asarray(ri)
    recall = np.mean([len(set(i[r]) & set(ri[r])) / k for r in range(16)])
    assert recall >= 0.95, recall
    # returned scores are exact bf16 dots, sorted descending
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_pooled_topk_penalty_and_ragged():
    qs, e = _corpus(n=7777, d=128, q=8, seed=2)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    pen = np.where(np.arange(7777) % 2 == 0, -1e30, 0.0).astype(
        np.float32)
    s, i = pooled_topk_int8(jnp.asarray(qs), e_i8, e_s, embs, 10,
                            oversample=8, penalty=jnp.asarray(pen),
                            block_n=4096, group=32)
    i = np.asarray(i)
    assert (i < 7777).all()
    valid = i[i >= 0]
    assert valid.size > 0 and (valid % 2 == 1).all(), "penalty leak"


def test_pooled_topk_small_corpus_k_padding():
    """Corpus smaller than one block; k larger than survivors."""
    qs, e = _corpus(n=200, d=64, q=4, seed=3)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    s, i = pooled_topk_int8(jnp.asarray(qs), e_i8, e_s, embs, 10,
                            oversample=4, block_n=4096, group=32)
    i = np.asarray(i)
    assert i.shape == (4, 10)
    assert (i < 200).all()
    # self-match: each query's nearest neighbour must surface
    rs, ri = cosine_topk_reference(jnp.asarray(qs), embs, 1)
    assert (i[:, 0] == np.asarray(ri)[:, 0]).mean() >= 0.75


def test_pooled_rejects_bad_tiling():
    qs, e = _corpus(n=512, d=64, q=4, seed=4)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    with pytest.raises(ValueError, match="multiple of 128"):
        pooled_topk_int8(jnp.asarray(qs), e_i8, e_s, embs, 5,
                         block_n=1024, group=32)


def test_pooled_topk_store_convention_penalty():
    """-1e4 (the index's filter/tombstone convention) must exclude rows —
    the refine re-scores without the penalty, so a loose candidate
    threshold would resurrect masked rows (review finding)."""
    qs, e = _corpus(n=9000, d=128, q=8, seed=5)
    embs = jnp.asarray(e, jnp.bfloat16)
    e_i8, e_s = jax.jit(quantize_rows)(embs)
    # mask everything EXCEPT 10 arbitrary rows: most groups fully masked
    allowed = np.asarray([11, 222, 3333, 4444, 5555, 6666, 7777, 8888,
                          123, 456])
    pen = np.full((9000,), -1e4, np.float32)
    pen[allowed] = 0.0
    s, i = pooled_topk_int8(jnp.asarray(qs), e_i8, e_s, embs, 10,
                            oversample=8, penalty=jnp.asarray(pen),
                            block_n=4096, group=32)
    i = np.asarray(i)
    valid = i[i >= 0]
    assert valid.size > 0
    assert set(valid.tolist()) <= set(allowed.tolist()), \
        sorted(set(valid.tolist()) - set(allowed.tolist()))
