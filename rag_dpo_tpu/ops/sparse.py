"""Sparse lexical (BM25 / learned-impact) scoring on device.

The reference's sparse arm is rank_bm25's pure-Python `get_scores` — an
O(corpus) Python loop per query over 16,919 chunks, flagged as a hot loop in
SURVEY.md §3.1 (`src/rag/bm25_index.py:126,236,153,265`). On TPU the corpus
is an ELL-format impact matrix:

    doc_terms   [N, L] int32  — per-chunk term ids, -1 padded
    doc_impacts [N, L] f32    — precomputed per-term impact
                                tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
                                (BM25 Okapi, same formula rank_bm25 uses)

A query is ≤T term ids + per-term weights (IDF for BM25; query-side lexical
weights for BGE-M3's learned sparse head — same op serves both). The score
is an equality-join contraction, evaluated blockwise so it streams at HBM
bandwidth, with the same streaming top-k merge as the dense kernel.

Padded slots use id -1 on the doc side and -2 on the query side so they can
never match each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_default
from .topk import streaming_topk_update, NEG_INF


def ell_scores_reference(doc_terms, doc_impacts, q_terms, q_weights):
    """Oracle: [N, L], [N, L], [Q, T], [Q, T] → [Q, N] f32 scores."""
    match = (
        doc_terms[None, :, :, None] == q_terms[:, None, None, :]
    )  # [Q, N, L, T]
    contrib = (
        match
        * doc_impacts[None, :, :, None]
        * q_weights[:, None, None, :]
    )
    return jnp.sum(contrib, axis=(2, 3))


def _ell_score_block(doc_terms, doc_impacts, q_terms, q_weights):
    """[BN, L], [BN, L], [Q, T], [Q, T] → [Q, BN].

    Fully unrolled over (query, term) so every live intermediate is 2D
    [BN, L] — Mosaic mis-compiles 3D [Q, BN, L] broadcasts for Q > 1 at
    block widths ≥ 512 (tpu_compile_helper crash, found by
    benchmarks/hw_smoke.py). The unroll count Q·T stays small because
    this kernel only serves corpora below the postings-engine threshold.
    """
    q, t = q_terms.shape
    cols = []
    for qi in range(q):
        acc = None
        for ti in range(t):
            match = doc_terms == q_terms[qi, ti]  # [BN, L]
            hit = jnp.sum(jnp.where(match, doc_impacts, 0.0), axis=1,
                          keepdims=True)  # [BN, 1]
            term = q_weights[qi, ti] * hit
            acc = term if acc is None else acc + term
        cols.append(acc)
    return jnp.concatenate(cols, axis=1).T  # [Q, BN]


def _ell_topk_kernel(qt_ref, qw_ref, dt_ref, di_ref, out_s_ref, out_i_ref,
                     run_s, run_i, *, k: int, block_n: int, n_valid: int):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    s = _ell_score_block(dt_ref[:], di_ref[:], qt_ref[:], qw_ref[:])

    streaming_topk_update(
        s, run_s, run_i, k=k, is_first=j == 0, base=j * block_n,
        n_valid=n_valid,
    )

    @pl.when(j == nj - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_n", "interpret")
)
def ell_topk(doc_terms, doc_impacts, q_terms, q_weights, k: int,
             *, block_n: int = 1024, interpret: bool | None = None):
    """Top-k lexical retrieval: ([Q, k] scores, [Q, k] i32 ids).

    Zero-score documents are still ranked (BM25 semantics allow ties at 0);
    slots beyond the corpus are id -1 / score -inf.
    """
    if interpret is None:
        interpret = interpret_default()
    n, l = doc_terms.shape
    q, t = q_terms.shape
    k_eff = min(k, n)

    n_pad = -(-n // block_n) * block_n
    if n_pad != n:
        doc_terms = jnp.pad(doc_terms, ((0, n_pad - n), (0, 0)),
                            constant_values=-1)
        doc_impacts = jnp.pad(doc_impacts, ((0, n_pad - n), (0, 0)))

    out_s, out_i = pl.pallas_call(
        functools.partial(
            _ell_topk_kernel, k=k_eff, block_n=block_n, n_valid=n
        ),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((q, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, l), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, l), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k_eff), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k_eff), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k_eff), jnp.float32),
            jax.ShapeDtypeStruct((q, k_eff), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k_eff), jnp.float32),
            pltpu.VMEM((q, k_eff), jnp.int32),
        ],
        interpret=interpret,
    )(
        q_terms.astype(jnp.int32),
        q_weights.astype(jnp.float32),
        doc_terms.astype(jnp.int32),
        doc_impacts.astype(jnp.float32),
    )

    if k_eff < k:
        out_s = jnp.pad(out_s, ((0, 0), (0, k - k_eff)),
                        constant_values=NEG_INF)
        out_i = jnp.pad(out_i, ((0, 0), (0, k - k_eff)),
                        constant_values=-1)
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("block_n",))
def ell_scores(doc_terms, doc_impacts, q_terms, q_weights,
               block_n: int = 2048):
    """Full [Q, N] lexical scores, blocked scan (for fusion with dense)."""
    n, l = doc_terms.shape
    n_pad = -(-n // block_n) * block_n
    if n_pad != n:
        doc_terms = jnp.pad(doc_terms, ((0, n_pad - n), (0, 0)),
                            constant_values=-1)
        doc_impacts = jnp.pad(doc_impacts, ((0, n_pad - n), (0, 0)))
    nb = n_pad // block_n

    def step(_, blocks):
        dt, di = blocks
        return None, _ell_score_block(dt, di, q_terms, q_weights)

    _, out = jax.lax.scan(
        step, None,
        (doc_terms.reshape(nb, block_n, l),
         doc_impacts.reshape(nb, block_n, l)),
    )
    return jnp.moveaxis(out, 0, 1).reshape(q_terms.shape[0], n_pad)[:, :n]
