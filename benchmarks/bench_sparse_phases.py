"""Phase breakdown of the postings sparse arm at 1M chunks (VERDICT
round-2 item 2: the sparse rescore grows linearly with batch and caps
full-hybrid scaling at ~48k qps past batch 512).

Phases timed separately (each as its own jit, chained ITERS times):
  p1_gather   post_docs/[Q,T,cap] fetch + where + reshape
  p1_select   approx_max_k over [Q, T·cap] + candidate take
  p2_rescore  ELL row gather + [Q,C,L,T] equality-join + sum
  dedup_topk  [Q,C,C] first-occurrence dedup + top-k
  full        the production postings_candidates_topk for reference

Run on the real chip:  python benchmarks/bench_sparse_phases.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.ops.postings import (
    NEG_INF,
    SENTINEL,
    PostingsIndex,
    postings_candidates_topk,
)

N, ELL_W, N_TERMS, VOCAB = 1_000_000, 24, 16, 50_000
CAP, C, K = 512, 128, 40
ITERS = 40
BATCHES = (256, 512, 1024, 2048)


def timed(fn, args, iters=ITERS):
    """Chain `iters` dependent evaluations inside one jit (axon's
    block_until_ready is unreliable — BENCHMARKS.md methodology)."""

    def chain(*a):
        def body(c, _):
            outs = fn(c, *a[1:])
            probe = jnp.asarray(outs[0]).reshape(-1)[0]
            bump = (probe * 0).astype(a[0].dtype)
            return a[0] + bump, probe
        return jax.lax.scan(body, a[0], None, length=iters)[1]

    cj = jax.jit(chain)
    np.asarray(cj(*args))
    t0 = time.time()
    np.asarray(cj(*args))
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=CAP)
    post_docs, post_imps = pidx.device_arrays()
    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))

    out = {"bench": "sparse_phases_1M", "cap": CAP, "C": C, "k": K,
           "device": str(jax.devices()[0])}

    for q_n in BATCHES:
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_n, N_TERMS)),
                         jnp.int32)
        qw = jnp.abs(jax.random.normal(jax.random.key(5),
                                       (q_n, N_TERMS)))

        def p1_gather(qt_, pd, pi, qw_):
            tid = jnp.clip(qt_, 0, pd.shape[0] - 1)
            q_valid = (qt_ >= 0)[:, :, None]
            docs = jnp.where(q_valid, pd[tid], SENTINEL)
            scores = jnp.where(q_valid & (docs != SENTINEL),
                               pi[tid] * qw_[:, :, None], 0.0)
            q = qt_.shape[0]
            return (docs.reshape(q, -1), scores.reshape(q, -1))

        def p1_full(qt_, pd, pi, qw_):
            docs, scores = p1_gather(qt_, pd, pi, qw_)
            _, pos = jax.lax.approx_max_k(scores, C)
            cand = jnp.take_along_axis(docs, pos, axis=1)
            return (cand,)

        def p2_rescore(cand, et, ei, qt_, qw_):
            cand_valid = cand != SENTINEL
            safe = jnp.where(cand_valid, cand, 0)
            ct = et[safe]
            ci = ei[safe]
            match = ct[:, :, :, None] == qt_[:, None, None, :]
            contrib = jnp.where(
                match, ci[:, :, :, None] * qw_[:, None, None, :], 0.0)
            return (jnp.sum(contrib, axis=(2, 3)),)

        def dedup_topk(total, cand):
            cand_valid = cand != SENTINEL
            safe = jnp.where(cand_valid, cand, 0)
            same = cand[:, :, None] == cand[:, None, :]
            earlier = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
                       < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1))
            dup = jnp.any(same & earlier[None], axis=1)
            t2 = jnp.where(cand_valid & ~dup, total, NEG_INF)
            top, ppos = jax.lax.top_k(t2, K)
            return (top, jnp.take_along_axis(safe, ppos, axis=1))

        # materialize a candidate set once for the downstream phases
        cand = jax.jit(p1_full)(qt, post_docs, post_imps, qw)[0]
        cand.block_until_ready()
        total = jax.jit(p2_rescore)(cand, ell_t, ell_i, qt, qw)[0]
        total.block_until_ready()

        res = {
            "p1_gather_ms": round(1e3 * timed(
                lambda qt_, pd, pi, qw_: p1_gather(qt_, pd, pi, qw_),
                (qt, post_docs, post_imps, qw)), 3),
            "p1_full_ms": round(1e3 * timed(
                lambda qt_, pd, pi, qw_: p1_full(qt_, pd, pi, qw_),
                (qt, post_docs, post_imps, qw)), 3),
            "p2_rescore_ms": round(1e3 * timed(
                lambda cand_, et, ei, qt_, qw_: p2_rescore(
                    cand_, et, ei, qt_, qw_),
                (cand, ell_t, ell_i, qt, qw)), 3),
            "dedup_topk_ms": round(1e3 * timed(
                lambda total_, cand_: dedup_topk(total_, cand_),
                (total, cand)), 3),
            "full_ms": round(1e3 * timed(
                lambda qt_, pd, pi, et, ei, qw_:
                postings_candidates_topk(pd, pi, et, ei, qt_, qw_,
                                         k=K, n_candidates=C),
                (qt, post_docs, post_imps, ell_t, ell_i, qw)), 3),
        }
        out[f"batch{q_n}"] = res
        print(f"batch {q_n}: {res}", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
