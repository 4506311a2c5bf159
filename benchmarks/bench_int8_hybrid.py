"""Hybrid headline tuning: int8+refine dense arm, sparse candidate-pool
sweep. Real chip; dependent-chain timing (see bench.py)."""

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

from rag_dpo_tpu.ops import approx_topk, blocked_topk, rrf_fuse
from rag_dpo_tpu.ops.postings import PostingsIndex, postings_candidates_topk
from rag_dpo_tpu.ops.quantize import approx_topk_int8_refined, quantize_rows

N, D, Q, K_ARM, K = 1_000_000, 1024, 64, 40, 10
ELL_W, N_TERMS, VOCAB = 24, 16, 50_000
ITERS = 20


def chain(fn, *ops):
    @jax.jit
    def run(q, *ops):
        def step(carry, _):
            qq = carry
            out = fn(qq, *ops)
            mix = (jnp.sum(out[0]) * 0.0).astype(qq.dtype)
            return qq + mix, out[0][0, 0]
        _, ss = jax.lax.scan(step, q, None, length=ITERS)
        return ss
    return lambda q: run(q, *ops)


def timeit(run, q):
    np.asarray(run(q))
    t0 = time.time()
    np.asarray(run(q))
    return (time.time() - t0) / ITERS


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)),
                               axis=1, keepdims=True))
        return (e.astype(jnp.float32) / nrm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    embs.block_until_ready()
    e_i8, e_scale = jax.jit(quantize_rows)(embs)
    e_i8.block_until_ready()

    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    imps_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    t0 = time.time()
    pidx = PostingsIndex.build(terms_h, imps_h, VOCAB, cap=512)
    invert_s = time.time() - t0
    pd, pi = pidx.device_arrays()
    d_terms = jax.device_put(jnp.asarray(terms_h))
    d_imps = jax.device_put(jnp.asarray(imps_h))
    qt = jnp.asarray(rng.integers(0, VOCAB, (Q, N_TERMS)), jnp.int32)
    qw = jnp.asarray(np.abs(rng.standard_normal((Q, N_TERMS))), jnp.float32)

    qf = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    qb = qf.astype(jnp.bfloat16)

    res = {"invert_s": round(invert_s, 2)}

    # dense arms
    dt = timeit(chain(lambda q, e: approx_topk(q, e, K_ARM), embs), qb)
    res["dense_bf16_approx"] = {"ms": round(dt * 1e3, 3),
                                "qps": round(Q / dt, 1)}
    print("dense_bf16", res["dense_bf16_approx"], flush=True)

    dt = timeit(chain(lambda q, a, b, c: approx_topk_int8_refined(
        q, a, b, c, K_ARM), e_i8, e_scale, embs), qf)
    res["dense_int8_refined"] = {"ms": round(dt * 1e3, 3),
                                 "qps": round(Q / dt, 1)}
    print("dense_int8", res["dense_int8_refined"], flush=True)

    # int8 recall vs exact
    s_i, i_i = approx_topk_int8_refined(qf, e_i8, e_scale, embs, K_ARM)
    s_e, i_e = blocked_topk(qb, embs, K_ARM)
    i_i, i_e = np.asarray(i_i), np.asarray(i_e)
    res["int8_recall_at_40"] = round(float(np.mean(
        [len(set(i_i[r]) & set(i_e[r])) / K_ARM for r in range(Q)])), 5)
    print("recall", res["int8_recall_at_40"], flush=True)

    # sparse arm: candidate pool sweep
    for cand in (512, 256, 128):
        dt = timeit(chain(
            lambda q, pd, pi, t, im: postings_candidates_topk(
                pd, pi, t, im, qt, qw, k=K_ARM, n_candidates=cand),
            pd, pi, d_terms, d_imps), qb)
        res[f"sparse_cand{cand}"] = {"ms": round(dt * 1e3, 3)}
        print(f"sparse_{cand}", res[f"sparse_cand{cand}"], flush=True)

    # recall of smaller pools vs 512
    s5, i5 = postings_candidates_topk(pd, pi, d_terms, d_imps, qt, qw,
                                      k=K_ARM, n_candidates=512)
    for cand in (256, 128):
        s, i = postings_candidates_topk(pd, pi, d_terms, d_imps, qt, qw,
                                        k=K_ARM, n_candidates=cand)
        i5n, in_ = np.asarray(i5), np.asarray(i)
        res[f"sparse_cand{cand}_recall_vs512"] = round(float(np.mean(
            [len(set(in_[r]) & set(i5n[r])) / K_ARM
             for r in range(Q)])), 5)

    # full hybrid: int8 dense + sparse(best) + RRF
    def hybrid(q, e_i8, e_scale, e_ref, pd, pi, t, im, cand):
        ds, dr = approx_topk_int8_refined(q, e_i8, e_scale, e_ref, K_ARM)
        ss, sr = postings_candidates_topk(pd, pi, t, im, qt, qw,
                                          k=K_ARM, n_candidates=cand)
        ids = jnp.stack([dr, sr])[:, None, :, :].reshape(2, Q, K_ARM)
        w = jnp.asarray([2.0, 1.5], jnp.float32)
        return rrf_fuse(ids[:, :, :], w, k_rrf=60, topk=K)

    for cand in (512, 256):
        dt = timeit(chain(
            lambda q, *o: hybrid(q, *o, cand),
            e_i8, e_scale, embs, pd, pi, d_terms, d_imps), qf)
        res[f"hybrid_int8_cand{cand}"] = {
            "ms": round(dt * 1e3, 3), "qps": round(Q / dt, 1)}
        print(f"hybrid_{cand}", res[f"hybrid_int8_cand{cand}"], flush=True)

    print(json.dumps({"bench": "int8_hybrid_1M", **res}))


if __name__ == "__main__":
    main()
