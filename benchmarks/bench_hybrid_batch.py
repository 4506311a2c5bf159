"""Hybrid throughput vs query batch: the corpus read (the whole cost)
amortizes across queries, so qps scales with batch until compute-bound."""

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

from rag_dpo_tpu.ops import rrf_fuse
from rag_dpo_tpu.ops.postings import PostingsIndex, postings_candidates_topk
from rag_dpo_tpu.ops.quantize import approx_topk_int8_refined, quantize_rows

N, D, K_ARM, K = 1_000_000, 1024, 40, 10
ELL_W, N_TERMS, VOCAB = 24, 16, 50_000
ITERS = 20


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)),
                               axis=1, keepdims=True))
        return (e.astype(jnp.float32) / nrm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    e_i8, e_scale = jax.jit(quantize_rows)(embs)
    e_i8.block_until_ready()
    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    imps_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    pidx = PostingsIndex.build(terms_h, imps_h, VOCAB, cap=512)
    pd, pi = pidx.device_arrays()
    d_terms = jax.device_put(jnp.asarray(terms_h))
    d_imps = jax.device_put(jnp.asarray(imps_h))

    res = {}
    for q_batch in (128,):
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_batch, N_TERMS)),
                         jnp.int32)
        qw = jnp.asarray(np.abs(rng.standard_normal((q_batch, N_TERMS))),
                         jnp.float32)
        qf = jnp.asarray(rng.standard_normal((q_batch, D)), jnp.float32)

        def hybrid(q):
            ds, dr = approx_topk_int8_refined(q, e_i8, e_scale, embs,
                                              K_ARM, oversample=2)
            ss, sr = postings_candidates_topk(pd, pi, d_terms, d_imps,
                                              qt, qw, k=K_ARM,
                                              n_candidates=256)
            ids = jnp.stack([dr, sr]).reshape(2, q_batch, K_ARM)
            w = jnp.asarray([2.0, 1.5], jnp.float32)
            return rrf_fuse(ids, w, k_rrf=60, topk=K)

        @jax.jit
        def run(q):
            def step(carry, _):
                qq = carry
                out = hybrid(qq)
                mix = (jnp.sum(out[0]) * 0.0).astype(qq.dtype)
                return qq + mix, out[0][0, 0]
            _, ss = jax.lax.scan(step, q, None, length=ITERS)
            return ss

        try:
            np.asarray(run(qf))
            t0 = time.time()
            np.asarray(run(qf))
            dt = (time.time() - t0) / ITERS
            res[f"hybrid_b{q_batch}"] = {
                "ms": round(dt * 1e3, 3),
                "qps": round(q_batch / dt, 1)}
        except Exception as e:  # noqa: BLE001
            res[f"hybrid_b{q_batch}"] = {"error": str(e)[:200]}
        print(q_batch, res[f"hybrid_b{q_batch}"], flush=True)
    print(json.dumps({"bench": "hybrid_batch_sweep_1M", **res}))


if __name__ == "__main__":
    main()
