"""FULL hybrid at 1M chunks, batch 256-2048, dense arm block-scanned.

Mirrors bench.py's pipeline exactly (int8 dense sweep → exact bf16
refine top-40, postings sparse top-40 at 128 candidates, device RRF to
top-10) but swaps the dense sweep for `approx_topk_int8_blockscan`
(e_ref=bf16 refine) so the [Q, N] intermediate no longer caps the
batch. Decides whether bench.py's headline moves past batch 256.
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

from rag_dpo_tpu.ops import rrf_fuse
from rag_dpo_tpu.ops.postings import PostingsIndex, postings_candidates_topk
from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_blockscan,
    quantize_rows,
)

N, D, K = 1_000_000, 1024, 10
ELL_W, N_TERMS, VOCAB = 24, 16, 50_000
ITERS = 10
BLOCK = 250_000
BATCHES = (256, 512, 1024, 2048)


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1,
                               keepdims=True))
        return (e.astype(jnp.float32) / nrm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    embs.block_until_ready()
    e_i8, e_scale = jax.jit(quantize_rows)(embs)
    e_i8.block_until_ready()

    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=512)
    post_docs, post_imps = pidx.device_arrays()
    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))
    weights = jnp.asarray([2.0, 1.5], jnp.float32)

    out = {"bench": "hybrid_1M_blockscan_scaling", "k": K,
           "device": str(jax.devices()[0]), "block_rows": BLOCK}

    for q_n in BATCHES:
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_n, N_TERMS)), jnp.int32)
        qw = jnp.abs(jax.random.normal(jax.random.key(5), (q_n, N_TERMS)))

        @jax.jit
        def make_queries(key):
            x = jax.random.normal(key, (q_n, D), jnp.float32)
            return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1,
                                        keepdims=True))

        queries = make_queries(jax.random.key(1))

        def hybrid(q, ei8, esc, eref, pd, pi, et, ei, qqt, qqw):
            ds, di = approx_topk_int8_blockscan(
                q, ei8, esc, 40, oversample=2, block_rows=BLOCK,
                e_ref=eref)
            ss, si = postings_candidates_topk(pd, pi, et, ei, qqt,
                                              qqw, k=40, n_candidates=128)
            arms = jnp.stack([di, si], axis=0)
            return rrf_fuse(arms, weights, topk=K)

        def chain(q, *ops):
            def body(c, _):
                s, i = hybrid(c, *ops)
                bump = (s[:, :1] * 0).astype(c.dtype)
                return c + bump, s[0, 0]
            return jax.lax.scan(body, q, None, length=ITERS)[1]

        chain_j = jax.jit(chain)
        args = (queries, e_i8, e_scale, embs, post_docs, post_imps,
                ell_t, ell_i, qt, qw)
        np.asarray(chain_j(*args))
        t0 = time.time()
        np.asarray(chain_j(*args))
        dt = (time.time() - t0) / ITERS
        out[f"batch{q_n}"] = {"ms": round(dt * 1e3, 3),
                              "qps": round(q_n / dt, 1)}
        print(f"batch {q_n}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps",
              flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
