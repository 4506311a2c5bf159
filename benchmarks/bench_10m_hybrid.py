"""FULL hybrid retrieval at 10M chunks on ONE chip.

Extends the 10M dense capacity point (`bench_10m_batch.py`, 11.1k qps)
to the complete hybrid recipe: block-scanned int8 dense sweep + dequant
refine top-40, impact-ordered postings sparse top-40, device RRF to
top-10. HBM budget: 9.5 GB int8 corpus + ~0.9 GB ELL (width 8) +
0.2 GB posting tables ≈ 10.6 GB on a 16 GB chip.

The ELL arrays upload in slabs (the axon tunnel moves ~GBs in minutes
in good weather); posting inversion runs host-side via the C++ runtime.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import functools

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.ops import rrf_fuse
from rag_dpo_tpu.ops.postings import PostingsIndex, postings_candidates_topk
from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_blockscan,
    quantize_rows,
)

N, D, K = 10_000_000, 1024, 10
SLAB = 1_000_000
ELL_W, N_TERMS, VOCAB = 8, 16, 50_000
ITERS = 8
BATCHES = (256, 512)
BLOCK = 1_000_000


@jax.jit
def make_slab(key):
    e = jax.random.normal(key, (SLAB, D), jnp.bfloat16)
    nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1,
                           keepdims=True))
    return quantize_rows(e.astype(jnp.float32) / nrm)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_slab(tgt_i8, tgt_scale, slab_i8, slab_scale, start):
    return (
        jax.lax.dynamic_update_slice(tgt_i8, slab_i8, (start, 0)),
        jax.lax.dynamic_update_slice(tgt_scale, slab_scale, (start,)),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def write_rows(tgt, slab, start):
    return jax.lax.dynamic_update_slice(tgt, slab, (start, 0))


def main():
    t_all = time.time()
    e_i8 = jnp.zeros((N, D), jnp.int8)
    e_scale = jnp.zeros((N,), jnp.float32)
    for s in range(N // SLAB):
        si8, ssc = make_slab(jax.random.key(s))
        e_i8, e_scale = write_slab(e_i8, e_scale, si8, ssc,
                                   jnp.int32(s * SLAB))
    e_i8.block_until_ready()
    print(f"10M int8 corpus resident {time.time() - t_all:.1f}s",
          flush=True)

    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(
        np.float16).astype(np.float32)
    t0 = time.time()
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=512)
    print(f"postings inverted {time.time() - t0:.1f}s", flush=True)
    post_docs, post_imps = pidx.device_arrays()

    # slab-upload the ELL arrays (terms int32, impacts f32)
    t0 = time.time()
    ell_t = jnp.zeros((N, ELL_W), jnp.int32)
    ell_i = jnp.zeros((N, ELL_W), jnp.float32)
    for s in range(N // SLAB):
        sl = slice(s * SLAB, (s + 1) * SLAB)
        ell_t = write_rows(ell_t, jnp.asarray(terms_h[sl]),
                           jnp.int32(s * SLAB))
        ell_i = write_rows(ell_i, jnp.asarray(impacts_h[sl]),
                           jnp.int32(s * SLAB))
        ell_i.block_until_ready()
        print(f"  ell slab {s + 1}/{N // SLAB} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print(f"ELL resident {time.time() - t0:.1f}s", flush=True)

    weights = jnp.asarray([2.0, 1.5], jnp.float32)
    out = {"bench": "hybrid_10M_one_chip", "k": K,
           "device": str(jax.devices()[0]),
           "hbm_gb": round((N * D + N * ELL_W * 8
                            + VOCAB * 512 * 8) / 2**30, 1)}

    for q_n in BATCHES:
        rows = rng.integers(0, N, q_n)

        @jax.jit
        def make_queries(ei8, esc, rws, key):
            base = ei8[rws].astype(jnp.float32) * esc[rws][:, None]
            q = base + 0.02 * jax.random.normal(key, base.shape)
            return q / jnp.linalg.norm(q, axis=1, keepdims=True)

        qf = make_queries(e_i8, e_scale, jnp.asarray(rows),
                          jax.random.key(99))
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_n, N_TERMS)),
                         jnp.int32)
        qw = jnp.abs(jax.random.normal(jax.random.key(5),
                                       (q_n, N_TERMS)))

        def hybrid(q, ei8, esc, pd, pi, et, ei, qqt, qqw):
            ds, di = approx_topk_int8_blockscan(
                q, ei8, esc, 40, oversample=2, block_rows=BLOCK)
            ss, si = postings_candidates_topk(pd, pi, et, ei, qqt, qqw,
                                              k=40, n_candidates=128)
            arms = jnp.stack([di, si], axis=0)
            return rrf_fuse(arms, weights, topk=K)

        # correctness: dense arm self-match via the fused output
        s_h, i_h = jax.jit(hybrid)(qf, e_i8, e_scale, post_docs,
                                   post_imps, ell_t, ell_i, qt, qw)
        ds, di = approx_topk_int8_blockscan(qf, e_i8, e_scale, 10,
                                            oversample=4,
                                            block_rows=BLOCK)
        self_match = float(np.mean(np.asarray(di)[:, 0] == rows))
        print(f"batch {q_n}: dense self-match@1 = {self_match}",
              flush=True)

        def chain(q, *ops):
            def body(c, _):
                s, i = hybrid(c, *ops)
                bump = (s[:, :1] * 0).astype(c.dtype)
                return c + bump, s[0, 0]
            return jax.lax.scan(body, q, None, length=ITERS)[1]

        chain_j = jax.jit(chain)
        args = (qf, e_i8, e_scale, post_docs, post_imps, ell_t, ell_i,
                qt, qw)
        np.asarray(chain_j(*args))
        t0 = time.time()
        np.asarray(chain_j(*args))
        dt = (time.time() - t0) / ITERS
        out[f"batch{q_n}"] = {"ms": round(dt * 1e3, 2),
                              "qps": round(q_n / dt, 1),
                              "dense_self_match_at_1": self_match}
        print(f"batch {q_n}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps",
              flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
