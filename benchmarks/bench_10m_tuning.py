"""10M single-chip tuning pass: block-scan slab size × batch (VERDICT
round-2 item 8 — b256 full hybrid was 9.7k qps with slab=1M; the slab
size is the knob).

Sweeps the dense block-scan slab over {500k, 1M, 2M, 2.5M} rows at
batch {128, 256} for the FULL hybrid (block-scanned int8 sweep + dequant
refine top-40, postings sparse top-40, device RRF top-10), ELL width 8.

Run on the real chip:  python benchmarks/bench_10m_tuning.py
"""

import functools
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

N, D, K = 10_000_000, 1024, 10
SLAB = 1_000_000
ELL_W, N_TERMS, VOCAB = 8, 16, 50_000
ITERS = 6
BATCHES = (128, 256)
BLOCKS = (500_000, 1_000_000, 2_000_000, 2_500_000)


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


def main():
    e_i8 = jnp.zeros((N, D), jnp.int8)
    e_scale = jnp.zeros((N,), jnp.float32)
    t0 = time.time()
    for s in range(N // SLAB):
        si8, ssc = make_slab(jax.random.key(s))
        e_i8, e_scale = write_slab(e_i8, e_scale, si8, ssc,
                                   jnp.int32(s * SLAB))
    e_i8.block_until_ready()
    print(f"10M int8 corpus resident in {time.time() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(7)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=512)
    post_docs, post_imps = pidx.device_arrays()
    ell_t = jnp.zeros((N, ELL_W), jnp.int32)
    ell_i = jnp.zeros((N, ELL_W), jnp.float32)
    for s in range(N // SLAB):
        sl = slice(s * SLAB, (s + 1) * SLAB)
        ell_t = jax.jit(
            lambda t, x, st: jax.lax.dynamic_update_slice(t, x, (st, 0)),
            donate_argnums=0)(ell_t, jnp.asarray(terms_h[sl]),
                              jnp.int32(s * SLAB))
        ell_i = jax.jit(
            lambda t, x, st: jax.lax.dynamic_update_slice(t, x, (st, 0)),
            donate_argnums=0)(ell_i, jnp.asarray(impacts_h[sl]),
                              jnp.int32(s * SLAB))
    ell_t.block_until_ready()
    print("ELL arrays resident", flush=True)
    weights = jnp.asarray([2.0, 1.5], jnp.float32)

    out = {"bench": "hybrid_10M_tuning", "k": K, "ell_w": ELL_W,
           "device": str(jax.devices()[0]),
           "hbm_gb": round((N * D + N * ELL_W * 8) / 2**30, 1)}

    for q_n in BATCHES:
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_n, N_TERMS)),
                         jnp.int32)
        qw = jnp.abs(jax.random.normal(jax.random.key(5),
                                       (q_n, N_TERMS)))
        rows = rng.integers(0, N, q_n)

        @jax.jit
        def make_queries(ei8, esc, rws, key):
            base = ei8[rws].astype(jnp.float32) * esc[rws][:, None]
            q = base + 0.02 * jax.random.normal(key, base.shape)
            return q / jnp.linalg.norm(q, axis=1, keepdims=True)

        qf = make_queries(e_i8, e_scale, jnp.asarray(rows),
                          jax.random.key(99))

        for blk in BLOCKS:
            def hybrid(q, ei8, esc, pd, pi, et, ei, qqt, qqw):
                ds, di = approx_topk_int8_blockscan(
                    q, ei8, esc, 40, oversample=2, block_rows=blk)
                ss, si = postings_candidates_topk(
                    pd, pi, et, ei, qqt, qqw, k=40, n_candidates=128)
                arms = jnp.stack([di, si], axis=0)
                return rrf_fuse(arms, weights, topk=K)

            def chain(q, *ops):
                def body(c, _):
                    s, i = hybrid(c, *ops)
                    bump = (s[:, :1] * 0).astype(c.dtype)
                    return c + bump, s[0, 0]
                return jax.lax.scan(body, q, None, length=ITERS)[1]

            args = (qf, e_i8, e_scale, post_docs, post_imps,
                    ell_t, ell_i, qt, qw)
            cj = jax.jit(chain)
            np.asarray(cj(*args))
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                np.asarray(cj(*args))
                best = min(best, (time.time() - t0) / ITERS)
            key = f"b{q_n}_blk{blk // 1000}k"
            out[key] = {"ms": round(best * 1e3, 3),
                        "qps": round(q_n / best, 1)}
            print(f"batch {q_n} blk {blk}: {best * 1e3:.2f} ms  "
                  f"{q_n / best:.0f} qps", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
