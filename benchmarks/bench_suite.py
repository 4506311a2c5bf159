#!/usr/bin/env python
"""Benchmark suite for the BASELINE.json configs, on one real TPU chip.

  config 2 — 100k synthetic corpus, brute-force top-k, batch 1 and 64
  config 3 — 1M hybrid retrieval: dense + sparse lexical + RRF, top-10
  config 4 — ColBERT MaxSim rerank over dense top-100
  config 5 — sharded scaling probe (2M chunks single-chip; the multi-chip
             path is validated on the CPU fake-mesh by tests/test_mesh.py)

Timing uses dependent on-device chains (see bench.py for why). Results
append to benchmarks/RESULTS.jsonl; prose summary in BENCHMARKS.md.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

OUT = pathlib.Path(__file__).parent / "RESULTS.jsonl"


def record(name: str, **fields):
    entry = {"bench": name, "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
             "device": str(jax.devices()[0]), **fields}
    print(json.dumps(entry), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(entry) + "\n")


def chain_time(fn, x, *extra, steps=20):
    """Time fn((x, *extra) -> arrays) via a dependent scan chain; returns
    s/iter. `extra` arrays are threaded as jit ARGUMENTS — closing over
    multi-GB device arrays turns them into lowered constants and stalls
    remote compilation."""
    def run(q, *args):
        def body(c, _):
            out = fn(c, *args)
            leaf = out[0] if isinstance(out, tuple) else out
            bump = (leaf.reshape(-1)[0] * 0).astype(c.dtype)
            return c + bump, leaf.reshape(-1)[0]
        return jax.lax.scan(body, q, None, length=steps)[1]

    cj = jax.jit(run)
    np.asarray(cj(x, *extra))  # compile+warm
    t0 = time.time()
    np.asarray(cj(x, *extra))
    return (time.time() - t0) / steps


def make_corpus(n, d, seed=0, dtype=jnp.bfloat16):
    @jax.jit
    def gen(key):
        e = jax.random.normal(key, (n, d), jnp.bfloat16).astype(jnp.float32)
        e = e / jnp.sqrt(jnp.sum(jnp.square(e), axis=1, keepdims=True))
        return e.astype(dtype)
    e = gen(jax.random.key(seed))
    e.block_until_ready()
    return e


def queries(q, d, seed=1):
    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (q, d), jnp.float32)
        x = x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
        return x.astype(jnp.bfloat16)
    return gen(jax.random.key(seed))


def bench_config2():
    from rag_dpo_tpu.ops import approx_topk, blocked_topk, fused_topk

    n, d, k = 100_000, 1024, 40
    embs = make_corpus(n, d)
    for q in (1, 64):
        qs = queries(q, d)
        for name, fn in (
            ("approx", lambda c, e: approx_topk(c, e, k)),
            ("fused_pallas", lambda c, e: fused_topk(c, e, k,
                                                     interpret=False)),
            ("blocked_exact", lambda c, e: blocked_topk(c, e, k)),
        ):
            dt = chain_time(fn, qs, embs)
            record("config2_dense_100k", variant=name, batch=q,
                   ms_per_batch=round(dt * 1e3, 3),
                   qps=round(q / dt, 1))


def bench_config3():
    from rag_dpo_tpu.ops import approx_topk, rrf_fuse
    from rag_dpo_tpu.ops.postings import (
        PostingsIndex,
        postings_candidates_topk,
    )

    n, d, k = 1_000_000, 1024, 10
    ell_w, n_terms, q, vocab = 24, 16, 64, 50_000
    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, vocab, (n, ell_w)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((n, ell_w))).astype(np.float32)
    t0 = time.time()
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=vocab,
                               cap=512)
    invert_s = time.time() - t0
    arrays = pidx.device_arrays()
    et = jax.device_put(jnp.asarray(terms_h))
    ei = jax.device_put(jnp.asarray(impacts_h))
    qt = jnp.asarray(rng.integers(0, vocab, (q, n_terms)), jnp.int32)
    qw = jnp.abs(jax.random.normal(jax.random.key(5), (q, n_terms)))
    qs = queries(q, d)

    def sparse_only(qq, pd, pi, ett, eii, qqt, qqw):
        s, i = postings_candidates_topk(pd, pi, ett, eii, qqt, qqw, k=40)
        return (s + 0 * qq.astype(jnp.float32)[0, 0],)

    dt = chain_time(sparse_only, qs, *arrays, et, ei, qt, qw)
    record("config3_sparse_arm_1M_dense_layout", batch=q,
           ms_per_batch=round(dt * 1e3, 3), qps=round(q / dt, 1),
           cap=512, invert_s=round(invert_s, 2))

    embs = make_corpus(n, d)

    def hybrid(qq, e, pd, pi, ett, eii, qqt, qqw):
        ds, di = approx_topk(qq, e, 40)
        ss, si = postings_candidates_topk(pd, pi, ett, eii, qqt, qqw,
                                          k=40)
        arms = jnp.stack([di, si], axis=0)  # [2, Q, 40]
        return rrf_fuse(arms, jnp.asarray([2.0, 1.5], jnp.float32),
                        topk=k)

    dt = chain_time(hybrid, qs, embs, *arrays, et, ei, qt, qw)
    record("config3_hybrid_1M_fast", batch=q,
           ms_per_batch=round(dt * 1e3, 3), qps=round(q / dt, 1),
           ell_width=ell_w)


def bench_config4():
    from rag_dpo_tpu.ops.maxsim import maxsim

    # rerank dense top-100 with ColBERT MaxSim: 1 query × 100 candidates
    lq, ld, dc, c = 32, 128, 128, 100
    qv = jax.random.normal(jax.random.key(6), (1, lq, dc), jnp.float32)
    dv = jax.random.normal(jax.random.key(7), (c, ld, dc), jnp.float32)
    qm = jnp.ones((1, lq), bool)
    dm = jnp.ones((c, ld), bool)

    def fn(qq, dvv, qmm, dmm):
        s = maxsim(qq, qmm, dvv, dmm, interpret=False)
        return (s,)

    dt = chain_time(fn, qv, dv, qm, dm)
    record("config4_maxsim_rerank", candidates=c, q_tokens=lq,
           d_tokens=ld, ms_per_query=round(dt * 1e3, 3),
           pairs_per_sec=round(c / dt, 1))


def bench_config5():
    from rag_dpo_tpu.ops import approx_topk

    d, k, q = 1024, 10, 64
    for n in (2_000_000, 4_000_000):
        try:
            embs = make_corpus(n, d)
            qs = queries(q, d)
            dt = chain_time(lambda c, e: approx_topk(c, e, k), qs, embs,
                            steps=10)
            record("config5_scaling", n_chunks=n,
                   ms_per_batch=round(dt * 1e3, 3),
                   qps=round(q / dt, 1),
                   hbm_gb=round(n * d * 2 / 2**30, 1))
            del embs
        except Exception as e:
            record("config5_scaling", n_chunks=n,
                   error=f"{type(e).__name__}: {e}"[:200])
            break


def bench_encoder():
    """Flash-attention encoder forward throughput (BGE-M3-large shape)."""
    from rag_dpo_tpu.models import EncoderConfig, TransformerEncoder

    for s, b in ((512, 16), (2048, 4), (8192, 1)):
        cfg = EncoderConfig(
            vocab_size=250_002, hidden_size=1024, num_layers=24,
            num_heads=16, intermediate_size=4096,
            max_position_embeddings=8194, dtype=jnp.bfloat16,
            use_flash_attention=True,
        )
        model = TransformerEncoder(cfg)
        ids = jax.random.randint(jax.random.key(8), (b, s), 4, 250_000,
                                 jnp.int32)
        lengths = jnp.full((b,), s, jnp.int32)
        try:
            params = jax.jit(model.init)(jax.random.key(0), ids, lengths)
            apply = jax.jit(model.apply)
            out = apply(params, ids, lengths)
            out.block_until_ready()
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                out = apply(params, ids, lengths)
            np.asarray(out[0, 0, :1])
            dt = (time.time() - t0) / reps
            record("encoder_forward_bge_m3_large", seq_len=s, batch=b,
                   ms=round(dt * 1e3, 1),
                   tokens_per_sec=round(b * s / dt, 0))
            del params
        except Exception as e:
            record("encoder_forward_bge_m3_large", seq_len=s, batch=b,
                   error=f"{type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    table = {
        "2": bench_config2, "3": bench_config3, "4": bench_config4,
        "5": bench_config5, "encoder": bench_encoder,
    }
    if which == "all":
        for fn in table.values():
            try:
                fn()
            except Exception as e:
                record("suite_error", fn=fn.__name__,
                       error=f"{type(e).__name__}: {e}"[:300])
    else:
        table[which]()
