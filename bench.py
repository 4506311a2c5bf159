"""Headline benchmark: FULL hybrid retrieval throughput at 1M chunks.

Runs on one real TPU chip. Builds a synthetic 1M×1024 corpus (int8 +
per-row scales for the sweep, bf16 for the exact refine) plus a 1M×24
lexical ELL corpus on device, then measures the complete hybrid
retrieval recipe — int8 dense sweep → exact bf16 refine of the
oversampled survivors (top-40) + impact-ordered-postings sparse top-40 +
weighted RRF fusion to top-10, all on device — at batch 256.
BASELINE.json north star: ≥10k queries/sec at 1M chunks (the reference
never publishes QPS; its single-user hnswlib stack was never
load-tested). Round-1 recipe (bf16 dense approx, batch 64) measured
13.9k qps; int8+refine lifted batch-64 to ~20-21k; batch 256 amortizes
the corpus read across 4× the queries. Round 3 tunes the sparse arm
(postings cap 256, rescore pool 64 — measured LOSSLESS vs the
exhaustive config, fused top-10 overlap 1.0000 at every batch) so the
hybrid tracks the dense arm within ~7% through batch 2048
(benchmarks/bench_hybrid_tuned.py; BENCHMARKS.md "Hybrid tracking
dense").

Round 5 sets the sweep knobs from a measured Pareto study
(benchmarks/bench_oversample_study.py, table in BENCHMARKS.md):
recipe recall@10 saturates at 0.9965 across EVERY knob setting — even
oversample=2 + recall_target=0.999 at 6.5k qps — so the ceiling is the
int8 quantization noise itself on this tight-margin Gaussian corpus,
not candidate count; ≥0.998 is unreachable inside the int8 recipe at
any throughput. The chosen Pareto point is oversample=2 @ the default
bucketing: ≥70k qps with recall@40 0.9881 (the RRF/rerank candidate
fidelity) and recipe recall@10 0.9957. The recall figure reported
below is recipe-matched (head of the refined top-40, the candidates
the fused top-10 actually draws on); round 4 reported a k=10-sweep
recall instead, understating the recipe.

Timing uses a dependent on-device chain (scan feeding results back into
the query batch): host↔device round-trips through the axon tunnel are
~28 ms and `block_until_ready` is unreliable there.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

N = 1_000_000
D = 1024
Q = 256
K = 10
ELL_W = 24
N_TERMS = 16
VOCAB = 50_000
BASELINE_QPS = 10_000.0  # BASELINE.json: ">=10k queries/sec at 1M chunks"
# int8-sweep knobs, set from the measured Pareto study (round 5,
# benchmarks/bench_oversample_study.py → BENCHMARKS.md "Oversample /
# recall_target study"): recall@10 saturates at 0.9965 at every
# setting (int8 noise floor, not a candidate-budget problem), so the
# pick is the ≥70k-qps point with the best top-40 candidate fidelity.
OVERSAMPLE = 2
RECALL_TARGET = 0.95


def main():
    import jax

    try:  # persistent compile cache: repeat runs skip remote compiles
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from rag_dpo_tpu.ops import blocked_topk, rrf_fuse
    from rag_dpo_tpu.ops.postings import (
        PostingsIndex,
        postings_candidates_topk,
    )
    from rag_dpo_tpu.ops.quantize import (
        approx_topk_int8_refined,
        quantize_rows,
    )

    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        norm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)),
                                axis=1, keepdims=True))
        return (e.astype(jnp.float32) / norm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    embs.block_until_ready()
    e_i8, e_scale = jax.jit(quantize_rows)(embs)
    e_i8.block_until_ready()

    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    t0 = time.time()
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=256)
    invert_s = time.time() - t0
    post_docs, post_imps = pidx.device_arrays()
    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))
    qt = jnp.asarray(rng.integers(0, VOCAB, (Q, N_TERMS)), jnp.int32)
    qw = jnp.abs(jax.random.normal(jax.random.key(5), (Q, N_TERMS)))

    @jax.jit
    def make_queries(key):
        x = jax.random.normal(key, (Q, D), jnp.float32)
        return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))

    queries = make_queries(jax.random.key(1))
    steps = 40
    weights = jnp.asarray([2.0, 1.5], jnp.float32)

    def hybrid(q, ei8, esc, eref, pd, pi, et, ei, qqt, qqw):
        ds, di = approx_topk_int8_refined(q, ei8, esc, eref, 40,
                                          oversample=OVERSAMPLE,
                                          recall_target=RECALL_TARGET)
        ss, si = postings_candidates_topk(pd, pi, et, ei, qqt, qqw,
                                          k=40, n_candidates=64)
        arms = jnp.stack([di, si], axis=0)
        return rrf_fuse(arms, weights, topk=K)

    def chain(q, *ops):
        def body(c, _):
            s, i = hybrid(c, *ops)
            bump = (s[:, :1] * 0).astype(c.dtype)
            return c + bump, s[0, 0]
        return jax.lax.scan(body, q, None, length=steps)[1]

    chain_j = jax.jit(chain)
    args = (queries, e_i8, e_scale, embs, post_docs, post_imps,
            ell_t, ell_i, qt, qw)
    np.asarray(chain_j(*args))  # compile + warm
    t0 = time.time()
    np.asarray(chain_j(*args))
    dt = (time.time() - t0) / steps
    qps = Q / dt

    # dense-arm recall vs exact blocked kernel, RECIPE-MATCHED: the
    # timed pipeline sweeps top-40 candidates per arm, so the fused
    # top-10 draws on the head of the refined top-40 — measure THAT
    # (round 4 measured a k=10 sweep instead, understating the recipe
    # by ~0.5pt and motivating a blind oversample flip)
    s_a, i_a = approx_topk_int8_refined(queries, e_i8, e_scale, embs, 40,
                                        oversample=OVERSAMPLE,
                                        recall_target=RECALL_TARGET)
    s_e, i_e = blocked_topk(queries.astype(jnp.bfloat16), embs, K,
                            block_n=65_536)
    i_a, i_e = np.asarray(i_a)[:, :K], np.asarray(i_e)
    recall = float(np.mean([
        len(set(i_a[r]) & set(i_e[r])) / K for r in range(Q)
    ]))

    out = {
        "metric": "hybrid_search_qps_1M_chunks_batch256_top10",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "latency_ms_per_batch256": round(dt * 1e3, 3),
        "dense_recall_at_10_recipe_vs_exact": round(recall, 4),
        "postings_invert_seconds": round(invert_s, 2),
        "pipeline": "int8 dense sweep + exact bf16 refine top-40 "
                    "+ postings sparse top-40 + device RRF to top-10",
        "corpus": {"n_chunks": N, "dim": D,
                   "dtype": "int8 sweep + bf16 refine",
                   "ell_width": ELL_W, "postings_cap": 256,
                   "postings_candidates": 64,
                   "oversample": OVERSAMPLE,
                   "recall_target": RECALL_TARGET},
    }
    # recorded-on-this-chip serving numbers (benchmarks/RESULTS.jsonl —
    # separate long-running runs, attached here so the round artifact
    # carries the serving story next to the retrieval headline)
    serving = _latest_serving_records()
    if serving:
        out["serving_recorded"] = serving
    print(json.dumps(out))


def _latest_serving_records():
    import pathlib

    path = pathlib.Path(__file__).parent / "benchmarks" / "RESULTS.jsonl"
    if not path.exists():
        return None
    latest = {}
    for line in path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except Exception:
            continue
        name = rec.get("bench", "")
        if name in ("e2e_rag_concurrent_12B_int8",
                    "ttft_streaming_rag_12B_int8",
                    "decode_throughput_12B_int8"):
            latest[name] = rec
    out = {}
    e2e = latest.get("e2e_rag_concurrent_12B_int8")
    if e2e:
        out["e2e_rag_12B"] = {
            "sequential_s_per_query": e2e["sequential"]["mean_latency_s"],
            "concurrent_qpm": e2e["concurrent"]["qpm"],
            "concurrent_workers": e2e["concurrent"]["workers"],
            "concurrent_mean_latency_s":
                e2e["concurrent"]["mean_latency_s"],
            "concurrent_intent_fast_qpm": e2e.get(
                "concurrent_intent_fast", {}).get("qpm"),
            "agent_sequential_s": e2e.get(
                "agent_sequential", {}).get("mean_latency_s"),
            "agent_concurrent_qpm": e2e.get(
                "agent_concurrent", {}).get("qpm"),
            "agent_concurrent_intent_fast_qpm": e2e.get(
                "agent_concurrent_intent_fast", {}).get("qpm"),
            "reference_s_per_query": 39.1,
            "ts": e2e.get("ts"),
        }
    ttft = latest.get("ttft_streaming_rag_12B_int8")
    if ttft:
        out["ttft_s"] = ttft["mean_ttft_s"]
    dec = latest.get("decode_throughput_12B_int8")
    if dec:
        best = max((a for a in dec.get("arms", [])
                    if "tok_per_s_aggregate" in a),
                   key=lambda a: a["tok_per_s_aggregate"], default=None)
        if best:
            out["decode_peak_tok_per_s"] = best["tok_per_s_aggregate"]
    return out or None


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({
            "metric": "hybrid_search_qps_1M_chunks_batch256_top10",
            "value": 0.0,
            "unit": "queries/sec",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        sys.exit(0)
