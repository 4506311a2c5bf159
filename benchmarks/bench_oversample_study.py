"""Oversample/int8 Pareto study on the PRODUCTION hybrid recipe.

VERDICT r4 item 3: round 4 flipped bench.py's oversample knob 2→4 blind
and regressed the headline (76.3k→61.8k qps) while still reporting
recall from a DIFFERENT program: the timed pipeline sweeps k=40
candidates per arm (so the fused top-10 draws on 40·oversample refined
survivors), but the old sanity check measured `approx_topk_int8_refined`
at k=10 directly (only 10·oversample survivors) — understating the
recipe's actual recall@10 and motivating the blind flip.

This study measures, for oversample ∈ {1,2,3,4}:
  * qps of the full hybrid pipeline (identical to bench.py's timed
    program: int8 sweep → exact bf16 refine top-40, postings sparse
    top-40, device RRF → top-10, batch 256, dependent scan chain);
  * recall@10 of the RECIPE's dense arm — head of the refined top-40 —
    vs the exact bf16 blocked kernel (the metric the fused output
    actually experiences);
  * recall@40 of the dense candidate set vs exact top-40 (the RRF
    input fidelity);
  * fused top-10 overlap vs the same pipeline with an exact dense arm
    (end-to-end fidelity of the int8 approximation).

Output: one JSON line per setting + a Pareto verdict. Runs on the one
real TPU chip. Paste the table into BENCHMARKS.md (replacing the stale
"identical latency" table) and set bench.py's default from the verdict.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N = 1_000_000
D = 1024
Q = 256
K = 10
CAND = 40
ELL_W = 24
N_TERMS = 16
VOCAB = 50_000
STEPS = 40


def main():
    import jax

    try:
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
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=256)
    post_docs, post_imps = pidx.device_arrays()
    qt = jnp.asarray(rng.integers(0, VOCAB, (Q, N_TERMS)), jnp.int32)
    qw = jnp.abs(jax.random.normal(jax.random.key(5), (Q, N_TERMS)))

    @jax.jit
    def make_queries(key):
        x = jax.random.normal(key, (Q, D), jnp.float32)
        return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))

    queries = make_queries(jax.random.key(1))
    weights = jnp.asarray([2.0, 1.5], jnp.float32)

    # ---- exact references (computed once) --------------------------
    s_e40, i_e40 = blocked_topk(queries.astype(jnp.bfloat16), embs,
                                CAND, block_n=65_536)
    i_e40 = np.asarray(i_e40)
    i_e10 = i_e40[:, :K]

    ss_ref, si_ref = postings_candidates_topk(
        post_docs, post_imps, jnp.asarray(terms_h), jnp.asarray(impacts_h),
        qt, qw, k=CAND, n_candidates=64)
    exact_arms = jnp.stack([jnp.asarray(i_e40), si_ref], axis=0)
    _, fused_exact = rrf_fuse(exact_arms, weights, topk=K)
    fused_exact = np.asarray(fused_exact)

    def build_pipeline(oversample, recall_target=0.95):
        def hybrid(q, ei8, esc, eref, pd, pi, et, ei, qqt, qqw):
            ds, di = approx_topk_int8_refined(q, ei8, esc, eref, CAND,
                                              oversample=oversample,
                                              recall_target=recall_target)
            ss, si = postings_candidates_topk(pd, pi, et, ei, qqt, qqw,
                                              k=CAND, n_candidates=64)
            arms = jnp.stack([di, si], axis=0)
            return rrf_fuse(arms, weights, topk=K)

        def chain(q, *ops):
            def body(c, _):
                s, i = hybrid(c, *ops)
                bump = (s[:, :1] * 0).astype(c.dtype)
                return c + bump, s[0, 0]
            return jax.lax.scan(body, q, None, length=STEPS)[1]

        return jax.jit(chain), hybrid

    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))
    args = (queries, e_i8, e_scale, embs, post_docs, post_imps,
            ell_t, ell_i, qt, qw)

    rows = []

    def measure(o, rt):
        chain_j, hybrid = build_pipeline(o, rt)
        np.asarray(chain_j(*args))  # compile + warm
        t0 = time.time()
        np.asarray(chain_j(*args))
        dt = (time.time() - t0) / STEPS
        qps = Q / dt

        # recipe-matched recall: head of the refined top-40
        ds, di = approx_topk_int8_refined(queries, e_i8, e_scale, embs,
                                          CAND, oversample=o,
                                          recall_target=rt)
        di = np.asarray(di)
        r10 = float(np.mean([len(set(di[r, :K]) & set(i_e10[r])) / K
                             for r in range(Q)]))
        r40 = float(np.mean([len(set(di[r]) & set(i_e40[r])) / CAND
                             for r in range(Q)]))
        _, fi = jax.jit(hybrid)(*args)
        fi = np.asarray(fi)
        fo = float(np.mean([len(set(fi[r]) & set(fused_exact[r])) / K
                            for r in range(Q)]))
        row = {
            "oversample": o,
            "recall_target": rt,
            "qps": round(qps, 1),
            "ms_per_batch256": round(dt * 1e3, 3),
            "dense_recall_at_10_recipe": round(r10, 4),
            "dense_recall_at_40": round(r40, 4),
            "fused_top10_overlap_vs_exact_dense_arm": round(fo, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # axis 1: oversample under the default approx bucketing
    for o in (1, 2, 3, 4):
        measure(o, 0.95)
    # axis 2: recall saturates ~0.996 past oversample 2 — the limiter
    # is approx_max_k's bucketing, so sweep ITS knob at the cheap
    # oversample settings
    for o, rt in ((1, 0.99), (2, 0.99), (1, 0.999), (2, 0.999)):
        measure(o, rt)

    # Decision rule (BENCHMARKS.md "Oversample / recall_target study"):
    # if any setting reaches recall@10 >= 0.998, fastest such setting;
    # otherwise the recall ceiling is the int8 recipe itself — pick the
    # best top-40 candidate fidelity among the >=70k-qps rows (top-40
    # is what the production reranker consumes).
    ok = [r for r in rows
          if r["dense_recall_at_10_recipe"] >= 0.998]
    if ok:
        pick, note = max(ok, key=lambda r: r["qps"]), "recall_met"
    else:
        fast = [r for r in rows if r["qps"] >= 70_000] or rows
        pick = max(fast, key=lambda r: r["dense_recall_at_40"])
        note = ("int8_ceiling: recall@10 saturates below 0.998 at "
                "every setting — quantization noise floor, not "
                "candidate budget")
    print(json.dumps({"bench": "oversample_study_1M_hybrid",
                      "pareto_pick": pick, "pick_note": note,
                      "rows": rows,
                      "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
