"""Sparse-arm rescore optimization variants at 1M chunks, batch 1024
(VERDICT round-2 item 2 follow-up to bench_sparse_phases.py: the ELL
rescore dominates and scales linearly with batch).

Variants:
  v0_current      production two-gather rescore ([N,L] terms + impacts)
  v1_packed       ONE gather from an interleaved [N, 2L] i32 table
                  (impacts bitcast) — halves the random row fetches
  v2_packed_bf16  v1 + bf16 contribution join
  v3_sortsum      gather-free: sort phase-1 (doc, contribution) pairs by
                  doc id per query, segmented-sum totals, top-k — exact
                  under postings truncation (no ELL table at all)
Each variant reports ms and top-k id overlap vs v0.

Run on the real chip:  python benchmarks/bench_sparse_variants.py
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
Q = 1024


def timed(fn, args, iters=ITERS):
    def chain(*a):
        def body(c, _):
            outs = fn(c, *a[1:])
            probe = jnp.asarray(outs[0]).reshape(-1)[0]
            bump = (probe * 0).astype(a[0].dtype)
            return a[0] + bump, probe
        return jax.lax.scan(body, a[0], None, length=iters)[1]

    cj = jax.jit(chain)
    np.asarray(cj(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(cj(*args))
        best = min(best, (time.time() - t0) / iters)
    return best


def phase1(qt, pd, pi, qw):
    tid = jnp.clip(qt, 0, pd.shape[0] - 1)
    q_valid = (qt >= 0)[:, :, None]
    docs = jnp.where(q_valid, pd[tid], SENTINEL)
    scores = jnp.where(q_valid & (docs != SENTINEL),
                       pi[tid] * qw[:, :, None], 0.0)
    q = qt.shape[0]
    return docs.reshape(q, -1), scores.reshape(q, -1)


def candidates(qt, pd, pi, qw):
    docs, scores = phase1(qt, pd, pi, qw)
    _, pos = jax.lax.approx_max_k(scores.astype(jnp.bfloat16), C)
    return jnp.take_along_axis(docs, pos, axis=1)


def finish(total, cand):
    cand_valid = cand != SENTINEL
    safe = jnp.where(cand_valid, cand, 0)
    same = cand[:, :, None] == cand[:, None, :]
    earlier = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
               < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1))
    dup = jnp.any(same & earlier[None], axis=1)
    t2 = jnp.where(cand_valid & ~dup, total, NEG_INF)
    top, ppos = jax.lax.top_k(t2, K)
    ids = jnp.where(top > NEG_INF / 2,
                    jnp.take_along_axis(safe, ppos, axis=1), -1)
    return top, ids


def main():
    only = set(sys.argv[1:])  # e.g. `v0 v1` — empty = all
    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    pidx = PostingsIndex.build(terms_h, impacts_h, vocab_size=VOCAB,
                               cap=CAP)
    post_docs, post_imps = pidx.device_arrays()
    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))
    packed_h = np.empty((N, 2 * ELL_W), np.int32)
    packed_h[:, 0::2] = terms_h
    packed_h[:, 1::2] = impacts_h.view(np.int32)
    ell_p = jax.device_put(jnp.asarray(packed_h))

    qt = jnp.asarray(rng.integers(0, VOCAB, (Q, N_TERMS)), jnp.int32)
    qw = jnp.abs(jax.random.normal(jax.random.key(5), (Q, N_TERMS)))

    def v0(qt_, pd, pi, et, ei, qw_):
        return postings_candidates_topk(pd, pi, et, ei, qt_, qw_,
                                        k=K, n_candidates=C)

    def v1(qt_, pd, pi, ep, qw_):
        cand = candidates(qt_, pd, pi, qw_)
        safe = jnp.where(cand != SENTINEL, cand, 0)
        rows = ep[safe]                               # [Q, C, 2L] ONE gather
        ct = rows[:, :, 0::2]
        ci = jax.lax.bitcast_convert_type(rows[:, :, 1::2], jnp.float32)
        match = ct[:, :, :, None] == qt_[:, None, None, :]
        contrib = jnp.where(
            match, ci[:, :, :, None] * qw_[:, None, None, :], 0.0)
        return finish(jnp.sum(contrib, axis=(2, 3)), cand)

    def v2(qt_, pd, pi, ep, qw_):
        cand = candidates(qt_, pd, pi, qw_)
        safe = jnp.where(cand != SENTINEL, cand, 0)
        rows = ep[safe]
        ct = rows[:, :, 0::2]
        ci = jax.lax.bitcast_convert_type(
            rows[:, :, 1::2], jnp.float32).astype(jnp.bfloat16)
        match = ct[:, :, :, None] == qt_[:, None, None, :]
        contrib = jnp.where(
            match,
            ci[:, :, :, None] * qw_.astype(jnp.bfloat16)[:, None, None, :],
            jnp.bfloat16(0.0))
        total = jnp.sum(contrib.astype(jnp.float32), axis=(2, 3))
        return finish(total, cand)

    def v3(qt_, pd, pi, qw_):
        docs, scores = phase1(qt_, pd, pi, qw_)       # [Q, T*cap]
        order = jnp.argsort(docs, axis=1)
        dsort = jnp.take_along_axis(docs, order, axis=1)
        ssort = jnp.take_along_axis(scores, order, axis=1)
        seg = jnp.cumsum(ssort, axis=1)
        is_last = jnp.concatenate(
            [dsort[:, :-1] != dsort[:, 1:],
             jnp.ones((dsort.shape[0], 1), bool)], axis=1)
        run_start = jnp.concatenate(
            [jnp.ones((dsort.shape[0], 1), bool),
             dsort[:, 1:] != dsort[:, :-1]], axis=1)
        # run total = cumsum at the run's last slot − cumsum just before
        # the run started (propagated by a max-scan; scores are ≥ 0 so
        # cumsum is non-decreasing and max picks the latest run base)
        totals = jnp.where(is_last & (dsort != SENTINEL),
                           seg - _run_base(seg, run_start), -jnp.inf)
        top, pos = jax.lax.top_k(totals, K)
        ids = jnp.where(top > -1e29,
                        jnp.take_along_axis(dsort, pos, axis=1), -1)
        return top, ids

    def _run_base(seg, run_start):
        """Value of `seg` just before each run started, propagated to
        every element of the run (max-scan of masked shifted cumsum)."""
        prev = jnp.concatenate(
            [jnp.zeros((seg.shape[0], 1), seg.dtype), seg[:, :-1]],
            axis=1)
        marked = jnp.where(run_start, prev, -jnp.inf)
        return jax.lax.associative_scan(jnp.maximum, marked, axis=1)

    out = {"bench": "sparse_rescore_variants_1M_b1024", "C": C, "k": K,
           "device": str(jax.devices()[0])}

    print("setup done; computing v0 reference...", flush=True)
    ref_s, ref_i = jax.jit(v0)(qt, post_docs, post_imps, ell_t, ell_i, qw)
    ref_i = np.asarray(ref_i)
    print("reference ready", flush=True)

    for name, fn, args in (
        ("v0_current", v0, (qt, post_docs, post_imps, ell_t, ell_i, qw)),
        ("v1_packed", v1, (qt, post_docs, post_imps, ell_p, qw)),
        ("v2_packed_bf16", v2, (qt, post_docs, post_imps, ell_p, qw)),
        ("v3_sortsum", v3, (qt, post_docs, post_imps, qw)),
    ):
        if only and name.split("_")[0] not in only:
            continue
        try:
            print(f"{name}: compiling...", flush=True)
            s, i = jax.jit(fn)(*args)
            i = np.asarray(i)
            overlap = float(np.mean([
                len(set(i[r][i[r] >= 0]) & set(ref_i[r][ref_i[r] >= 0]))
                / max((ref_i[r] >= 0).sum(), 1)
                for r in range(Q)
            ]))
            dt = timed(fn, args)
            out[name] = {"ms": round(dt * 1e3, 3),
                         "overlap_vs_v0": round(overlap, 4)}
            print(f"{name}: {dt * 1e3:.2f} ms  overlap {overlap:.4f}",
                  flush=True)
        except Exception as e:
            out[name] = {"error": str(e)[:300]}
            print(f"{name} FAILED: {e}", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
