"""Benchmark fused_candidates_topk vs approx_topk on the real chip.

Timing via dependent on-device chains (axon tunnel RTT ~28 ms makes
naive sync timing meaningless — see bench.py).
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

from rag_dpo_tpu.ops import (
    approx_topk,
    blocked_topk,
    fused_candidates_topk,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, Q, K = 1024, 64, 40
ITERS = 20


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        norm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)),
                                axis=1, keepdims=True))
        return (e.astype(jnp.float32) / norm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    embs.block_until_ready()
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((Q, D)), jnp.bfloat16)

    def chain(search):
        @jax.jit
        def run(q, embs):
            def step(carry, _):
                qq = carry
                s, i = search(qq, embs)
                # feed a zero-mix of results back so steps are dependent
                mix = (jnp.sum(s) * 0.0).astype(qq.dtype)
                return qq + mix, s[0, 0]
            out, ss = jax.lax.scan(step, q, None, length=ITERS)
            return ss
        return run

    results = {}
    variants = {
        "approx": lambda q, e: approx_topk(q, e, K),
        "fused_cand_s128_p2": lambda q, e: fused_candidates_topk(
            q, e, K, block_n=2048, seg=128, per_seg=2),
        "fused_cand_s128_p1": lambda q, e: fused_candidates_topk(
            q, e, K, block_n=2048, seg=128, per_seg=1),
    }
    for name, fn in variants.items():
        try:
            run = chain(fn)
            np.asarray(run(q0, embs))  # compile + warm
            t0 = time.time()
            np.asarray(run(q0, embs))
            dt = (time.time() - t0) / ITERS
            results[name] = {"ms_per_batch": round(dt * 1e3, 3),
                             "qps": round(Q / dt, 1)}
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, "->", results[name], flush=True)

    # recall check vs exact (single dispatch, small query count)
    try:
        s_f, i_f = fused_candidates_topk(q0, embs, K)
        s_e, i_e = blocked_topk(q0, embs, K)
        i_f, i_e = np.asarray(i_f), np.asarray(i_e)
        rec = np.mean([len(set(i_f[r]) & set(i_e[r])) / K
                       for r in range(Q)])
        results["recall_at_40_vs_exact"] = round(float(rec), 5)
    except Exception as e:  # noqa: BLE001
        results["recall_error"] = str(e)[:200]

    print(json.dumps({"bench": f"fused_candidates_{N}", **results}))


if __name__ == "__main__":
    main()
