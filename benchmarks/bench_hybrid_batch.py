"""Hybrid throughput vs query batch: the corpus read (the dominant cost)
amortizes across queries, so qps scales with batch until compute-bound.

Corpus arrays are threaded as jit arguments, NOT closure constants — a
closing jit captures 3 GB into the HLO and stalls the remote-compile
tunnel for minutes (root cause of round 2's deferred batch scaling)."""

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
ITERS = 10
WEIGHTS = np.asarray([2.0, 1.5], np.float32)


def hybrid(q, ei8, esc, eref, pd, pi, et, ei, qqt, qqw, w):
    ds, di = approx_topk_int8_refined(q, ei8, esc, eref, K_ARM,
                                      oversample=2)
    ss, si = postings_candidates_topk(pd, pi, et, ei, qqt, qqw,
                                      k=K_ARM, n_candidates=128)
    arms = jnp.stack([di, si], axis=0)
    return rrf_fuse(arms, w, topk=K)


@jax.jit
def chain(q, ei8, esc, eref, pd, pi, et, ei, qqt, qqw, w):
    def step(carry, _):
        s, i = hybrid(carry, ei8, esc, eref, pd, pi, et, ei, qqt, qqw, w)
        return carry + (s[:, :1] * 0.0).astype(carry.dtype), s[0, 0]
    return jax.lax.scan(step, q, None, length=ITERS)[1]


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
    w = jnp.asarray(WEIGHTS)
    print("corpus ready", flush=True)

    res = {"bench": "hybrid_batch_scaling_1M", "k": K,
           "device": str(jax.devices()[0])}
    for q_batch in (64, 128, 256):
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_batch, N_TERMS)),
                         jnp.int32)
        qw = jnp.asarray(np.abs(rng.standard_normal(
            (q_batch, N_TERMS))), jnp.float32)
        qf = jnp.asarray(rng.standard_normal((q_batch, D)), jnp.float32)
        qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
        args = (qf, e_i8, e_scale, embs, pd, pi, d_terms, d_imps, qt, qw,
                w)
        try:
            t0 = time.time()
            np.asarray(chain(*args))
            print(f"b{q_batch} chain compiled in",
                  round(time.time() - t0, 1), flush=True)
            t0 = time.time()
            np.asarray(chain(*args))
            dt = (time.time() - t0) / ITERS
            res[f"batch{q_batch}"] = {"ms": round(dt * 1e3, 3),
                                      "qps": round(q_batch / dt, 1)}
            print(q_batch, res[f"batch{q_batch}"], flush=True)
        except Exception as e:  # noqa: BLE001
            res[f"batch{q_batch}_error"] = str(e)[:300]
            print("ERR", q_batch, str(e)[:300], flush=True)

    print(json.dumps(res))
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps({**res,
                            "ts": time.strftime("%Y-%m-%dT%H:%M:%S")})
                + "\n")


if __name__ == "__main__":
    main()
