"""10M chunks × 1024-d on ONE v5e chip — int8 residency capability proof.

10M×1024 bf16 would need 20 GB; int8 with per-row scales fits in 10 GB,
searched by the int8 sweep + device dequant refine
(`approx_topk_int8_selfrefined`) — no full-precision row store resident.
The corpus is built in 1M-row slabs written into a donated target
(XLA input-output aliasing: no 2× peak). Batch kept at 32 so the
[Q, 10M] score intermediates (~1.9 GB) fit beside the corpus.

Checks: planted-neighbor self-match at rank 1, then dependent-chain
timing. (BASELINE config 5 proves 10M on an 8-device CPU mesh; this is
the single-chip capacity point on real hardware.)
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

from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_selfrefined,
    quantize_rows,
)

N, D, Q, K = 10_000_000, 1024, 32, 10
SLAB = 1_000_000
ITERS = 10


@jax.jit
def make_slab(key):
    e = jax.random.normal(key, (SLAB, D), jnp.bfloat16)
    nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1,
                           keepdims=True))
    return quantize_rows((e.astype(jnp.float32) / nrm))


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
    build_s = time.time() - t0
    print(f"10M int8 corpus resident in {build_s:.1f}s", flush=True)

    # queries = perturbed corpus rows spread across slabs
    rng = np.random.default_rng(7)
    rows = rng.integers(0, N, Q)

    @jax.jit
    def make_queries(ei8, esc, rws, key):
        base = ei8[rws].astype(jnp.float32) * esc[rws][:, None]
        q = base + 0.02 * jax.random.normal(key, base.shape)
        return q / jnp.linalg.norm(q, axis=1, keepdims=True)

    qf = make_queries(e_i8, e_scale, jnp.asarray(rows), jax.random.key(99))

    s, i = approx_topk_int8_selfrefined(qf, e_i8, e_scale, K, oversample=4)
    i = np.asarray(i)
    self_match = float(np.mean(i[:, 0] == rows))
    print("planted-neighbor rank-1 self-match:", self_match, flush=True)

    @jax.jit
    def chain(q, ei8, esc):
        def step(carry, _):
            out = approx_topk_int8_selfrefined(carry, ei8, esc, K,
                                               oversample=4)
            return carry + (jnp.sum(out[0]) * 0.0).astype(carry.dtype), \
                out[0][0, 0]
        return jax.lax.scan(step, q, None, length=ITERS)[1]

    np.asarray(chain(qf, e_i8, e_scale))
    t0 = time.time()
    np.asarray(chain(qf, e_i8, e_scale))
    dt = (time.time() - t0) / ITERS

    res = {"bench": "dense_10M_one_chip_int8", "batch": Q, "k": K,
           "device": str(jax.devices()[0]),
           "corpus_build_s": round(build_s, 1),
           "hbm_corpus_gb": round(N * D / 2**30, 1),
           "ms_per_batch": round(dt * 1e3, 3),
           "qps": round(Q / dt, 1),
           "self_match_at_1": self_match,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(res), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
