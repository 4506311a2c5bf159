"""10M chunks × 1024-d on ONE v5e chip at batch 64-256 via the
block-scanned int8 sweep.

The full-sweep path (`bench_10m_one_chip.py`) is capped at batch 32 by
the [Q, 10M] score intermediate. `approx_topk_int8_blockscan` scans
1M-row slabs with a carried running top-(k·oversample), so the live
intermediate is [Q, 1M] and batch 256 fits beside the 9.5 GB corpus —
the corpus HBM read amortizes over 8× the queries.
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
    approx_topk_int8_blockscan,
    quantize_rows,
)

N, D, K = 10_000_000, 1024, 10
SLAB = 1_000_000
ITERS = 8
BATCHES = (64, 128, 256)


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
    print(f"10M int8 corpus resident in {time.time() - t0:.1f}s",
          flush=True)

    rng = np.random.default_rng(7)
    out = {"bench": "dense_10M_blockscan", "k": K,
           "device": str(jax.devices()[0]),
           "hbm_corpus_gb": round(N * D / 2**30, 1)}

    for q_n in BATCHES:
        rows = rng.integers(0, N, q_n)

        @jax.jit
        def make_queries(ei8, esc, rws, key):
            base = ei8[rws].astype(jnp.float32) * esc[rws][:, None]
            q = base + 0.02 * jax.random.normal(key, base.shape)
            return q / jnp.linalg.norm(q, axis=1, keepdims=True)

        qf = make_queries(e_i8, e_scale, jnp.asarray(rows),
                          jax.random.key(99))

        s, i = approx_topk_int8_blockscan(qf, e_i8, e_scale, K,
                                          oversample=4, block_rows=SLAB)
        self_match = float(np.mean(np.asarray(i)[:, 0] == rows))
        print(f"batch {q_n}: self-match@1 = {self_match}", flush=True)

        @jax.jit
        def chain(q, ei8, esc):
            def step(carry, _):
                o = approx_topk_int8_blockscan(carry, ei8, esc, K,
                                               oversample=4,
                                               block_rows=SLAB)
                return carry + (jnp.sum(o[0]) * 0.0).astype(carry.dtype), \
                    o[0][0, 0]
            return jax.lax.scan(step, q, None, length=ITERS)[1]

        np.asarray(chain(qf, e_i8, e_scale))
        t0 = time.time()
        np.asarray(chain(qf, e_i8, e_scale))
        dt = (time.time() - t0) / ITERS
        out[f"batch{q_n}"] = {"ms": round(dt * 1e3, 3),
                              "qps": round(q_n / dt, 1),
                              "self_match_at_1": self_match}
        print(f"batch {q_n}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps",
              flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
