"""1M × 1024-d dense int8 sweep at batch 256-2048: full-sweep vs
block-scanned.

At 1M rows the [Q, N] f32 score intermediate reaches 4 GB at batch
1024 — beyond what fits beside the corpus comfortably — and the
full-sweep path stops scaling. The block-scan keeps the live
intermediate at [Q, B]; if the sweep is compute-bound at these batches
(b1024: 2.1 TOP int8 ≈ 5.3 ms at peak), qps keeps rising.
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

from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_blockscan,
    approx_topk_int8_selfrefined,
    quantize_rows,
)

N, D, K = 1_000_000, 1024, 10
ITERS = 10
BLOCK = 250_000


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1,
                               keepdims=True))
        return quantize_rows(e.astype(jnp.float32) / nrm)

    e_i8, e_scale = make_corpus(jax.random.key(0))
    e_i8.block_until_ready()

    rng = np.random.default_rng(7)
    out = {"bench": "dense_1M_blockscan_scaling", "k": K,
           "device": str(jax.devices()[0]), "block_rows": BLOCK}

    for q_n, use_blockscan in ((256, False), (256, True), (512, True),
                               (1024, True), (2048, True)):
        rows = rng.integers(0, N, q_n)

        @jax.jit
        def make_queries(ei8, esc, rws, key):
            base = ei8[rws].astype(jnp.float32) * esc[rws][:, None]
            q = base + 0.02 * jax.random.normal(key, base.shape)
            return q / jnp.linalg.norm(q, axis=1, keepdims=True)

        qf = make_queries(e_i8, e_scale, jnp.asarray(rows),
                          jax.random.key(99))

        if use_blockscan:
            def search(q, ei8, esc):
                return approx_topk_int8_blockscan(
                    q, ei8, esc, K, oversample=4, block_rows=BLOCK)
        else:
            def search(q, ei8, esc):
                return approx_topk_int8_selfrefined(
                    q, ei8, esc, K, oversample=4)

        s, i = jax.jit(search)(qf, e_i8, e_scale)
        self_match = float(np.mean(np.asarray(i)[:, 0] == rows))

        @jax.jit
        def chain(q, ei8, esc):
            def step(carry, _):
                o = search(carry, ei8, esc)
                return carry + (jnp.sum(o[0]) * 0.0).astype(carry.dtype), \
                    o[0][0, 0]
            return jax.lax.scan(step, q, None, length=ITERS)[1]

        np.asarray(chain(qf, e_i8, e_scale))
        t0 = time.time()
        np.asarray(chain(qf, e_i8, e_scale))
        dt = (time.time() - t0) / ITERS
        tag = f"batch{q_n}_{'scan' if use_blockscan else 'full'}"
        out[tag] = {"ms": round(dt * 1e3, 3), "qps": round(q_n / dt, 1),
                    "self_match_at_1": self_match}
        print(f"{tag}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps  "
              f"self-match {self_match}", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
