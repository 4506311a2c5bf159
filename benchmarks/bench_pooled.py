"""Pooled-max dense sweep vs the approx int8+refine path at 1M×1024."""

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

from rag_dpo_tpu.ops import blocked_topk
from rag_dpo_tpu.ops.pooled import pooled_topk_int8
from rag_dpo_tpu.ops.quantize import approx_topk_int8_refined, quantize_rows

N, D, Q, K = 1_000_000, 1024, 64, 40
ITERS = 20


def chain(fn, q, *ops):
    @jax.jit
    def run(q, *ops):
        def step(carry, _):
            out = fn(carry, *ops)
            mix = (jnp.sum(out[0]) * 0.0).astype(carry.dtype)
            return carry + mix, out[0][0, 0]
        return jax.lax.scan(step, q, None, length=ITERS)[1]
    return lambda: np.asarray(run(q, *ops))


def timeit(run):
    run()
    t0 = time.time()
    run()
    return (time.time() - t0) / ITERS


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
    print("corpus ready", flush=True)
    rng = np.random.default_rng(2)
    qf = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)

    res = {"bench": "pooled_vs_approx_1M", "batch": Q, "k": K,
           "device": str(jax.devices()[0])}

    def f_base(q, ei8, esc, eref):
        return approx_topk_int8_refined(q, ei8, esc, eref, K, oversample=2)

    t = timeit(chain(f_base, qf, e_i8, e_scale, embs))
    res["approx_int8_refined_os2_ms"] = round(t * 1e3, 3)
    print("base", res["approx_int8_refined_os2_ms"], flush=True)

    for block_n, group in [(8192, 64), (16384, 64), (16384, 128),
                           (8192, 32), (4096, 64)]:
        def f_pool(q, ei8, esc, eref, bn=block_n, g=group):
            return pooled_topk_int8(q, ei8, esc, eref, K, oversample=4,
                                    block_n=bn, group=g)
        try:
            t = timeit(chain(f_pool, qf, e_i8, e_scale, embs))
            key = f"pooled_b{block_n}_g{group}_ms"
            res[key] = round(t * 1e3, 3)
            print(key, res[key], flush=True)
        except Exception as e:  # noqa: BLE001
            res[f"pooled_b{block_n}_g{group}_error"] = str(e)[:200]
            print("ERR", block_n, group, str(e)[:200], flush=True)

    # recall of the best pooled config vs the exact oracle
    s_p, i_p = pooled_topk_int8(qf, e_i8, e_scale, embs, 10, oversample=8,
                                block_n=8192, group=64)
    s_e, i_e = blocked_topk(qf.astype(jnp.bfloat16), embs, 10,
                            block_n=65_536)
    i_p, i_e = np.asarray(i_p), np.asarray(i_e)
    res["pooled_recall_at_10_vs_exact"] = round(float(np.mean(
        [len(set(i_p[r]) & set(i_e[r])) / 10 for r in range(Q)])), 4)
    print(json.dumps(res))
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps({**res,
                            "ts": time.strftime("%Y-%m-%dT%H:%M:%S")})
                + "\n")


if __name__ == "__main__":
    main()
