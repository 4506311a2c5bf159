"""Batch-128 int8 dense arm.

NOTE: the corpus arrays MUST be threaded as jit ARGUMENTS — a jitted
chain that closes over them captures 3 GB of constants into the HLO,
which the axon remote-compile tunnel ships per compile (the multi-minute
'large-batch compile stall' of round 2 was exactly this)."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.ops.quantize import approx_topk_int8_refined, quantize_rows

N, D, Q, K = 1_000_000, 1024, 128, 40
ITERS = 10


@jax.jit
def make_corpus(key):
    e = jax.random.normal(key, (N, D), jnp.bfloat16)
    nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1,
                           keepdims=True))
    return (e.astype(jnp.float32) / nrm).astype(jnp.bfloat16)


embs = make_corpus(jax.random.key(0))
embs.block_until_ready()
print("corpus ready", flush=True)
e_i8, e_scale = jax.jit(quantize_rows)(embs)
e_i8.block_until_ready()
print("quantized", flush=True)
qf = jnp.asarray(np.random.default_rng(2).standard_normal((Q, D)),
                 jnp.float32)

t0 = time.time()
s, i = approx_topk_int8_refined(qf, e_i8, e_scale, embs, K, oversample=2)
s.block_until_ready()
print("single dispatch compiled+ran in", round(time.time() - t0, 1), "s",
      flush=True)


@jax.jit
def run(q, ei8, esc, eref):
    def step(carry, _):
        out = approx_topk_int8_refined(carry, ei8, esc, eref, K,
                                       oversample=2)
        return carry + (jnp.sum(out[0]) * 0.0).astype(carry.dtype), \
            out[0][0, 0]
    return jax.lax.scan(step, q, None, length=ITERS)[1]


t0 = time.time()
np.asarray(run(qf, e_i8, e_scale, embs))
print("chain compiled in", round(time.time() - t0, 1), flush=True)
t0 = time.time()
np.asarray(run(qf, e_i8, e_scale, embs))
dt = (time.time() - t0) / ITERS
print({"batch": Q, "ms": round(dt * 1e3, 3), "qps": round(Q / dt, 1)},
      flush=True)
