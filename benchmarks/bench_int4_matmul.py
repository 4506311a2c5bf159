"""Does int4 weight streaming beat int8 on this chip? (microbench)

Decode on the 12B is weight-read-bound: the int8 QuantDense path
measures ~630 GB/s effective on the weight bytes (19.4 ms/step for
~12 GB — BENCHMARKS.md decode matrix), i.e. ~77% of v5e's ~819 GB/s
HBM roofline. int4 halves the bytes; IF XLA lowers the int4→bf16
convert fused into the dot's weight read (no materialized unpack),
decode throughput at low batch approaches 2×.

Arms, all on a decode-shaped GEMM (x [B, IN] @ W [IN, OUT], B small so
the weight read dominates):

  bf16       — plain bf16 dot (2 bytes/weight), the fusion ceiling
  int8       — QuantDense recipe: int8 kernel, astype(bf16) in the dot,
               per-column scale after (1 byte/weight)
  int4       — same but jnp.int4 kernel (0.5 bytes/weight)
  int4_group — group-wise scales (group=128 along IN): einsum
               'bgi,gio->bgo' partial dots, scale [G, OUT], sum over G
               — the quantization quality a real int4 deployment needs

Timing uses a dependent on-device scan chain (each iteration's input
derived from the previous output) because host↔device round trips
through the axon tunnel are ~28 ms and block_until_ready is unreliable
there (same method as bench.py).

Run on the real chip:  python benchmarks/bench_int4_matmul.py
Tiny CPU smoke:        BENCH_TINY=1 python benchmarks/bench_int4_matmul.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_TINY"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

TINY = bool(os.environ.get("BENCH_TINY"))
B = 16
IN = 512 if TINY else 5120
OUT = 1024 if TINY else 14336
GROUP = 128
ITERS = 4 if TINY else 200


def chain(step, x0):
    """Dependent on-device timing chain: scan ITERS steps, each feeding
    the next, so one dispatch covers ITERS GEMMs."""

    def body(x, _):
        y = step(x)
        # fold the output back into a [B, IN] input (data dependence)
        nxt = jnp.tanh(y[:, :IN]) if y.shape[1] >= IN else jnp.tanh(
            jnp.pad(y, ((0, 0), (0, IN - y.shape[1]))))
        return nxt.astype(jnp.bfloat16), ()

    def run(x):
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    return jax.jit(run)


def timed(fn, x0, label, weight_bytes):
    y = fn(x0)
    y.block_until_ready()  # compile
    t0 = time.time()
    y = fn(x0)
    y.block_until_ready()
    dt = time.time() - t0
    ms = 1e3 * dt / ITERS
    gbps = weight_bytes / (dt / ITERS) / 1e9
    print(f"{label:12s} {ms:8.3f} ms/GEMM  {gbps:8.1f} GB/s effective",
          flush=True)
    return {"ms": round(ms, 3), "gbps": round(gbps, 1)}


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, IN)), jnp.bfloat16)

    w_bf16 = jnp.asarray(rng.standard_normal((IN, OUT)), jnp.bfloat16)
    w_i8 = jnp.asarray(
        rng.integers(-127, 128, (IN, OUT)), jnp.int8)
    scale = jnp.full((OUT,), 0.01, jnp.float32)
    w_i4 = jnp.asarray(
        rng.integers(-8, 8, (IN, OUT)), jnp.int4)
    G = IN // GROUP
    w_i4g = jnp.asarray(
        rng.integers(-8, 8, (G, GROUP, OUT)), jnp.int4)
    gscale = jnp.full((G, OUT), 0.01, jnp.bfloat16)

    def dot(x, w):
        return jax.lax.dot_general(
            x, w.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)

    arms = {}
    arms["bf16"] = timed(
        chain(lambda x: dot(x, w_bf16), x0), x0, "bf16", 2 * IN * OUT)
    arms["int8"] = timed(
        chain(lambda x: dot(x, w_i8) * scale.astype(jnp.bfloat16), x0),
        x0, "int8", IN * OUT)
    arms["int4"] = timed(
        chain(lambda x: dot(x, w_i4) * scale.astype(jnp.bfloat16), x0),
        x0, "int4", IN * OUT // 2)

    def group_step(x):
        xg = x.reshape(B, G, GROUP)
        part = jnp.einsum(
            "bgi,gio->bgo", xg, w_i4g.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16)
        return jnp.sum(part * gscale[None], axis=1,
                       dtype=jnp.float32).astype(jnp.bfloat16)

    arms["int4_group"] = timed(
        chain(group_step, x0), x0, "int4_group", IN * OUT // 2)

    out = {"bench": "int4_vs_int8_weight_streaming",
           "device": str(jax.devices()[0]),
           "B": B, "IN": IN, "OUT": OUT, "group": GROUP,
           "iters": ITERS, "arms": arms,
           "int4_vs_int8_speedup": round(
               arms["int8"]["ms"] / arms["int4"]["ms"], 2),
           "int4_group_vs_int8_speedup": round(
               arms["int8"]["ms"] / arms["int4_group"]["ms"], 2),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    if not TINY:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
