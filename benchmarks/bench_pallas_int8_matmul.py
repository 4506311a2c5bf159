"""Mosaic-vs-XLA int8 matmul floor — closes the custom-kernel question.

Three prior Pallas kernels (fused_topk, fused_candidates, pooled) all
streamed the corpus at ~140-175 GB/s effective while XLA's dot chain
reaches ~580 GB/s on the same pattern. This microbench strips the
question to its floor: a kernel whose ONLY work is read an int8 row
block → matmul against VMEM-resident queries → write a tiny per-block
reduction. If even this caps near ~175 GB/s, the limitation is Mosaic's
DMA pipelining on this chip/toolchain and custom sweep kernels cannot
beat XLA here — the production approx/blockscan paths stay XLA. Two
variants probe the MXU input path: (a) upcast int8→bf16 in VMEM before
the dot, (b) int8 dot with preferred_element_type=int32.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, Q = 1_000_000, 1024, 64
BLOCK = 2048
ITERS = 10


def kernel_bf16(q_ref, e_ref, o_ref):
    # output block last dim must be 128-divisible (Mosaic lane
    # constraint) → emit a 128-wide pooled strip per corpus block
    e = e_ref[...].astype(jnp.bfloat16)
    q = q_ref[...].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, e, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out = s[:, :128]          # Mosaic: 2-D intermediates only —
    for i in range(1, s.shape[1] // 128):   # unrolled strided max
        out = jnp.maximum(out, s[:, i * 128:(i + 1) * 128])
    o_ref[...] = out


def kernel_int8(q_ref, e_ref, o_ref):
    s = jax.lax.dot_general(q_ref[...], e_ref[...],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    out = s[:, :128]          # Mosaic: 2-D intermediates only —
    for i in range(1, s.shape[1] // 128):   # unrolled strided max
        out = jnp.maximum(out, s[:, i * 128:(i + 1) * 128])
    o_ref[...] = out.astype(
        jnp.float32)


def make(kernel, name):
    @jax.jit
    def run(q_i8, e_i8):
        grid = (N // BLOCK,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Q, D), lambda j: (0, 0)),
                pl.BlockSpec((BLOCK, D), lambda j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((Q, 128), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((Q, (N // BLOCK) * 128),
                                           jnp.float32),
        )(q_i8, e_i8)

    return run


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def mk(key):
        x = jax.random.randint(key, (N, D), -127, 128, jnp.int8)
        return x

    e_i8 = mk(jax.random.key(0))
    e_i8.block_until_ready()
    q_i8 = jnp.asarray(rng.integers(-127, 128, (Q, D)), jnp.int8)

    out = {"bench": "pallas_int8_matmul_floor", "n": N, "d": D,
           "q": Q, "block": BLOCK,
           "device": str(jax.devices()[0])}

    # XLA reference chain
    @jax.jit
    def xla_chain(q, e):
        def step(c, _):
            s = jax.lax.dot_general(c, e, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            m = jnp.max(s, axis=1, keepdims=True)  # [Q, 1]
            return c + (m[:, :1] * 0).astype(c.dtype), m[0, 0]
        return jax.lax.scan(step, q, None, length=ITERS)[1]

    np.asarray(xla_chain(q_i8, e_i8))
    t0 = time.time(); np.asarray(xla_chain(q_i8, e_i8))
    dt = (time.time() - t0) / ITERS
    out["xla_int8_dot_ms"] = round(dt * 1e3, 2)
    out["xla_gbps"] = round(N * D / dt / 1e9, 0)
    print(f"XLA int8 dot: {dt*1e3:.2f} ms ({out['xla_gbps']:.0f} GB/s)",
          flush=True)

    for kern, name in ((kernel_bf16, "pallas_bf16_upcast"),
                       (kernel_int8, "pallas_int8_native")):
        try:
            run = make(kern, name)

            @jax.jit
            def chain(q, e):
                def step(c, _):
                    o = run(c, e)
                    return c + (o[:, :1] * 0).astype(c.dtype), o[0, 0]
                return jax.lax.scan(step, q, None, length=ITERS)[1]

            np.asarray(chain(q_i8, e_i8))
            t0 = time.time(); np.asarray(chain(q_i8, e_i8))
            dt = (time.time() - t0) / ITERS
            out[f"{name}_ms"] = round(dt * 1e3, 2)
            out[f"{name}_gbps"] = round(N * D / dt / 1e9, 0)
            print(f"{name}: {dt*1e3:.2f} ms "
                  f"({out[f'{name}_gbps']:.0f} GB/s)", flush=True)
        except Exception as e:
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"{name}: FAILED {e}", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
