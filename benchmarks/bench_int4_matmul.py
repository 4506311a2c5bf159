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
    # the axon backend can't device_put host int4 buffers (transfer
    # path recurses); upload int8 and narrow ON device
    to_i4 = jax.jit(lambda v: v.astype(jnp.int4))
    w_i4 = to_i4(jnp.asarray(
        rng.integers(-8, 8, (IN, OUT)), jnp.int8))
    w_i4.block_until_ready()
    G = IN // GROUP
    w_i4g = to_i4(jnp.asarray(
        rng.integers(-8, 8, (G, GROUP, OUT)), jnp.int8))
    w_i4g.block_until_ready()
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

    # is the int8 arm conversion-bound? measure the bare astype rate
    def convert_step(x):
        wb = w_i8.astype(jnp.bfloat16)
        # full reduction so XLA can't DCE any part of the conversion
        return x + jnp.sum(wb, dtype=jnp.float32)[None, None].astype(
            jnp.bfloat16)

    arms["convert_only"] = timed(
        chain(convert_step, x0), x0, "convert_only", IN * OUT)

    # W8A8: per-token dynamic activation quant + NATIVE int8 MXU dot
    # (no weight conversion at all) → output int32, dequant by
    # x_scale[b] * w_scale[out]
    def w8a8_step(x):
        xf = x.astype(jnp.float32)
        xs = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w_i8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs
                * scale[None]).astype(jnp.bfloat16)

    arms["w8a8"] = timed(
        chain(w8a8_step, x0), x0, "w8a8", IN * OUT)

    def try_arm(label, fn, nbytes):
        try:
            arms[label] = timed(chain(fn, x0), x0, label, nbytes)
        except Exception as exc:  # noqa: BLE001
            print(f"{label:12s} FAILED: {repr(exc)[:120]}", flush=True)
            arms[label] = {"error": repr(exc)[:200]}

    # layout probes: does the convert rate depend on which axis is
    # minor / contracted? (the full 12B decode measures ~600 GB/s
    # effective on its int8 bytes, yet this isolated [IN, OUT] GEMM
    # converts at only ~346 — find the layout that explains the gap)
    w_i8_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(rng.integers(-127, 128, (OUT, IN)), np.int8)))

    def dot_t(x):
        y = jax.lax.dot_general(
            x, w_i8_t.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return y * scale.astype(jnp.bfloat16)

    try_arm("int8_T", dot_t, IN * OUT)

    w_down = jnp.asarray(
        rng.integers(-127, 128, (OUT, IN)), jnp.int8)  # [14336, 5120]
    scale_in = jnp.full((IN,), 0.01, jnp.float32)

    def down_step(x):
        # x [B, IN] -> widen to [B, OUT] via replication-free pad, then
        # contract the wide dim like the decoder's down-proj
        xw = jnp.concatenate([x] * (-(-OUT // IN)), axis=1)[:, :OUT]
        y = jax.lax.dot_general(
            xw, w_down,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)
        return y * scale_in.astype(jnp.bfloat16)

    try_arm("int8_down", down_step, IN * OUT)

    try_arm("int4",
            lambda x: dot(x, w_i4) * scale.astype(jnp.bfloat16),
            IN * OUT // 2)

    def group_step(x):
        xg = x.reshape(B, G, GROUP)
        part = jnp.einsum(
            "bgi,gio->bgo", xg, w_i4g.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16)
        return jnp.sum(part * gscale[None], axis=1,
                       dtype=jnp.float32).astype(jnp.bfloat16)

    try_arm("int4_group", group_step, IN * OUT // 2)

    out = {"bench": "int4_vs_int8_weight_streaming",
           "device": str(jax.devices()[0]),
           "B": B, "IN": IN, "OUT": OUT, "group": GROUP,
           "iters": ITERS, "arms": arms,
           "w8a8_vs_int8_speedup": round(
               arms["int8"]["ms"] / arms["w8a8"]["ms"], 2)
           if "ms" in arms.get("w8a8", {}) else None,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    if not TINY:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
