"""Why does the 12B decode stream int8 weights at ~620 GB/s while an
isolated int8 GEMM measures ~346 GB/s? (regime probe)

bench_int4_matmul.py found: bf16 GEMM 765 GB/s (roofline), int8+convert
GEMM 346 GB/s, convert_only 348, W8A8 341, int4 unimplemented — all at
B=16 on one [5120, 14336] weight. But bench_decode_throughput.py
measures the full 12B int8 model at 19.4 ms/token (batch 1) = ~12.2 GB
of weights at ~620 GB/s effective. Both are wall-clock real, so the
isolated-GEMM regime must differ from the model regime. Candidates:

  batch    — decode runs B=1..16; MXU ingest vs HBM balance shifts
  layers   — the model reads 280 DIFFERENT weights back-to-back; a
             scan re-reading ONE weight may defeat HBM prefetch or hit
             a scan-boundary bubble per iteration
  mix      — q/k/v/o GEMMs are 5-21 MB, MLP 73 MB; small GEMMs may
             stream faster

Arms: int8 GEMM at B∈{1, 16, 128}; a 4-weight round-robin chain; and a
realistic mini-layer chain (q, o, gate, up, down shapes) — all int8,
plus bf16 twins for the roofline at each point.

Run on the real chip:  python benchmarks/bench_int8_gemm_regimes.py
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
H = 256 if TINY else 5120
F = 512 if TINY else 14336
QO = 128 if TINY else 4096
ITERS = 4 if TINY else 100


def gemm(x, w):
    return jax.lax.dot_general(
        x, w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16)


def run_chain(step, x0, n_iters, weights=()):
    """`weights` are passed as EXPLICIT jit args (like the model's
    params tree) — closure-captured arrays embed as executable
    constants, which both blows the axon remote-compile size cap on
    multi-weight programs (HTTP 413) and may stream differently."""

    def body(ws, x, _):
        y = step(x, *ws)
        d = x0.shape[1]
        nxt = jnp.tanh(y[:, :d]) if y.shape[1] >= d else jnp.tanh(
            jnp.pad(y, ((0, 0), (0, d - y.shape[1]))))
        return nxt.astype(jnp.bfloat16), ()

    @jax.jit
    def run(x, *ws):
        out, _ = jax.lax.scan(lambda c, s: body(ws, c, s), x, None,
                              length=n_iters)
        return out

    run(x0, *weights).block_until_ready()
    t0 = time.time()
    run(x0, *weights).block_until_ready()
    return (time.time() - t0) / n_iters


def main():
    rng = np.random.default_rng(0)
    res = {}

    def arm(label, step, x0, nbytes, n_iters=ITERS, weights=()):
        dt = run_chain(step, x0, n_iters, weights)
        gbps = nbytes / dt / 1e9
        res[label] = {"ms": round(1e3 * dt, 3), "gbps": round(gbps, 1)}
        print(f"{label:18s} {1e3*dt:8.3f} ms  {gbps:8.1f} GB/s",
              flush=True)

    w8 = jnp.asarray(rng.integers(-127, 128, (H, F)), jnp.int8)
    wb = jnp.asarray(rng.standard_normal((H, F)), jnp.bfloat16)
    sc = jnp.full((F,), 0.01, jnp.bfloat16)

    for B in (1, 16, 128):
        x0 = jnp.asarray(rng.standard_normal((B, H)), jnp.bfloat16)
        arm(f"int8_B{B}", lambda x, w: gemm(x, w) * sc, x0, H * F,
            weights=(w8,))
        arm(f"bf16_B{B}", lambda x, w: gemm(x, w), x0, 2 * H * F,
            weights=(wb,))

    # 4 different weights round-robin inside one scan iteration
    ws = tuple(jnp.asarray(rng.integers(-127, 128, (H, F)), jnp.int8)
               for _ in range(4))
    x0 = jnp.asarray(rng.standard_normal((16, H)), jnp.bfloat16)

    def multi_step(x, *ws_):
        y = None
        for w in ws_:
            z = gemm(x, w) * sc
            y = z if y is None else y + z
            x = jnp.tanh(z[:, :H])
        return y

    arm("int8_4w_B16", multi_step, x0, 4 * H * F, max(ITERS // 4, 2),
        weights=ws)

    # realistic decoder mini-layer: q [H,QO], o [QO,H], gate/up [H,F],
    # down [F,H] — int8, B=1 (single-stream decode regime)
    shapes = [(H, QO), (QO, H), (H, F), (H, F), (F, H)]
    lw = tuple(jnp.asarray(rng.integers(-127, 128, s), jnp.int8)
               for s in shapes)
    layer_bytes = sum(a * b for a, b in shapes)
    x1 = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)

    def layer_step(x, *lw_):
        q = gemm(x, lw_[0])
        o = gemm(jnp.tanh(q), lw_[1])
        h = jnp.tanh(o[:, :H]) + x
        g = gemm(h, lw_[2])
        u = gemm(h, lw_[3])
        d = gemm(jnp.tanh(g) * u, lw_[4])
        return d[:, :H] + h

    arm("int8_layer_B1", layer_step, x1, layer_bytes,
        max(ITERS // 2, 2), weights=lw)
    x16 = jnp.asarray(rng.standard_normal((16, H)), jnp.bfloat16)
    arm("int8_layer_B16", layer_step, x16, layer_bytes,
        max(ITERS // 2, 2), weights=lw)

    out = {"bench": "int8_gemm_regimes", "device": str(jax.devices()[0]),
           "H": H, "F": F, "iters": ITERS, "arms": res,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    if not TINY:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
