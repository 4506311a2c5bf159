"""Int8 dense-arm variant sweep: where do the ~2ms of non-HBM time go?"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import functools

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.ops.quantize import quantize_rows

N, D, Q, K = 1_000_000, 1024, 64, 40
ITERS = 20


def chain(fn, *ops):
    @jax.jit
    def run(q, *ops):
        def step(carry, _):
            qq = carry
            out = fn(qq, *ops)
            mix = (jnp.sum(out[0]) * 0.0).astype(qq.dtype)
            return qq + mix, out[0][0, 0]
        _, ss = jax.lax.scan(step, q, None, length=ITERS)
        return ss
    return lambda q: run(q, *ops)


def timeit(run, q):
    np.asarray(run(q))
    t0 = time.time()
    np.asarray(run(q))
    return (time.time() - t0) / ITERS


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def v_base(qf, e_i8, e_scale, e_ref, k=K, oversample=4):
    q_i8, q_scale = quantize_rows(qf)
    raw = jax.lax.dot_general(q_i8, e_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = (raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]) \
        .astype(jnp.bfloat16)
    vals, ids = jax.lax.approx_max_k(s, k * oversample)
    rows = e_ref[ids]
    exact = jnp.einsum("qd,qcd->qc", qf, rows.astype(jnp.float32))
    top, pos = jax.lax.top_k(exact, k)
    return top, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def v_matmul_only(qf, e_i8, e_scale, e_ref, k=K, oversample=4):
    q_i8, q_scale = quantize_rows(qf)
    raw = jax.lax.dot_general(q_i8, e_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (jnp.sum(raw, axis=1, keepdims=True).astype(jnp.float32),)


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def v_no_refine(qf, e_i8, e_scale, e_ref, k=K, oversample=1):
    q_i8, q_scale = quantize_rows(qf)
    raw = jax.lax.dot_general(q_i8, e_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = (raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]) \
        .astype(jnp.bfloat16)
    vals, ids = jax.lax.approx_max_k(s, k)
    return vals.astype(jnp.float32), ids


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def v_os2(qf, e_i8, e_scale, e_ref, k=K, oversample=2):
    return v_base(qf, e_i8, e_scale, e_ref, k=k, oversample=2)


@functools.partial(jax.jit, static_argnames=("k",))
def v_f32_scores(qf, e_i8, e_scale, e_ref, k=K):
    q_i8, q_scale = quantize_rows(qf)
    raw = jax.lax.dot_general(q_i8, e_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s = raw.astype(jnp.float32) * q_scale[:, None] * e_scale[None, :]
    vals, ids = jax.lax.approx_max_k(s, 4 * k)
    rows = e_ref[ids]
    exact = jnp.einsum("qd,qcd->qc", qf, rows.astype(jnp.float32))
    top, pos = jax.lax.top_k(exact, k)
    return top, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def v_scan_blocks(qf, e_i8, e_scale, e_ref, k=K, block=250_000):
    """Block-scan: approx per block then merge — smaller intermediates."""
    q_i8, q_scale = quantize_rows(qf)
    nb = N // block
    e_b = e_i8.reshape(nb, block, D)
    s_b = e_scale.reshape(nb, block)

    def step(carry, xs):
        eb, sb, j = xs
        raw = jax.lax.dot_general(q_i8, eb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = (raw.astype(jnp.float32) * q_scale[:, None] * sb[None, :]) \
            .astype(jnp.bfloat16)
        vals, ids = jax.lax.approx_max_k(s, k)
        return carry, (vals, ids + j * block)

    _, (vals, ids) = jax.lax.scan(
        step, None, (e_b, s_b, jnp.arange(nb)))
    vals = jnp.moveaxis(vals, 0, 1).reshape(Q, -1)
    ids = jnp.moveaxis(ids, 0, 1).reshape(Q, -1)
    rows = e_ref[ids]
    exact = jnp.einsum("qd,qcd->qc", qf, rows.astype(jnp.float32))
    top, pos = jax.lax.top_k(exact, k)
    return top, jnp.take_along_axis(ids, pos, axis=1)


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
    qf = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)

    res = {}
    for name, fn in [("base_os4", v_base), ("matmul_only", v_matmul_only),
                     ("no_refine_os1", v_no_refine), ("os2", v_os2),
                     ("f32_scores", v_f32_scores),
                     ("scan_250k", v_scan_blocks)]:
        try:
            dt = timeit(chain(fn, e_i8, e_scale, embs), qf)
            res[name] = {"ms": round(dt * 1e3, 3), "qps": round(Q / dt, 1)}
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": str(e)[:200]}
        print(name, res[name], flush=True)
    print(json.dumps({"bench": "int8_variants_1M", **res}))


if __name__ == "__main__":
    main()
