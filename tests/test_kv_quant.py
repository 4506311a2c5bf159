"""int8 KV cache (`DecoderConfig.quantize_kv`): K/V rows stored int8 +
per-(position, kv-head) f32 scale, quantize-on-write / dequantize-on-
read inside the attention program (models/decoder.py GQAttention).

Why it exists: the continuous slot pool's per-request HBM is the KV row
(~246 MB at 12B/1536 tokens next to 12.4 GB of weights); int8 halves it
so ~2× the requests fit — and decode throughput is weight-sweep-bound,
so aggregate tok/s scales with resident slots.

The correctness contract tested here:
* structure — int8 values + f32 scales, dequant ≈ the bf16 cache;
* idempotence — the functional whole-cache rewrite each decode step
  recovers untouched positions BIT-EXACTLY (scale = rowmax/127 puts the
  max element at ±127, so requantization reproduces every q);
* serving parity — the continuous engine (speculation + prefix cache +
  chunked prefill + host-resident entries) emits EXACTLY its solo
  quantized run, token for token: quantization changes the numerics,
  never the scheduling semantics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving import ContinuousEngine

CFG = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                         dtype=jnp.float32, quantize_kv=True)
SAMPLING = SamplingConfig(temperature=0.0, eos_id=2, pad_id=1)
BLK = 8


@pytest.fixture(scope="module")
def gen():
    return TextGenerator(CFG)


@pytest.fixture(scope="module")
def gen_f32(gen):
    g = TextGenerator(dataclasses.replace(CFG, quantize_kv=False))
    g._params = gen.load()     # same weights, full-precision cache
    return g


def _prompt(rng, n):
    return rng.integers(4, CFG.vocab_size, (n,)).astype(np.int32)


def _solo(gen, ids, max_new):
    out = gen.generate_ids(
        ids[None], np.asarray([len(ids)], np.int32),
        SamplingConfig(temperature=0.0, eos_id=2, pad_id=1,
                       max_new_tokens=max_new))[0]
    toks = []
    for t in out:
        t = int(t)
        if t in (1, 2):
            break
        toks.append(t)
    return toks


def _engine(gen, **kw):
    kw.setdefault("slots", 2)
    kw.setdefault("sampling", SAMPLING)
    kw.setdefault("chunk", 2)
    return ContinuousEngine(gen, **kw)


def test_cache_structure_and_dequant_accuracy(gen, gen_f32):
    """Quantized cache leaves are int8 + f32 scales; dequantized K/V
    match the full-precision cache within int8 row-quantization error."""
    rng = np.random.default_rng(0)
    ids = np.stack([_prompt(rng, 24), _prompt(rng, 24)])
    lens = np.asarray([24, 19], np.int32)
    _, cq = gen._prefill(2, 24)(gen.load(), jnp.asarray(ids),
                                jnp.asarray(lens))
    _, cf = gen_f32._prefill(2, 24)(gen_f32.load(), jnp.asarray(ids),
                                    jnp.asarray(lens))
    for lq in cq:
        assert lq["k"].dtype == jnp.int8 and lq["v"].dtype == jnp.int8
        assert lq["k_scale"].dtype == jnp.float32
        assert lq["k_scale"].shape == lq["k"].shape[:-1]
    # layer 0's inputs are identical (embeddings), so its dequantized
    # K/V must sit within the per-row rounding bound of the f32 cache;
    # deeper layers legitimately drift (their hidden states attend the
    # quantized values — that's the design) and are covered by the
    # greedy end-to-end match below
    for name in ("k", "v"):
        deq = np.asarray(cq[0][name], np.float32) \
            * np.asarray(cq[0][name + "_scale"])[..., None]
        ref = np.asarray(cf[0][name], np.float32)
        bound = np.asarray(cq[0][name + "_scale"])[..., None] / 2 + 1e-7
        assert np.all(np.abs(deq - ref) <= bound)


def test_requantization_is_stable_for_untouched_positions(gen):
    """Decode steps functionally rewrite the whole cache; positions not
    being written must NOT random-walk over a long generation. The int8
    values are bit-stable (dequant/requant perturbs each q by <2^-22
    relative — far under the 0.5 rounding margin); the f32 scale may
    wobble by an ulp through the 127·s round-trip but stays pinned to
    its original value even after 40 rewrites."""
    rng = np.random.default_rng(1)
    ids = _prompt(rng, 16)[None]
    lens = np.asarray([16], np.int32)
    params = gen.load()
    logits, caches = gen._prefill(1, 16)(params, jnp.asarray(ids),
                                         jnp.asarray(lens))
    snap = jax.tree.map(np.asarray, caches)
    carry = (logits, caches, jnp.asarray(lens),
             jnp.zeros((1,), bool), jnp.zeros((1,), jnp.uint32))
    carry, _ = gen._decode_chunk(1, 40, SAMPLING)(params, carry)
    after = jax.tree.map(np.asarray, carry[1])
    for s_layer, a_layer in zip(snap, after):
        for leaf in ("k", "v"):
            np.testing.assert_array_equal(s_layer[leaf][:, :16],
                                          a_layer[leaf][:, :16])
        for leaf in ("k_scale", "v_scale"):
            np.testing.assert_allclose(s_layer[leaf][:, :16],
                                       a_layer[leaf][:, :16],
                                       rtol=1e-5)


def test_greedy_generation_matches_full_precision_on_tiny(gen, gen_f32):
    """On the tiny model the int8-KV greedy path reproduces the
    full-precision tokens (seeded; guards against gross numeric bugs —
    scale misbroadcast, transposed heads — not a general guarantee)."""
    rng = np.random.default_rng(2)
    ids = np.stack([_prompt(rng, 24), _prompt(rng, 24)])
    lens = np.asarray([24, 17], np.int32)
    s = SamplingConfig(temperature=0.0, max_new_tokens=12,
                       eos_id=-1, pad_id=1)
    tq = gen.generate_ids(ids, lens, s)
    tf = gen_f32.generate_ids(ids, lens, s)
    assert (tq == tf).mean() >= 0.9


def test_pool_parity_with_speculation_prefix_cache_and_chunking(gen):
    """The full serving stack over an int8 cache — slot pool +
    prompt-lookup speculation + host-resident prefix cache + segmented
    prefill — equals each request's solo quantized run exactly."""
    rng = np.random.default_rng(3)
    shared = _prompt(rng, 2 * BLK)
    reqs = [(np.concatenate([shared, _prompt(rng, n)]), m)
            for n, m in ((5, 8), (11, 6), (3, 10), (7, 7))]
    eng = _engine(gen, speculative=True, draft_len=3, ngram=2,
                  prefix_cache=4, prefix_block=BLK,
                  prefix_cache_host=True, prefill_chunk=BLK)
    rids = [eng.submit(ids, len(ids), m) for ids, m in reqs]
    results = eng.run()
    for rid, (ids, m) in zip(rids, reqs):
        assert results[rid] == _solo(gen, ids, m), rid
    assert eng.stats["prefix_hits"] >= 2
    # host entries carry the scale leaves too
    for entry in eng._pentries.values():
        leaves = entry["kv_host"][0]
        assert set(leaves) == {"k", "k_scale", "v", "v_scale"}
        assert leaves["k"].dtype == np.int8


def test_factory_quantize_kv_flag():
    from rag_dpo_tpu.providers.factory import create_tpu_llm

    llm = create_tpu_llm(arch="tiny", quantize_int8=False,
                         quantize_kv=True, scheduler="continuous",
                         max_batch=2)
    try:
        assert llm.generator.config.quantize_kv
        r = llm.generate("Quelles sanctions la CNIL peut-elle prononcer ?",
                         temperature=0.0, max_tokens=6)
        assert r.error is None and isinstance(r.text, str)
    finally:
        llm._driver.close()
