"""Regression tests for the round-2 ops/index/models review findings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig, MetadataStore, \
    compile_filter


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_duplicate_ids_in_one_add_batch():
    """Same new id twice in one batch must produce ONE live row (later
    occurrence wins), not an undeletable orphan."""
    rng = np.random.default_rng(0)
    d = 16
    dense = _normed(rng, 3, d)
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=4, row_block=8))
    idx.add(["a", "dup", "dup"], dense,
            [{"v": 1}, {"v": 2}, {"v": 3}])
    assert idx.n_rows == 2
    assert len(idx) == 2
    pos = idx._id_pos["dup"]
    assert idx.meta.row(pos)["v"] == 3          # later occurrence won
    np.testing.assert_allclose(idx._dense[pos], dense[2].astype(np.float16))
    idx.delete(["dup"])
    s, rows = idx.search_dense(dense[[2]], 3)
    assert pos not in rows[0]                    # nothing lingers


def test_metadata_type_drift_stays_in_one_family():
    store = MetadataStore()
    store.append([{"year": "2020"}, {"year": "2020"}])
    store.append([{"year": 2021}])              # int now — same column
    m = compile_filter(store, {"year": "2020"})
    np.testing.assert_array_equal(m, [True, True, False])
    m2 = compile_filter(store, {"year": "2021"})
    np.testing.assert_array_equal(m2, [False, False, True])
    # update with a drifted type rewrites the SAME column
    store.update(0, {"year": 2022})
    m3 = compile_filter(store, {"year": "2020"})
    np.testing.assert_array_equal(m3, [False, True, False])


def test_metadata_numeric_column_string_query():
    store = MetadataStore()
    store.append([{"n": 5}, {"n": 7}])
    np.testing.assert_array_equal(
        compile_filter(store, {"n": "5"}), [True, False])


def test_int8_refined_small_corpus_sorted_by_exact():
    from rag_dpo_tpu.ops.quantize import (
        approx_topk_int8_refined,
        quantize_rows,
    )

    rng = np.random.default_rng(1)
    e = _normed(rng, 12, 32)
    ei, esc = quantize_rows(jnp.asarray(e))
    q = jnp.asarray(e[[4]])
    s, i = approx_topk_int8_refined(q, ei, esc, jnp.asarray(e), 40,
                                    oversample=2)
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    live = s[i >= 0]
    assert (np.diff(live) <= 1e-6).all()        # sorted descending
    assert i[0] == 4 and abs(s[0] - 1.0) < 1e-3  # exact self-score
    assert (i[12:] == -1).all()                  # kk<k padding


def test_flash_attention_zero_length_row_no_nan():
    from rag_dpo_tpu.ops import flash_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 2, 128, 32)), jnp.float32)
    lengths = jnp.asarray([128, 0], jnp.int32)   # row 1 fully padded
    out = np.asarray(flash_attention(q, q, q, lengths))
    assert np.isfinite(out).all()


def test_decode_cache_keyed_on_pad_id():
    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator

    gen = TextGenerator(DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                                           dtype=jnp.float32))
    gen.load()
    ids = np.asarray([[5, 6, 7, 8]], np.int32)
    lengths = np.asarray([4])
    out_a = gen.generate_ids(ids, lengths, SamplingConfig(
        temperature=0.0, max_new_tokens=3, eos_id=5, pad_id=0))
    out_b = gen.generate_ids(ids, lengths, SamplingConfig(
        temperature=0.0, max_new_tokens=3, eos_id=5, pad_id=9))
    # two pad ids → two distinct cached programs (no stale closure)
    keys = [k for k in gen._programs if k[0] == "decode"]
    assert len(keys) == 2


def test_quantized_load_converted_roundtrip():
    """load_converted on a quantize_weights config must produce a
    params tree the QuantDense modules can apply."""
    from rag_dpo_tpu.models.decoder import DecoderConfig, DecoderModel
    from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator

    cfg = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                             dtype=jnp.float32)
    # build a float state dict via the float model's converter inverse:
    # use the torch-shaped keys the converter expects
    import torch

    torch.manual_seed(0)
    from transformers import LlamaConfig, LlamaForCausalLM

    tcfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=128, rms_norm_eps=cfg.rms_norm_eps,
    )
    tm = LlamaForCausalLM(tcfg)
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    qcfg = dataclasses.replace(cfg, quantize_weights=True)
    gen = TextGenerator(qcfg)
    gen.load_converted(state)
    ids = np.asarray([[5, 6, 7]], np.int32)
    out = gen.generate_ids(ids, np.asarray([3]), SamplingConfig(
        temperature=0.0, max_new_tokens=2, eos_id=-1))
    assert out.shape[1] == 2  # applies without ScopeParamNotFound
