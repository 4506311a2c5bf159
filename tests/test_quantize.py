import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.ops.quantize import approx_topk_int8, quantize_rows
from rag_dpo_tpu.ops import cosine_topk_reference

import jax.numpy as jnp


def _corpus(n=2000, d=128, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, e


def test_quantize_roundtrip_error():
    _, e = _corpus()
    q_i8, scale = quantize_rows(e)
    back = np.asarray(q_i8, np.float32) * np.asarray(scale)[:, None]
    err = np.abs(back - e).max()
    assert err < 1.2 / 127  # one quantization step


def test_int8_topk_recall():
    q, e = _corpus()
    q_i8, q_s = quantize_rows(q)
    e_i8, e_s = quantize_rows(e)
    s, i = approx_topk_int8(q_i8, q_s, e_i8, e_s, k=10)
    rs, ri = cosine_topk_reference(q, e, 10)
    i, ri = np.asarray(i), np.asarray(ri)
    recall = np.mean([len(set(i[r]) & set(ri[r])) / 10 for r in range(8)])
    assert recall >= 0.9, recall
    # top-1 nearly always survives quantization
    assert np.mean(i[:, 0] == ri[:, 0]) >= 0.8


def test_int8_index_path():
    q, e = _corpus(n=300, d=64, seed=2)
    idx = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=64,
                                  quantize_int8=True))
    metas = [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
             for i in range(300)]
    idx.add([f"c{i}" for i in range(300)], e, metas)
    s, rows = idx.search_dense(e[[7, 123]], 5)
    assert rows[0, 0] == 7 and rows[1, 0] == 123
    # filter folds into the penalty: c7 is GUIDE (7 % 2 == 1), so a
    # DOCTRINE filter must exclude it even though it's the nearest
    s, rows = idx.search_dense(e[[7]], 5, where={"nature": "DOCTRINE"})
    natures = {idx.meta.row(r)["nature"] for r in rows[0] if r >= 0}
    assert natures == {"DOCTRINE"}
    assert 7 not in rows[0]
    # delete → tombstone respected through the int8 path
    idx.delete(["c123"])
    s, rows = idx.search_dense(e[[123]], 3)
    assert 123 not in rows[0]
