"""Masked search above the postings threshold (the scale-safe paths)."""

import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def big_index():
    rng = np.random.default_rng(0)
    n, d, l = 120_000, 32, 8
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=l, row_block=1024,
                                  postings_threshold=100_000))
    dense = rng.standard_normal((n, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    terms = rng.integers(0, 5000, (n, l)).astype(np.int32)
    imps = np.abs(rng.standard_normal((n, l))).astype(np.float32)
    # planted lexical winners (random impacts make top-k statistical)
    imps[70_001] = 5.0
    imps[42] = 5.0
    metas = [{"nature": "GUIDE" if i % 3 else "DOCTRINE"}
             for i in range(n)]
    idx.add([f"c{i}" for i in range(n)], dense, metas, terms, imps)
    return idx, dense, terms


def test_masked_dense_at_scale(big_index):
    idx, dense, _ = big_index
    s, rows = idx.search_dense(dense[[70_001]], 5,
                               where={"nature": "GUIDE"})
    natures = {idx.meta.row(r)["nature"] for r in rows[0] if r >= 0}
    assert natures == {"GUIDE"}
    assert rows[0, 0] == 70_001  # 70001 % 3 != 0 → GUIDE; nearest = self


def test_masked_sparse_at_scale(big_index):
    idx, _, terms = big_index
    qt = np.concatenate([terms[70_001, :4], [-2, -2]]).reshape(1, -1)
    qt = qt.astype(np.int32)
    qw = np.where(qt >= 0, 1.0, 0.0).astype(np.float32)
    s, rows = idx.search_sparse(qt, qw, 10, where={"nature": "GUIDE"})
    natures = {idx.meta.row(r)["nature"] for r in rows[0] if r >= 0}
    assert natures <= {"GUIDE"}
    assert 70_001 in rows[0]


def test_unmasked_sparse_at_scale_uses_postings(big_index):
    idx, _, terms = big_index
    qt = np.concatenate([terms[42, :4], [-2, -2]]).reshape(1, -1)
    qt = qt.astype(np.int32)
    qw = np.where(qt >= 0, 1.0, 0.0).astype(np.float32)
    s, rows = idx.search_sparse(qt, qw, 10)
    assert 42 in rows[0]
