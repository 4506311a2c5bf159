import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig, MetadataStore, compile_filter
from rag_dpo_tpu.parallel import MeshSpec, create_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _build(n=200, d=64, seed=0, mesh=None, ell=8):
    rng = np.random.default_rng(seed)
    dense = _normed(rng, n, d)
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=ell, row_block=64),
                      mesh=mesh)
    metas = [
        {
            "nature": ["DOCTRINE", "GUIDE", "SANCTION"][i % 3],
            "source": "CNIL" if i % 4 else "ENTERPRISE",
            "importance": float(i % 10),
            "tags": [f"tag{i % 5}"],
            "is_priority": i % 7 == 0,
        }
        for i in range(n)
    ]
    terms = rng.integers(0, 50, size=(n, ell)).astype(np.int32)
    impacts = np.abs(rng.standard_normal((n, ell))).astype(np.float32)
    idx.add([f"chunk_{i}" for i in range(n)], dense, metas, terms, impacts)
    return idx, dense, terms, impacts


def test_metadata_filters():
    store = MetadataStore()
    store.append([
        {"nature": "GUIDE", "imp": 3, "tags": ["a", "b"], "flag": True},
        {"nature": "SANCTION", "imp": 7, "tags": ["b"], "flag": False},
        {"nature": "GUIDE", "imp": 9, "tags": [], "flag": False},
    ])
    m = compile_filter(store, {"nature": "GUIDE"})
    np.testing.assert_array_equal(m, [True, False, True])
    m = compile_filter(store, {"$and": [{"nature": "GUIDE"},
                                        {"imp": {"$gt": 5}}]})
    np.testing.assert_array_equal(m, [False, False, True])
    m = compile_filter(store, {"$or": [{"flag": True},
                                       {"nature": {"$in": ["SANCTION"]}}]})
    np.testing.assert_array_equal(m, [True, True, False])
    m = compile_filter(store, {"tags": {"$contains": "b"}})
    np.testing.assert_array_equal(m, [True, True, False])
    m = compile_filter(store, {"nature": {"$ne": "GUIDE"}})
    np.testing.assert_array_equal(m, [False, True, False])
    assert compile_filter(store, None) is None


def test_dense_search_exact():
    idx, dense, _, _ = _build()
    q = dense[[5, 50, 150]]
    s, rows = idx.search_dense(q, 5)
    assert rows[:, 0].tolist() == [5, 50, 150]
    assert idx.chunk_ids(rows[0])[0] == "chunk_5"
    # bf16 device scores vs f32 oracle
    oracle = (q @ dense.T).max(axis=1)
    np.testing.assert_allclose(s[:, 0], oracle, atol=2e-2)


def test_dense_search_filtered():
    idx, dense, _, _ = _build()
    q = dense[[5]]  # chunk_5 is nature GUIDE ('i%3==2'? 5%3=2→SANCTION)
    s, rows = idx.search_dense(q, 5, where={"nature": "DOCTRINE"})
    natures = {idx.meta.row(r)["nature"] for r in rows[0] if r >= 0}
    assert natures == {"DOCTRINE"}
    assert 5 not in rows[0]  # filtered out even though it's the nearest


def test_sparse_search_and_filter():
    idx, dense, terms, impacts = _build()
    qt = np.concatenate([terms[7, :4], [-2, -2]]).reshape(1, -1).astype(np.int32)
    qw = np.where(qt >= 0, 1.0, 0.0).astype(np.float32)
    s, rows = idx.search_sparse(qt, qw, 10)
    assert 7 in rows[0]
    s2, rows2 = idx.search_sparse(qt, qw, 10, where={"source": "ENTERPRISE"})
    srcs = {idx.meta.row(r)["source"] for r in rows2[0] if r >= 0}
    assert srcs == {"ENTERPRISE"}


def test_upsert_delete_compact():
    idx, dense, _, _ = _build(n=50)
    assert len(idx) == 50
    # upsert: move chunk_3 onto chunk_10's vector
    idx.add(["chunk_3"], dense[[10]], [{"nature": "GUIDE"}])
    s, rows = idx.search_dense(dense[[10]], 2)
    assert set(rows[0]) == {3, 10}
    idx.delete(["chunk_10"])
    assert len(idx) == 49
    s, rows = idx.search_dense(dense[[10]], 2)
    assert 10 not in rows[0]
    assert 3 in rows[0]
    idx.compact()
    assert idx.n_rows == 49
    assert "chunk_10" not in idx
    s, rows = idx.search_dense(dense[[10]], 1)
    assert idx.chunk_ids(rows[0])[0] == "chunk_3"


def test_exact_path_excludes_padding_and_tombstones():
    """exact=True must fold the alive/padding penalty: zero-scoring
    padded device rows would otherwise outrank valid negative-cosine
    hits (round-2 review finding)."""
    d = 16
    rng = np.random.default_rng(1)
    base = _normed(rng, 1, d)[0]
    # 6 live rows, ALL with negative cosine vs the query
    dense = np.stack([-base + 0.05 * _normed(rng, 1, d)[0]
                      for _ in range(6)])
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=4, row_block=64))
    idx.add([f"c{i}" for i in range(6)], dense)
    s, rows = idx.search_dense(base[None], 4, exact=True)
    assert (rows[0] >= 0).all(), rows  # live rows, not padding
    assert (s[0] < 0).all()           # true negative scores returned
    idx.delete(["c0", "c1"])
    s, rows = idx.search_dense(base[None], 6, exact=True)
    live = rows[0][rows[0] >= 0]
    assert len(live) == 4 and 0 not in live and 1 not in live


def test_save_load_roundtrip(tmp_path):
    idx, dense, _, _ = _build(n=80)
    idx.delete(["chunk_9"])
    idx.save(tmp_path / "ckpt")
    idx2 = DeviceIndex.load(tmp_path / "ckpt")
    assert idx2.n_rows == 80 and len(idx2) == 79
    s1, r1 = idx.search_dense(dense[[20]], 5)
    s2, r2 = idx2.search_dense(dense[[20]], 5)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    assert idx2.meta.row(5)["nature"] == idx.meta.row(5)["nature"]


def test_sharded_index_search(eight_devices):
    mesh = create_mesh(MeshSpec(shard=8))
    idx, dense, _, _ = _build(n=300, mesh=mesh)
    q = dense[[17, 123]]
    s, rows = idx.search_dense(q, 5)
    assert rows[:, 0].tolist() == [17, 123]
    single, _, _, _ = _build(n=300)
    s1, r1 = single.search_dense(q, 5)
    np.testing.assert_allclose(np.sort(s), np.sort(s1), atol=1e-2)
