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


def test_int8_selfrefined_matches_dequant_oracle():
    """Self-refined search must equal exact top-k under the QUANTIZED
    corpus model (dequantized rows), with no full-precision store."""
    from rag_dpo_tpu.ops.quantize import approx_topk_int8_selfrefined

    q, e = _corpus(n=3000, d=128, seed=5)
    e_i8, e_s = quantize_rows(e)
    s, i = approx_topk_int8_selfrefined(jnp.asarray(q), e_i8, e_s, k=10,
                                        oversample=8)
    deq = np.asarray(e_i8, np.float32) * np.asarray(e_s)[:, None]
    s_ref = q @ deq.T
    i_ref = np.argsort(-s_ref, axis=1)[:, :10]
    i = np.asarray(i)
    recall = np.mean([len(set(i[r]) & set(i_ref[r])) / 10
                      for r in range(8)])
    assert recall >= 0.95, recall
    # returned scores match the dequant model exactly (f32 accumulation)
    got = np.asarray(s)
    want = np.take_along_axis(s_ref, i, axis=1)
    assert np.allclose(got, want, atol=1e-3)
    # penalty path
    pen = np.where(np.arange(3000) % 3 == 0, -1e30, 0.0).astype(
        np.float32)
    s2, i2 = approx_topk_int8_selfrefined(
        jnp.asarray(q), e_i8, e_s, k=10, oversample=8,
        penalty=jnp.asarray(pen))
    i2 = np.asarray(i2)
    assert (i2[i2 >= 0] % 3 != 0).all()


def test_int8_index_device_refine_path():
    """device_refine=True routes the int8 search through the one-program
    dequant refine; results must match the host-refine path's ids."""
    q, e = _corpus(n=400, d=64, seed=7)
    metas = [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
             for i in range(400)]
    ids = [f"c{i}" for i in range(400)]
    host = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=64,
                                   quantize_int8=True))
    host.add(ids, e, metas)
    dev = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=64,
                                  quantize_int8=True, device_refine=True))
    dev.add(ids, e, metas)
    qq = e[[7, 123, 350]]
    sh, ih = host.search_dense(qq, 5)
    sd, idd = dev.search_dense(qq, 5)
    assert idd[:, 0].tolist() == [7, 123, 350]
    # same candidates surface; host scores are f16-exact, device scores
    # dequant-exact — ids should agree on a well-separated corpus
    assert (ih[:, :3] == idd[:, :3]).mean() >= 0.8
    # filters + tombstones hold through the device-refine path
    sd, idd = dev.search_dense(qq[:1], 5, where={"nature": "DOCTRINE"})
    natures = {dev.meta.row(int(r))["nature"] for r in idd[0] if r >= 0}
    assert natures == {"DOCTRINE"}
    dev.delete(["c123"])
    sd, idd = dev.search_dense(qq[1:2], 3)
    assert 123 not in idd[0]


def test_sharded_int8_device_refine():
    """device_refine must be honored on the MESH path too (review
    finding: it was silently ignored), with filters intact."""
    from rag_dpo_tpu.parallel import MeshSpec, create_mesh

    q, e = _corpus(n=320, d=64, seed=9)
    idx = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=8,
                                  quantize_int8=True, device_refine=True),
                      mesh=create_mesh(MeshSpec(shard=8)))
    idx.add([f"c{i}" for i in range(320)], e,
            [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
             for i in range(320)])
    qq = e[[7, 123]]
    s, rows = idx.search_dense(qq, 5)
    assert rows[:, 0].tolist() == [7, 123]
    s, rows = idx.search_dense(qq[:1], 5, where={"nature": "DOCTRINE"})
    natures = {idx.meta.row(int(r))["nature"] for r in rows[0] if r >= 0}
    assert natures == {"DOCTRINE"} and 7 not in rows[0]
    idx.delete(["c123"])
    s, rows = idx.search_dense(qq[1:2], 3)
    assert 123 not in rows[0]


def test_int8_blockscan_matches_selfrefined():
    """Block-scanned sweep == full-sweep selfrefined on a corpus whose
    size is NOT a multiple of the block (exercises the clamped tail +
    overlap mask: no id may appear twice)."""
    from rag_dpo_tpu.ops.quantize import (
        approx_topk_int8_blockscan,
        approx_topk_int8_selfrefined,
    )

    q, e = _corpus(n=2900, d=128, seed=11)
    e_i8, e_s = quantize_rows(e)
    s_full, i_full = approx_topk_int8_selfrefined(
        jnp.asarray(q), e_i8, e_s, k=10, oversample=8)
    s_blk, i_blk = approx_topk_int8_blockscan(
        jnp.asarray(q), e_i8, e_s, k=10, oversample=8, block_rows=512)
    i_blk = np.asarray(i_blk)
    for r in range(i_blk.shape[0]):
        valid = i_blk[r][i_blk[r] >= 0]
        assert len(set(valid.tolist())) == len(valid), "duplicate id"
    # same exact-refined scores → same ranking (ties aside)
    assert np.allclose(np.asarray(s_blk), np.asarray(s_full), atol=1e-3)
    assert np.mean(np.asarray(i_full) == i_blk) > 0.95


def test_int8_blockscan_penalty_and_edges():
    from rag_dpo_tpu.ops.quantize import approx_topk_int8_blockscan

    q, e = _corpus(n=700, d=64, seed=12)
    e_i8, e_s = quantize_rows(e)
    pen = np.where(np.arange(700) % 2 == 0, -1e4, 0.0).astype(np.float32)
    s, i = approx_topk_int8_blockscan(
        jnp.asarray(q), e_i8, e_s, k=10, oversample=8, block_rows=256,
        penalty=jnp.asarray(pen))
    i = np.asarray(i)
    assert (i[i >= 0] % 2 != 0).all()
    # k > n: padded with -1 ids
    s2, i2 = approx_topk_int8_blockscan(
        jnp.asarray(q[:2]), e_i8[:4], e_s[:4], k=10, block_rows=256)
    i2 = np.asarray(i2)
    assert (i2[:, 4:] == -1).all() or (np.asarray(s2)[:, 4:] < -1e29).all()
    # single block (block_rows >= n) degenerates to the full sweep
    s3, i3 = approx_topk_int8_blockscan(
        jnp.asarray(q), e_i8, e_s, k=5, block_rows=4096)
    deq = np.asarray(e_i8, np.float32) * np.asarray(e_s)[:, None]
    i_ref = np.argsort(-(q @ deq.T), axis=1)[:, :5]
    assert np.mean(np.asarray(i3) == i_ref) > 0.9


def test_int8_index_blockscan_routing():
    """sweep_block_rows forces the block-scanned sweep through the index
    path; results must match the full-sweep device_refine path, with
    filters and tombstones intact."""
    q, e = _corpus(n=400, d=64, seed=9)
    metas = [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
             for i in range(400)]
    ids = [f"c{i}" for i in range(400)]
    full = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=64,
                                   quantize_int8=True, device_refine=True))
    full.add(ids, e, metas)
    blk = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=64,
                                  quantize_int8=True, device_refine=True,
                                  sweep_block_rows=128))
    blk.add(ids, e, metas)
    qq = e[[7, 123, 350]]
    sf, i_f = full.search_dense(qq, 5)
    sb, i_b = blk.search_dense(qq, 5)
    assert i_b[:, 0].tolist() == [7, 123, 350]
    assert np.allclose(sf, sb, atol=1e-3)
    sb, i_b = blk.search_dense(qq[:1], 5, where={"nature": "DOCTRINE"})
    natures = {blk.meta.row(int(r))["nature"] for r in i_b[0] if r >= 0}
    assert natures == {"DOCTRINE"}
    blk.delete(["c123"])
    sb, i_b = blk.search_dense(qq[1:2], 3)
    assert 123 not in i_b[0]
    # config round-trips through the checkpoint
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        blk.save(d)
        again = DeviceIndex.load(d)
        assert again.config.sweep_block_rows == 128
        s2, i2 = again.search_dense(qq[:1], 3)
        assert i2[0, 0] == 7


def test_int8_blockscan_eref_matches_refined():
    """blockscan with e_ref refines against the full-precision store —
    must agree with approx_topk_int8_refined's exact scores."""
    from rag_dpo_tpu.ops.quantize import (
        approx_topk_int8_blockscan,
        approx_topk_int8_refined,
    )

    q, e = _corpus(n=1500, d=128, seed=13)
    e_i8, e_s = quantize_rows(e)
    eref = jnp.asarray(e)
    s_r, i_r = approx_topk_int8_refined(
        jnp.asarray(q), e_i8, e_s, eref, k=10, oversample=8)
    s_b, i_b = approx_topk_int8_blockscan(
        jnp.asarray(q), e_i8, e_s, k=10, oversample=8, block_rows=400,
        e_ref=eref)
    assert np.allclose(np.asarray(s_b), np.asarray(s_r), atol=1e-3)
    assert np.mean(np.asarray(i_b) == np.asarray(i_r)) > 0.95


def test_sharded_int8_blockscan_local_sweep():
    """Forcing sweep_block_rows below the per-shard row count routes the
    MESH int8 sweep through the scanned candidates helper; results and
    filters must match the full-sweep mesh path."""
    from rag_dpo_tpu.parallel import MeshSpec, create_mesh

    q, e = _corpus(n=320, d=64, seed=21)
    mesh = create_mesh(MeshSpec(shard=8))
    metas = [{"nature": "GUIDE" if i % 2 else "DOCTRINE"}
             for i in range(320)]
    ids = [f"c{i}" for i in range(320)]
    full = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=8,
                                   quantize_int8=True,
                                   device_refine=True), mesh=mesh)
    full.add(ids, e, metas)
    blk = DeviceIndex(IndexConfig(dim=64, ell_width=4, row_block=8,
                                  quantize_int8=True, device_refine=True,
                                  sweep_block_rows=16), mesh=mesh)
    blk.add(ids, e, metas)
    qq = e[[7, 123]]
    sf, rf = full.search_dense(qq, 5)
    sb, rb = blk.search_dense(qq, 5)
    assert rb[:, 0].tolist() == [7, 123]
    assert np.allclose(sf, sb, atol=1e-3)
    sb, rb = blk.search_dense(qq[:1], 5, where={"nature": "DOCTRINE"})
    natures = {blk.meta.row(int(r))["nature"] for r in rb[0] if r >= 0}
    assert natures == {"DOCTRINE"} and 7 not in rb[0]
    blk.delete(["c123"])
    sb, rb = blk.search_dense(qq[1:2], 3)
    assert 123 not in rb[0]
