"""Micro-batching serving layer: aggregation, key isolation, error
propagation, oversized splits, and the /search endpoint."""

import threading

import numpy as np
import pytest

from rag_dpo_tpu.serving import MicroBatcher, batched_dense_search


def test_batcher_aggregates_concurrent_requests():
    seen = []

    def fn(stacked, key):
        seen.append(stacked.shape[0])
        return (stacked * 2.0, np.full((stacked.shape[0],), 7))

    b = MicroBatcher(fn, max_batch=64, max_wait_ms=30.0)
    results = {}

    def call(i):
        rows = np.full((2, 4), float(i), np.float32)
        results[i] = b(rows, key="k")

    threads = [threading.Thread(target=call, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(16):
        out, extra = results[i]
        assert out.shape == (2, 4) and (out == 2.0 * i).all()
        assert (extra == 7).all()
    assert b.stats.n_requests == 16
    assert b.stats.max_batch_seen > 2, \
        f"no aggregation happened: {seen}"
    assert b.stats.n_device_calls < 16
    b.close()


def test_batcher_isolates_keys_and_propagates_errors():
    def fn(stacked, key):
        if key == "boom":
            raise RuntimeError("kernel exploded")
        return (stacked + (1.0 if key == "a" else 10.0),)

    b = MicroBatcher(fn, max_batch=8, max_wait_ms=5.0)
    (out_a,) = b(np.zeros((2, 3), np.float32), key="a")
    (out_b,) = b(np.zeros((2, 3), np.float32), key="b")
    assert (out_a == 1.0).all() and (out_b == 10.0).all()
    with pytest.raises(RuntimeError, match="kernel exploded"):
        b(np.zeros((1, 3), np.float32), key="boom")
    # the batcher survives an fn error
    (again,) = b(np.zeros((1, 3), np.float32), key="a")
    assert (again == 1.0).all()
    b.close()


def test_batcher_splits_oversized_requests():
    calls = []

    def fn(stacked, key):
        calls.append(stacked.shape[0])
        return (stacked,)

    b = MicroBatcher(fn, max_batch=8, max_wait_ms=1.0)
    (out,) = b(np.arange(20, dtype=np.float32).reshape(20, 1), key=None)
    assert out.shape == (20, 1) and (out[:, 0] == np.arange(20)).all()
    assert max(calls) <= 8
    b.close()


def test_batched_dense_search_matches_direct():
    from rag_dpo_tpu.index import DeviceIndex, IndexConfig

    rng = np.random.default_rng(0)
    e = rng.standard_normal((300, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    idx = DeviceIndex(IndexConfig(dim=32, ell_width=4, row_block=64))
    idx.add([f"c{i}" for i in range(300)], e,
            [{"nature": "GUIDE" if i % 2 else "SANCTION"}
             for i in range(300)])
    search = batched_dense_search(idx, max_batch=32, max_wait_ms=10.0)

    results = {}

    def call(i, where=None):
        results[(i, bool(where))] = search(e[[i]], 5, where=where)

    threads = [threading.Thread(target=call, args=(i,))
               for i in (3, 77, 150)]
    threads += [threading.Thread(
        target=call, args=(9,), kwargs={"where": {"nature": "GUIDE"}})]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in (3, 77, 150):
        s, rows = results[(i, False)]
        ds, drows = idx.search_dense(e[[i]], 5)
        assert rows[0, 0] == i
        assert rows.tolist() == drows.tolist()
    s, rows = results[(9, True)]
    for r in rows[0]:
        if r >= 0:
            assert idx.meta.row(int(r))["nature"] == "GUIDE"
    assert search.batcher.stats.n_requests == 4
    search.batcher.close()


def test_batcher_search_pads_to_power_of_two():
    """Aggregated search batches pad to the next power of two before the
    device call (bounds the XLA program count) and results slice back to
    the caller's rows."""
    import numpy as np

    from rag_dpo_tpu.index import DeviceIndex, IndexConfig
    from rag_dpo_tpu.serving import batched_dense_search

    rng = np.random.default_rng(0)
    n, d = 64, 16
    dense = rng.standard_normal((n, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=4, row_block=8))
    idx.add([f"c{i}" for i in range(n)], dense)

    seen_shapes = []
    real = idx.search_dense

    def spy(q, k, where=None, **kw):
        seen_shapes.append(q.shape[0])
        return real(q, k, where=where, **kw)

    idx.search_dense = spy
    search = batched_dense_search(idx, max_batch=16, max_wait_ms=1.0)
    s, i = search(dense[[3, 7, 11]], 4)   # q=3 → padded to 4
    assert i.shape == (3, 4)
    assert i[0, 0] == 3 and i[1, 0] == 7 and i[2, 0] == 11
    assert all(b & (b - 1) == 0 for b in seen_shapes), seen_shapes
    search.batcher.close()


def test_index_warm_compiles_search_programs():
    import numpy as np

    from rag_dpo_tpu.index import DeviceIndex, IndexConfig

    rng = np.random.default_rng(1)
    n, d = 48, 16
    dense = rng.standard_normal((n, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    terms = rng.integers(0, 20, (n, 4)).astype(np.int32)
    imps = np.abs(rng.standard_normal((n, 4))).astype(np.float32)
    idx = DeviceIndex(IndexConfig(dim=d, ell_width=4, row_block=8))
    idx.add([f"c{i}" for i in range(n)], dense, None, terms, imps)
    idx.warm(batch_sizes=(1, 4), k=3)     # must not raise
    s, i = idx.search_dense(dense[[5]], 3)
    assert i[0, 0] == 5
    DeviceIndex(IndexConfig(dim=d)).warm()  # empty index: no-op


def test_batcher_degrades_stacked_failure_to_per_caller_calls():
    """A stacked batch that exhausts device memory must not fail its
    callers if their individual requests fit: the worker retries each
    pending alone (measured failure: 15/32 queries RESOURCE_EXHAUSTED
    in the coalesced-encode arm, bench_e2e_concurrent.py 2026-08-20)."""
    import threading

    def fn(stacked, key):
        if stacked.shape[0] > 2:  # "OOM" only on the aggregated call
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return (stacked + 1.0,)

    b = MicroBatcher(fn, max_batch=64, max_wait_ms=50.0)
    outs, errs = [None] * 4, [None] * 4

    def call(i):
        try:
            (outs[i],) = b(np.full((2, 3), i, np.float32), key=None)
        except Exception as e:  # noqa: BLE001
            errs[i] = e

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == [None] * 4
    for i, out in enumerate(outs):
        assert (out == i + 1.0).all()
    assert b.stats.n_fallbacks >= 1
    # a request that fails even ALONE still errors its own caller
    with pytest.raises(RuntimeError, match="micro-batched call failed"):
        b(np.zeros((3, 3), np.float32), key=None)
    b.close()
