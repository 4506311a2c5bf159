"""`IndexConfig.postings_candidates` (round-3 tuning knob): the
rescore-pool size plumbs through every postings path — single-device,
masked, and mesh-sharded — and a reduced pool returns the same results
as the exhaustive default on a corpus with ample coverage (the measured
basis for the serving recipe in BENCHMARKS.md "Hybrid tracking dense").
"""

import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    n, d, ell = 400, 32, 6
    dense = rng.standard_normal((n, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    terms = rng.integers(0, 50, (n, ell)).astype(np.int32)
    imps = np.abs(rng.standard_normal((n, ell))).astype(np.float32)
    metas = [{"n": i % 3} for i in range(n)]
    return dense, terms, imps, metas


def _build(corpus, mesh=None, **cfg):
    dense, terms, imps, metas = corpus
    idx = DeviceIndex(
        IndexConfig(dim=dense.shape[1], ell_width=terms.shape[1],
                    row_block=8, postings_threshold=16, **cfg),
        mesh=mesh)
    idx.add([f"c{i}" for i in range(len(dense))], dense, metas,
            terms, imps)
    return idx


def test_reduced_pool_matches_exhaustive(corpus, eight_devices):
    _, terms, imps, _ = corpus
    qt, qw = terms[[5, 99]], imps[[5, 99]]
    mesh = create_mesh(MeshSpec(shard=8))
    results = {}
    for cand in (64, 512):
        for mesh_name, m in (("single", None), ("mesh", mesh)):
            idx = _build(corpus, mesh=m, postings_candidates=cand)
            s, i = idx.search_sparse(qt, qw, 5)
            results[(cand, mesh_name)] = np.asarray(i)
            # masked path honors the filter at any pool size
            s2, i2 = idx.search_sparse(qt, qw, 5, where={"n": 1})
            for r in i2[i2 >= 0]:
                assert idx.meta.row(int(r))["n"] == 1
    base = results[(512, "single")]
    for key, ids in results.items():
        np.testing.assert_array_equal(ids, base, err_msg=str(key))


def test_pool_size_keys_the_sharded_searcher_cache(corpus,
                                                   eight_devices):
    """Changing postings_candidates must not reuse a searcher compiled
    for another pool size."""
    mesh = create_mesh(MeshSpec(shard=8))
    _, terms, imps, _ = corpus
    qt, qw = terms[[5]], imps[[5]]
    a = _build(corpus, mesh=mesh, postings_candidates=64)
    a.search_sparse(qt, qw, 5)
    keys = [k for k in a._searchers if k[0] == "sharded_sparse_post"]
    assert keys and keys[0][2] == 64
