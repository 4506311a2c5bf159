import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.parallel import (
    AXIS_SHARD,
    MeshSpec,
    create_mesh,
    shard_leading_axis,
    sharded_topk,
)


def test_mesh_spec_devices():
    spec = MeshSpec.for_devices(8)
    assert spec.n_devices == 8
    assert spec.shard == 8
    spec2 = MeshSpec.for_devices(8, model=2)
    assert spec2.model == 2 and spec2.shard == 4


def test_create_mesh(eight_devices):
    mesh = create_mesh(MeshSpec(data=1, model=2, shard=4))
    assert mesh.shape == {"data": 1, "model": 2, "shard": 4}


def test_sharded_topk_matches_dense(eight_devices):
    mesh = create_mesh(MeshSpec(shard=8))
    rng = np.random.default_rng(0)
    n, d, q, k = 512, 64, 4, 10
    embs = rng.standard_normal((n, d), dtype=np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    queries = rng.standard_normal((q, d), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    sharding = shard_leading_axis(mesh)
    embs_d = jax.device_put(jnp.asarray(embs), sharding)
    ids_d = jax.device_put(jnp.arange(n, dtype=jnp.int32), sharding)
    queries_d = jnp.asarray(queries)

    def scores_fn(qs, shard_embs):
        return qs @ shard_embs.T

    search = sharded_topk(mesh, scores_fn, k)
    scores, ids = jax.tree.map(np.asarray, search(queries_d, embs_d, ids_d))

    ref = queries @ embs.T
    ref_ids = np.argsort(-ref, axis=1, kind="stable")[:, :k]
    ref_scores = np.take_along_axis(ref, ref_ids, axis=1)

    np.testing.assert_allclose(scores, ref_scores, rtol=1e-5, atol=1e-5)
    # Score parity is the contract; ids can differ only on exact ties.
    for row in range(q):
        assert set(ids[row]) == set(ref_ids[row]) or np.allclose(
            scores[row], ref_scores[row]
        )


def test_sharded_topk_k_larger_than_shard(eight_devices):
    mesh = create_mesh(MeshSpec(shard=8))
    n, d, k = 32, 16, 8  # 4 rows per shard < k → padding path
    rng = np.random.default_rng(1)
    embs = rng.standard_normal((n, d), dtype=np.float32)
    qs = rng.standard_normal((2, d), dtype=np.float32)
    sharding = shard_leading_axis(mesh)
    embs_d = jax.device_put(jnp.asarray(embs), sharding)
    ids_d = jax.device_put(jnp.arange(n, dtype=jnp.int32), sharding)
    search = sharded_topk(mesh, lambda q, e: q @ e.T, k)
    scores, ids = jax.tree.map(np.asarray, search(jnp.asarray(qs), embs_d, ids_d))
    ref = qs @ embs.T
    ref_top = np.sort(ref, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(scores), ref_top, rtol=1e-5, atol=1e-5)
