"""Randomized op fuzz against the in-repo jnp/host oracles."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from rag_dpo_tpu.ops import maxsim, maxsim_reference, rrf_fuse
from rag_dpo_tpu.ops.fusion import rrf_fuse_reference


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_rrf_matches_host_oracle(seed):
    rng = np.random.default_rng(seed)
    a = int(rng.integers(1, 5))          # arms
    q = int(rng.integers(1, 4))
    l = int(rng.integers(1, 12))         # list length
    n_ids = int(rng.integers(2, 30))
    ids = rng.integers(-1, n_ids, size=(a, q, l)).astype(np.int32)
    weights = rng.uniform(0.25, 2.5, size=a).astype(np.float32)
    topk = int(rng.integers(1, 15))

    s, i = rrf_fuse(jnp.asarray(ids), jnp.asarray(weights), topk=topk)
    s, i = np.asarray(s), np.asarray(i)
    for qi in range(q):
        want = rrf_fuse_reference(
            [ids[ar, qi].tolist() for ar in range(a)], weights.tolist())
        order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        got = [(int(x), float(v)) for x, v in zip(i[qi], s[qi])
               if x >= 0]
        assert len(got) == min(topk, len(order)), (seed, qi)
        for (gid, gs), (wid, ws) in zip(got, order):
            # scores must match exactly; ids may swap only on ties
            assert abs(gs - ws) < 1e-6, (seed, qi, got, order)
            if abs(ws - dict(order).get(gid, -1)) > 1e-6:
                raise AssertionError((seed, qi, got, order))


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_maxsim_matches_reference(seed):
    rng = np.random.default_rng(seed)
    q, lq = int(rng.integers(1, 4)), int(rng.integers(1, 9))
    c, ld = int(rng.integers(1, 12)), int(rng.integers(1, 17))
    d = int(rng.choice([16, 32]))
    qv = rng.standard_normal((q, lq, d)).astype(np.float32)
    dv = rng.standard_normal((c, ld, d)).astype(np.float32)
    qm = rng.integers(0, 2, (q, lq)).astype(bool)
    qm[:, 0] = True                      # ≥1 valid query token
    dm = rng.integers(0, 2, (c, ld)).astype(bool)
    dm[:, 0] = True
    ref = np.asarray(maxsim_reference(
        jnp.asarray(qv), jnp.asarray(qm), jnp.asarray(dv),
        jnp.asarray(dm)))
    got = np.asarray(maxsim(
        jnp.asarray(qv), jnp.asarray(qm), jnp.asarray(dv),
        jnp.asarray(dm)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
