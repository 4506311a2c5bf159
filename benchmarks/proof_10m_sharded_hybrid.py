"""10M-chunk FULL-HYBRID sharded proof (BASELINE config 5, round 2).

Round 1 proved dense-only sharded search at 10M rows; this drives the
COMPLETE hybrid surface of `DeviceIndex` — dense, int8, ELL/postings
sparse, metadata-masked — over a 10M-row corpus row-sharded on the
8-device CPU fake-mesh, with planted winners asserted at rank 1. The
identical shard_map programs target a real pod slice; only per-chip
bandwidth changes. Run: `python benchmarks/proof_10m_sharded_hybrid.py`
(needs ~10 GB host RAM; a few minutes of CPU).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh

N, D, ELL = 10_000_000, 64, 8
VOCAB = 30_000
PLANT_DENSE, PLANT_SPARSE, PLANT_MASKED = 1_234_567, 7_777_777, 424_242


def main():
    t0 = time.time()
    mesh = create_mesh(MeshSpec(shard=8))
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((N, D)).astype(np.float16)
    dense /= np.linalg.norm(dense.astype(np.float32), axis=1,
                            keepdims=True).astype(np.float16)
    terms = rng.integers(0, VOCAB - 10, (N, ELL)).astype(np.int32)
    impacts = np.abs(rng.standard_normal((N, ELL))).astype(np.float32)

    # planted winners
    q_dense = rng.standard_normal((1, D)).astype(np.float32)
    q_dense /= np.linalg.norm(q_dense)
    dense[PLANT_DENSE] = q_dense[0].astype(np.float16)
    dense[PLANT_MASKED] = (0.97 * q_dense[0]).astype(np.float16)
    magic_term = VOCAB - 1                       # appears exactly once
    terms[PLANT_SPARSE, 0] = magic_term
    impacts[PLANT_SPARSE, 0] = 3.0

    idx = DeviceIndex(
        IndexConfig(dim=D, ell_width=ELL, row_block=1024,
                    postings_threshold=100_000),
        mesh=mesh,
    )
    # minimal metadata: one bool column marking the masked-plant row
    metas = None
    idx.add([f"c{i}" for i in range(N)], dense, metas, terms, impacts)
    idx.meta._bool["special"] = np.zeros((N,), bool)
    idx.meta._bool["special"][PLANT_MASKED] = True
    print(f"built 10M-row sharded index in {time.time() - t0:.0f}s",
          flush=True)

    # dense: planted row must be rank 1 across shards
    s, i = idx.search_dense(q_dense, 5)
    assert int(i[0, 0]) == PLANT_DENSE, i[0]
    print(f"dense ok: rank1={int(i[0, 0])} score={float(s[0, 0]):.4f}",
          flush=True)

    # masked dense: filter forces the 0.97-similarity special row
    s, i = idx.search_dense(q_dense, 3, where={"special": True})
    assert int(i[0, 0]) == PLANT_MASKED, i[0]
    assert (np.asarray(i[0, 1:]) == -1).all()    # only one row passes
    print("masked dense ok", flush=True)

    # sparse (per-shard postings engine at 1.25M rows/shard)
    qt = np.full((1, 4), -2, np.int32)
    qt[0, 0] = magic_term
    qw = np.zeros((1, 4), np.float32)
    qw[0, 0] = 5.0
    t1 = time.time()
    s, i = idx.search_sparse(qt, qw, 5)
    assert int(i[0, 0]) == PLANT_SPARSE, i[0]
    print(f"sparse ok in {time.time() - t1:.0f}s: "
          f"rank1={int(i[0, 0])} score={float(s[0, 0]):.3f}", flush=True)

    # tombstone the dense winner: next search must not return it
    idx.delete([f"c{PLANT_DENSE}"])
    s, i = idx.search_dense(q_dense, 5)
    assert PLANT_DENSE not in np.asarray(i[0]).tolist()
    print("tombstone ok", flush=True)

    print(f"ALL OK — full hybrid sharded at 10M rows "
          f"({time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
