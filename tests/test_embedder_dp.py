"""Data-parallel corpus encode: mesh-sharded batches == single device."""

import numpy as np

from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh
from rag_dpo_tpu.providers import Embedder, EmbedderConfig


def test_dp_encode_matches_single(eight_devices):
    mesh = create_mesh(MeshSpec(data=8, model=1, shard=1))
    cfg = EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=16,
    )
    single = Embedder(cfg)
    params = single.load()
    sharded = Embedder(cfg, params=params, mesh=mesh)

    texts = [f"document numéro {i} sur la protection des données "
             f"personnelles et la conformité" for i in range(11)]
    ref = single.embed(texts)["dense"]
    out = sharded.embed(texts)["dense"]
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
    # queries too
    q_ref = single.embed_queries(["violation de données"])
    q_out = sharded.embed_queries(["violation de données"])
    np.testing.assert_allclose(q_out, q_ref, atol=1e-5, rtol=1e-5)


def test_query_batching_matches_direct_and_coalesces():
    """enable_query_batching: concurrent embed_queries callers get
    bit-identical vectors to the direct path, and the batcher stats
    prove the forwards actually coalesced (rows are independent under
    the per-row attention mask)."""
    import threading

    cfg = EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=16,
    )
    direct = Embedder(cfg)
    params = direct.load()
    batched = Embedder(cfg, params=params)
    batched.enable_query_batching(max_batch=16, max_wait_ms=10.0)

    groups = [[f"question {i} sur le registre des traitements"]
              * (1 + i % 3) for i in range(8)]
    want = [direct.embed_queries(g) for g in groups]

    batched.embed_queries(groups[0])        # warm the programs
    batched._query_batcher.stats.__init__()

    got = [None] * len(groups)
    barrier = threading.Barrier(len(groups))

    def run(i):
        barrier.wait()
        got[i] = batched.embed_queries(groups[i])

    ts = [threading.Thread(target=run, args=(i,))
          for i in range(len(groups))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for i in range(len(groups)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5,
                                   rtol=1e-5)
    st = batched._query_batcher.stats
    assert st.n_device_calls < st.n_requests
    assert st.max_batch_seen > 1


def test_concurrent_plain_encodes_bounded_and_identical():
    """16 concurrent embed_queries on the PLAIN path (no batcher) must
    produce each caller's solo vectors while the dispatch semaphore
    bounds in-flight forwards — unbounded concurrent dispatches each
    stage inputs + workspace and OOM'd a near-full serving chip
    (bench_e2e_concurrent.py agent arm)."""
    import threading

    import numpy as np

    from rag_dpo_tpu.providers.embedding import Embedder, EmbedderConfig

    emb = Embedder(EmbedderConfig(query_max_len=64))
    texts = [f"question numéro {i} sur le RGPD" for i in range(16)]
    solo = {t: emb.embed_queries([t])[0] for t in texts}
    out: dict = {}
    lock = threading.Lock()

    def worker(t):
        v = emb.embed_queries([t])[0]
        with lock:
            out[t] = v

    threads = [threading.Thread(target=worker, args=(t,))
               for t in texts]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert emb._dispatch_slots._value == 2  # slots all released
    for t in texts:
        np.testing.assert_allclose(out[t], solo[t], atol=1e-6)
