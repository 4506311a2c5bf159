"""Multi-host (DCN) support: REAL two-process test over Gloo collectives.

Spawns two Python processes, each with 4 virtual CPU devices, joined by
`initialize_multihost`. The corpus is row-sharded across ALL 8 devices
via `host_local_rows` (each process contributes only its own rows —
no host ever holds the full matrix), and a planted nearest-neighbor that
lives on the OTHER host must come back at rank 1 through the sharded
top-k merge — proving the all-gather crossed the process (DCN) boundary.

The identical API targets a real multi-slice TPU pod; here the
"hosts" are processes and the transport is Gloo instead of DCN.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from rag_dpo_tpu.parallel import (
        MeshSpec, create_multihost_mesh, host_local_rows,
        initialize_multihost, is_multihost,
    )

    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
    assert is_multihost() and jax.process_count() == 2
    assert len(jax.devices()) == 8 and jax.local_device_count() == 4

    # data axis = host axis; shard axis = intra-host index shards
    mesh = create_multihost_mesh(MeshSpec(data=2, model=1, shard=4))
    # host alignment: every device of mesh row h belongs to process h
    for h in range(2):
        procs = {{d.process_index for d in mesh.devices[h].flat}}
        assert procs == {{h}}, (h, procs)

    # ---- row-sharded corpus, planted cross-host neighbor ----
    N, D = 64, 16   # rows 0..31 on host 0, 32..63 on host 1
    rng = np.random.default_rng(0)
    full = rng.standard_normal((N, D)).astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    mine = full[pid * 32:(pid + 1) * 32]
    from jax.sharding import PartitionSpec as P
    corpus = host_local_rows((N, D), mesh, mine, axis=("data", "shard"))

    # ONE query, identical on every process (SPMD requires processes
    # to contribute the same replicated values); the target row lives on
    # host 1, so host 0 finding it proves the merge crossed DCN
    target = 40
    q = jnp.asarray(full[[target]])

    import functools
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P(("data", "shard"), None)),
        out_specs=(P(), P()), check_vma=False,
    )
    def topk(qq, rows):
        s = qq @ rows.T                       # [1, local]
        k = 3
        sl, il = jax.lax.top_k(s, k)
        base = jax.lax.axis_index("data") * 32 + \
            jax.lax.axis_index("shard") * 8
        il = il + base
        sg = jax.lax.all_gather(sl, ("data", "shard"), axis=1, tiled=True)
        ig = jax.lax.all_gather(il, ("data", "shard"), axis=1, tiled=True)
        st, pt = jax.lax.top_k(sg, k)
        return st, jnp.take_along_axis(ig, pt, axis=1)

    s, i = jax.jit(topk)(q, corpus)
    winner = int(np.asarray(i.addressable_data(0))[0, 0])
    assert winner == target, (winner, target)
    print(f"MULTIHOST_OK p{{pid}} winner={{winner}}", flush=True)
""").format(repo=REPO)


# Production-index worker: the REAL DeviceIndex engines (dense bf16,
# masked, ELL sparse, impact-ordered postings, int8 blockscan+refine, and
# device RRF over the arms) run over a mesh whose `shard` axis SPANS the
# two processes — every per-arm top-k merge is an all-gather across the
# process (DCN) boundary, and each process uploads only its own rows
# (store._put_rows → host_local_rows). Every arm is asserted equal to a
# single-device oracle, with planted winners on the OTHER host.
WORKER_INDEX = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from rag_dpo_tpu.parallel import (
        MeshSpec, create_multihost_mesh, initialize_multihost)

    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    # import AFTER distributed init (module import touches the backend)
    from rag_dpo_tpu.index import DeviceIndex, IndexConfig
    from rag_dpo_tpu.ops.fusion import rrf_fuse

    # index sharding ACROSS hosts (the corpus-larger-than-one-host's-HBM
    # layout): shard axis spans both processes, so every per-arm top-k
    # merge crosses DCN
    mesh = create_multihost_mesh(MeshSpec(data=1, model=1, shard=8),
                                 allow_split_collectives=True)
    shard_devs = list(mesh.devices[0, 0])
    assert {{d.process_index for d in shard_devs[:4]}} == {{0}}
    assert {{d.process_index for d in shard_devs[4:]}} == {{1}}

    N, D, ELL = 64, 16, 4     # rows 0..31 on host 0, 32..63 on host 1
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((N, D)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    terms = rng.integers(0, 40, size=(N, ELL)).astype(np.int32)
    impacts = np.abs(rng.standard_normal((N, ELL))).astype(np.float32)
    terms[51, 0] = 77; impacts[51, 0] = 9.0  # planted lexical winner (host 1)
    metas = [{{"nature": ["DOCTRINE", "GUIDE", "SANCTION"][i % 3]}}
             for i in range(N)]
    ids = [f"chunk_{{i}}" for i in range(N)]

    def build(mesh=None, **cfg):
        idx = DeviceIndex(IndexConfig(dim=D, ell_width=ELL, row_block=8,
                                      **cfg), mesh=mesh)
        idx.add(ids, dense, metas, terms, impacts)
        return idx

    def check(tag, got, want, atol=2e-2):
        gs, gi = got; ws, wi = want
        valid = wi >= 0
        assert (gi[valid] == wi[valid]).all(), (tag, gi, wi)
        assert np.allclose(gs[valid], ws[valid], atol=atol), tag
        assert ((gi < 0) == (wi < 0)).all(), tag

    q = dense[[40, 10]]       # row 40 lives on host 1, row 10 on host 0

    # ---- dense bf16 (+ masked) through the production DeviceIndex ----
    sh = build(mesh=mesh); si = build()
    got = sh.search_dense(q, 8)
    check("dense", got, si.search_dense(q, 8, exact=True))
    assert got[1][0, 0] == 40 and got[1][1, 0] == 10
    where = {{"nature": "GUIDE"}}
    gm = sh.search_dense(q, 8, where=where)
    check("masked", gm, si.search_dense(q, 8, where=where, exact=True))
    assert gm[1][0, 0] == 40  # 40 % 3 == 1 -> GUIDE, cross-host winner

    # ---- sparse: ELL engine and postings engine ----
    qt = np.array([[77, 3, -2, -2]], np.int32)
    qw = np.array([[2.0, 0.5, 0.0, 0.0]], np.float32)
    gs = sh.search_sparse(qt, qw, 5)
    check("sparse_ell", gs, si.search_sparse(qt, qw, 5), atol=1e-4)
    assert gs[1][0, 0] == 51  # planted cross-host lexical winner
    shp = build(mesh=mesh, postings_threshold=4)
    gp = shp.search_sparse(qt, qw, 5)
    check("sparse_postings", gp, si.search_sparse(qt, qw, 5), atol=1e-4)

    # ---- int8 blockscan + exact refine ----
    shi = build(mesh=mesh, quantize_int8=True)
    sii = build(quantize_int8=True)
    gi8 = shi.search_dense(dense[[55, 7]], 8)
    check("int8", gi8, sii.search_dense(dense[[55, 7]], 8), atol=1e-3)
    assert gi8[1][0, 0] == 55 and gi8[1][1, 0] == 7

    # ---- production RRF over the two arms ----
    _, d_rows = sh.search_dense(q[:1], 10)
    _, s_rows = sh.search_sparse(qt, qw, 10)
    w = jnp.asarray([2.0, 1.5], jnp.float32)
    fs, fr = rrf_fuse(jnp.asarray(np.stack([d_rows, s_rows]), jnp.int32),
                      w, k_rrf=60, topk=5)
    _, d_o = si.search_dense(q[:1], 10, exact=True)
    _, s_o = si.search_sparse(qt, qw, 10)
    fso, fro = rrf_fuse(jnp.asarray(np.stack([d_o, s_o]), jnp.int32),
                        w, k_rrf=60, topk=5)
    assert np.array_equal(np.asarray(fr), np.asarray(fro))
    print(f"MULTIHOST_INDEX_OK p{{pid}}", flush=True)
""").format(repo=REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dcn_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK p{pid}" in out, out[-3000:]


def test_two_process_production_index(tmp_path):
    """The production DeviceIndex hybrid (dense + masked + sparse ELL +
    postings + int8 + RRF) executes across the two-process DCN mesh with
    single-device-oracle parity (VERDICT round-2 item 1)."""
    script = tmp_path / "worker_index.py"
    script.write_text(WORKER_INDEX)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=400)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail("multihost index worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_INDEX_OK p{pid}" in out, out[-3000:]


def test_create_multihost_mesh_guards_and_idempotent_init():
    """Single-process checks of the multihost helpers: split-collective
    guard (review finding: the old condition accepted DCN-crossing shard
    merges) and idempotent initialize."""
    import jax

    from rag_dpo_tpu.parallel import (
        MeshSpec, create_multihost_mesh, initialize_multihost,
    )

    # single process: everything aligns, any divisible spec works
    mesh = create_multihost_mesh(MeshSpec(data=2, model=1, shard=4))
    assert mesh.shape == {"data": 2, "model": 1, "shard": 4}
    mesh = create_multihost_mesh()  # default: data=hosts(1), shard=rest
    assert mesh.shape["shard"] == len(jax.devices())
    with pytest.raises(ValueError, match="covers"):
        create_multihost_mesh(MeshSpec(data=64, model=1, shard=64))
    # idempotent double-init must not raise even when jax.distributed
    # was never set up / already set up by another component
    initialize_multihost()
    initialize_multihost()


WORKER_DECODER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax.numpy as jnp
    from rag_dpo_tpu.parallel import MeshSpec, create_multihost_mesh, \\
        initialize_multihost

    initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    from rag_dpo_tpu.models.decoder import DecoderConfig
    from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
    from rag_dpo_tpu.models.sharding import shard_params

    cfg = DecoderConfig.tiny(num_heads=4, num_kv_heads=2,
                             dtype=jnp.float32)
    gen = TextGenerator(cfg)
    params = gen.load()              # key(0) init — identical per process
    rng = np.random.default_rng(0)   # identical prompts per process
    ids = np.asarray(rng.integers(3, 512, (2, 10)), np.int32)
    lengths = np.asarray([10, 7], np.int32)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=4,
                              eos_id=-1)
    ref = gen.generate_ids(ids, lengths, sampling)   # local, unsharded

    # TP spanning the PROCESS boundary: model axis = the host axis
    # (allow_split_collectives — the attention/MLP psums cross DCN;
    # on a real pod you'd keep TP on ICI, this PROVES it still works)
    mesh = create_multihost_mesh(MeshSpec(data=1, model=2, shard=4),
                                 allow_split_collectives=True)
    hosts_per_model = [
        {{d.process_index for d in mesh.devices[0][m].flat}}
        for m in range(2)
    ]
    assert hosts_per_model == [{{0}}, {{1}}], hosts_per_model

    gen_tp = TextGenerator(cfg, params=shard_params(params, mesh))
    tp = gen_tp.generate_ids(ids, lengths, sampling)
    assert np.array_equal(np.asarray(ref), np.asarray(tp)), (ref, tp)

    # int8 KV cache under cross-host TP too (serving memory recipe)
    import dataclasses as _dc
    qcfg = _dc.replace(cfg, quantize_kv=True)
    gq = TextGenerator(qcfg, params=params)
    ref_q = gq.generate_ids(ids, lengths, sampling)
    gq_tp = TextGenerator(qcfg, params=shard_params(params, mesh))
    tp_q = gq_tp.generate_ids(ids, lengths, sampling)
    assert np.array_equal(np.asarray(ref_q), np.asarray(tp_q))

    print(f"MULTIHOST_DECODER_OK p{{pid}}", flush=True)
""").format(repo=REPO)


def test_two_process_decoder_tp(tmp_path):
    """Decoder TP with the model axis SPANNING the two-process DCN
    mesh: sharded greedy generation (bf16 and int8-KV caches) equals
    the unsharded single-process run token-for-token — the attention/
    MLP psums crossed the process boundary."""
    script = tmp_path / "worker_decoder.py"
    script.write_text(WORKER_DECODER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=400)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            pytest.fail("multihost decoder worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_DECODER_OK p{pid}" in out, out[-3000:]
