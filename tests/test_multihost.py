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
