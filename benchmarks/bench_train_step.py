"""Contrastive training throughput on one v5e chip — BGE-M3-large arch.

The training subsystem (train/contrastive.py: sharded InfoNCE with
global negatives) is the one stack layer without a hardware number.
Measures the full train step (fwd + bwd + adamw update) for the
real BGE-M3 architecture (XLM-R-large backbone, 24 layers, h=1024,
~568 M params) in bf16 activations with remat, batch 16 pairs × seq
192, on a single-device mesh. Reports steps/s and pairs/s.
"""

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.parallel.mesh import MeshSpec, create_mesh
from rag_dpo_tpu.train import (
    TrainConfig,
    create_train_state,
    make_sharded_train_step,
)

B, S, STEPS = 16, 192, 8


def main():
    enc = EncoderConfig.bge_m3(dtype=jnp.bfloat16, remat=True,
                               use_flash_attention=True,
                               max_position_embeddings=S + 2)
    cfg = TrainConfig(model=BgeM3Config(encoder=enc, colbert_dim=128),
                      warmup_steps=10)
    mesh = create_mesh(MeshSpec(data=1, model=1, shard=1),
                       devices=jax.devices()[:1])
    t0 = time.time()
    state = create_train_state(cfg)
    step, state = make_sharded_train_step(cfg, mesh, state)
    init_s = time.time() - t0
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        state.params))
    print(f"params: {n_params/1e6:.0f}M, init {init_s:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    batch = {
        "query_ids": jnp.asarray(
            rng.integers(4, enc.vocab_size, (B, S)), jnp.int32),
        "query_lengths": jnp.full((B,), S, jnp.int32),
        "passage_ids": jnp.asarray(
            rng.integers(4, enc.vocab_size, (B, S)), jnp.int32),
        "passage_lengths": jnp.full((B,), S, jnp.int32),
    }
    t0 = time.time()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t0
    print(f"first step (compile): {compile_s:.1f}s loss={loss0:.4f}",
          flush=True)

    t0 = time.time()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # fetch forces completion
    dt = (time.time() - t0) / STEPS
    assert np.isfinite(loss)
    res = {"bench": "train_step_bge_m3_large", "device":
           str(jax.devices()[0]), "params_m": round(n_params / 1e6),
           "batch_pairs": B, "seq_len": S,
           "ms_per_step": round(dt * 1e3, 1),
           "pairs_per_sec": round(B / dt, 1),
           "tokens_per_sec": round(2 * B * S / dt),
           "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(res), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
