"""Training loop: runs, logs, checkpoints, resumes."""

import json

import jax
import numpy as np
import pytest

from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.parallel import MeshSpec, create_mesh
from rag_dpo_tpu.train import TrainConfig
from rag_dpo_tpu.train.loop import LoopConfig, train_retriever

PAIRS = [
    (f"question sur le sujet {i}",
     f"passage documentaire détaillant le sujet {i} et ses obligations")
    for i in range(16)
]


def _tcfg():
    return TrainConfig(
        model=BgeM3Config(
            encoder=EncoderConfig(
                vocab_size=256, hidden_size=32, num_layers=1, num_heads=2,
                intermediate_size=64, max_position_embeddings=66,
                use_flash_attention=False,
            ),
            colbert_dim=16,
        ),
        warmup_steps=2,
    )


def test_train_loop_runs_and_checkpoints(tmp_path, eight_devices):
    mesh = create_mesh(MeshSpec(data=2, model=1, shard=1))
    loop = LoopConfig(batch_size=4, max_steps=6, seq_len=16,
                      checkpoint_every=3, log_every=2)
    metrics_path = tmp_path / "metrics.jsonl"
    state = train_retriever(PAIRS, _tcfg(), mesh, tmp_path / "ckpt",
                            loop, metrics_path=metrics_path)
    assert int(jax.device_get(state.step)) == 6
    entries = [json.loads(l) for l in
               metrics_path.read_text().splitlines()]
    assert entries[-1]["step"] == 6
    assert all(np.isfinite(e["loss"]) for e in entries)

    # resume: same dir continues from step 6 to 8
    loop2 = LoopConfig(batch_size=4, max_steps=8, seq_len=16,
                       checkpoint_every=3, log_every=2)
    state2 = train_retriever(PAIRS, _tcfg(), mesh, tmp_path / "ckpt",
                             loop2, metrics_path=metrics_path)
    assert int(jax.device_get(state2.step)) == 8


def test_batcher_deterministic_epochs():
    from rag_dpo_tpu.tokenize import HashedTokenizer
    from rag_dpo_tpu.train.loop import PairBatcher

    b = PairBatcher(PAIRS, HashedTokenizer(256), batch_size=4,
                    seq_len=24)
    a1 = b.batch_at(0)
    a2 = b.batch_at(0)
    np.testing.assert_array_equal(a1["query_ids"], a2["query_ids"])
    # different steps within an epoch → different rows
    b2 = b.batch_at(1)
    assert not np.array_equal(a1["query_ids"], b2["query_ids"])
