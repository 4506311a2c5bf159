"""Training loop: batches → sharded steps → checkpoints → metrics.

Completes the training stack (config → state → sharded step →
orbax checkpoints) with the orchestration layer: deterministic batching
over (query, passage) pair datasets, periodic checkpointing, resume from
the latest step, and JSONL metric logging — the checkpoint-everywhere
philosophy the reference applies to its corpus pipeline (SURVEY.md §5),
applied to training.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenize import HashedTokenizer, Tokenizer
from .checkpoint import TrainCheckpointer
from .contrastive import TrainConfig, create_train_state, \
    make_sharded_train_step

log = logging.getLogger(__name__)


@dataclasses.dataclass
class LoopConfig:
    batch_size: int = 32
    max_steps: int = 1000
    seq_len: int = 64
    checkpoint_every: int = 100
    log_every: int = 10
    shuffle_seed: int = 0


class PairBatcher:
    """Deterministic epoch shuffling over (query, passage) text pairs."""

    def __init__(self, pairs: Sequence[tuple[str, str]],
                 tokenizer: Tokenizer, batch_size: int, seq_len: int,
                 seed: int = 0):
        assert len(pairs) >= batch_size, "dataset smaller than batch"
        self.pairs = list(pairs)
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.seed = seed

    def batch_at(self, step: int) -> dict:
        n = len(self.pairs)
        per_epoch = n // self.batch_size
        epoch, slot = divmod(step, per_epoch)
        order = np.random.default_rng(self.seed + epoch).permutation(n)
        idx = order[slot * self.batch_size:(slot + 1) * self.batch_size]
        queries = [self.pairs[i][0] for i in idx]
        passages = [self.pairs[i][1] for i in idx]
        qe = self.tokenizer.encode_batch(queries, self.seq_len)
        pe = self.tokenizer.encode_batch(passages, self.seq_len)
        return {
            "query_ids": jnp.asarray(qe.input_ids),
            "query_lengths": jnp.asarray(qe.lengths),
            "passage_ids": jnp.asarray(pe.input_ids),
            "passage_lengths": jnp.asarray(pe.lengths),
        }


def train_retriever(
    pairs: Sequence[tuple[str, str]],
    train_config: TrainConfig,
    mesh,
    ckpt_dir,
    loop_config: LoopConfig | None = None,
    tokenizer: Tokenizer | None = None,
    metrics_path=None,
):
    """Run (or resume) contrastive fine-tuning. → final TrainState."""
    loop = loop_config or LoopConfig()
    tokenizer = tokenizer or HashedTokenizer(
        vocab_size=train_config.model.encoder.vocab_size)
    batcher = PairBatcher(pairs, tokenizer, loop.batch_size,
                          loop.seq_len, loop.shuffle_seed)

    state = create_train_state(train_config)
    step_fn, state = make_sharded_train_step(train_config, mesh, state)

    ckpt = TrainCheckpointer(ckpt_dir)
    latest = ckpt.latest_step()
    if latest is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", latest)
    start = int(jax.device_get(state.step))

    metrics_file = None
    if metrics_path:
        pathlib.Path(metrics_path).parent.mkdir(parents=True,
                                                exist_ok=True)
        metrics_file = open(metrics_path, "a", encoding="utf-8")
    try:
        for step in range(start, loop.max_steps):
            batch = batcher.batch_at(step)
            state, metrics = step_fn(state, batch)
            if (step + 1) % loop.log_every == 0 or step == start:
                entry = {
                    "step": step + 1,
                    "loss": round(float(metrics["loss"]), 5),
                    "accuracy": round(float(metrics["accuracy"]), 4),
                    "ts": time.time(),
                }
                log.info("train %s", entry)
                if metrics_file:
                    metrics_file.write(json.dumps(entry) + "\n")
                    metrics_file.flush()
            if (step + 1) % loop.checkpoint_every == 0:
                ckpt.save(state)
        if ckpt.latest_step() != int(jax.device_get(state.step)):
            ckpt.save(state, force=True)
    finally:
        if metrics_file:
            metrics_file.close()
        ckpt.close()
    return state
