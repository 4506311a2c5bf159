"""Sharded contrastive training for the retriever encoder.

New capability over the reference (which never trains anything — its models
are frozen third-party checkpoints, SURVEY.md §2.5): in-batch-negative
InfoNCE fine-tuning of the BGE-M3-style encoder on (query, positive
passage) pairs, the standard recipe for adapting a retriever to a corpus
(e.g. the CNIL legal domain).

Parallelism (this is the framework's full multi-chip training step):
* data parallel over the mesh `data` axis — per-device query/passage
  micro-batches, gradients reduced by XLA from the sharding annotations;
* tensor parallel over `model` — Megatron-style column/row sharding of
  attention and MLP blocks (models.sharding.param_spec);
* in-batch negatives are GLOBAL: dense embeddings are all-gathered across
  the data axis before the similarity matrix, so the effective negative
  pool scales with the mesh (the thing single-GPU training cannot do).

Attention uses the jnp reference path (differentiable); the Pallas flash
kernel is forward-only in round 1.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import BgeM3Config, BgeM3Model
from ..models.sharding import param_shardings
from ..parallel.mesh import AXIS_DATA


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: BgeM3Config
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    temperature: float = 0.05
    warmup_steps: int = 100
    grad_clip: float = 1.0


class TrainState(struct.PyTreeNode):
    step: Any
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, opt_state):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=opt_state)


def make_optimizer(cfg: TrainConfig):
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, cfg.warmup_steps, 10_000
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )


def create_train_state(cfg: TrainConfig, rng_seed: int = 0) -> TrainState:
    model = BgeM3Model(cfg.model)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.key(rng_seed), ids)
    opt_state = make_optimizer(cfg).init(params)
    return TrainState.create(params, opt_state)


def info_nce_loss(q_emb, p_emb, temperature: float, axis_name: str | None,
                  n_emb=None, n_valid=None):
    """Bidirectional InfoNCE with global in-batch negatives, plus
    optional EXPLICIT hard negatives (BGE/DPR-style triplets).

    q_emb/p_emb: [B_local, H] L2-normalized. With `axis_name`, positives
    and queries are all-gathered so every device scores against the global
    batch; labels are offset by the device's position along the axis.

    n_emb: optional [B_local, H] — one mined hard-negative passage per
    query, appended as a SHARED pool of extra columns in the
    query→passage softmax only (never the reverse direction: a hard
    negative is not anyone's positive, so it must not receive a
    positive gradient). n_valid: [B_local] bool — rows without a mined
    negative mask their column to -inf for every query. Explicit
    negatives avoid the contradictory-label failure of forcing near-
    duplicate variants into the same batch as each other's POSITIVES
    (measured: grouped batching over archive twins cost −2pt true-doc@5
    — the twin text is a near-copy, so twin-derived and true-derived
    queries assign the same content two different labels)."""
    if axis_name is not None:
        q_all = jax.lax.all_gather(q_emb, axis_name, axis=0, tiled=True)
        p_all = jax.lax.all_gather(p_emb, axis_name, axis=0, tiled=True)
        offset = jax.lax.axis_index(axis_name) * q_emb.shape[0]
    else:
        q_all, p_all, offset = q_emb, p_emb, 0

    logits = jnp.dot(q_emb, p_all.T) / temperature  # [B_local, B_global]
    labels = jnp.arange(q_emb.shape[0]) + offset
    if n_emb is not None:
        if axis_name is not None:
            n_all = jax.lax.all_gather(n_emb, axis_name, axis=0,
                                       tiled=True)
            v_all = (jax.lax.all_gather(n_valid, axis_name, axis=0,
                                        tiled=True)
                     if n_valid is not None else None)
        else:
            n_all, v_all = n_emb, n_valid
        neg = jnp.dot(q_emb, n_all.T) / temperature  # [B_local, B_neg]
        if v_all is not None:
            neg = jnp.where(v_all[None, :], neg, -1e30)
        logits = jnp.concatenate([logits, neg], axis=1)
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)

    logits_p = jnp.dot(p_emb, q_all.T) / temperature
    loss_p = optax.softmax_cross_entropy_with_integer_labels(logits_p, labels)

    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    loss = jnp.mean(loss_q + loss_p) / 2
    if axis_name is not None:
        loss = jax.lax.pmean(loss, axis_name)
        acc = jax.lax.pmean(acc, axis_name)
    return loss, acc


def make_sharded_train_step(cfg: TrainConfig, mesh: Mesh, state: TrainState):
    """→ (sharded_step, sharded_state).

    The returned step is jitted with explicit in/out shardings: params/opt
    state TP-sharded per models.sharding rules, batch sharded over `data`.
    XLA inserts the ICI collectives (all-gather for global negatives, psum
    for the TP row-parallel matmuls and the DP gradient reduction).
    """
    # the InfoNCE loss uses only the dense head: run a dense-only
    # forward (sparse/ColBERT head projections would be computed and
    # discarded every step — zero gradient signal, real FLOPs/memory).
    # The param TREE is unchanged; flax ignores entries no module asks
    # for, so checkpoints keep the full multi-head structure.
    dense_cfg = dataclasses.replace(cfg.model, with_sparse=False,
                                    with_colbert=False)
    model = BgeM3Model(dense_cfg)
    optimizer = make_optimizer(cfg)

    p_shard = param_shardings(state.params, mesh)
    state_shardings = TrainState(
        step=NamedSharding(mesh, P()),
        params=p_shard,
        opt_state=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), state.opt_state,
            is_leaf=lambda x: hasattr(x, "shape"),
        ),
    )
    batch_sharding = NamedSharding(mesh, P(AXIS_DATA))

    def loss_fn(params, batch):
        q_out = model.apply(params, batch["query_ids"],
                            batch["query_lengths"])
        p_out = model.apply(params, batch["passage_ids"],
                            batch["passage_lengths"])
        n_emb = n_valid = None
        if "negative_ids" in batch:
            n_out = model.apply(params, batch["negative_ids"],
                                batch["negative_lengths"])
            n_emb = n_out.dense.astype(jnp.float32)
            n_valid = batch["negative_valid"]
        return info_nce_loss(
            q_out.dense.astype(jnp.float32),
            p_out.dense.astype(jnp.float32),
            cfg.temperature,
            axis_name=None,  # global negatives arise from sharded jit
            n_emb=n_emb, n_valid=n_valid,
        )

    def step_fn(state: TrainState, batch):
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            {"loss": loss, "accuracy": acc},
        )

    # batch_sharding is a PREFIX pytree: every batch entry (including
    # the optional negative_* keys) is leading-axis sharded over `data`
    sharded_step = jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, state_shardings)
    return sharded_step, sharded_state
