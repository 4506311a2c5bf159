"""Rerankers: batched cross-encoder on TPU + ColBERT MaxSim.

Cross-encoder role parity with `src/rag/reranker.py` (Jina-reranker-v2
class): scores (query, heading-prefixed passage) pairs, adds the topic-tag
semantic boost (≤ +0.15, `reranker.py:169-193`), filters below
min_score=0.08 with a keep-≥3 fallback (`reranker.py:209-213`), and falls
back to the incoming order on any error (`reranker.py:153-166`). The
reference runs pairs through torch on CPU in batches of 32 — the SURVEY
§3.1 hot loop; here all pairs are one padded device batch.

MaxSimReranker is new capability: BGE-M3 ColBERT multi-vectors scored by
the Pallas MaxSim kernel over the dense top-k (BASELINE.json config 4).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import CrossEncoderModel, EncoderConfig
from ..ops.maxsim import maxsim
from ..tokenize import HashedTokenizer, Tokenizer
from ..tokenize.base import bucket_length
from .types import RetrievedChunk


@dataclasses.dataclass
class RerankerConfig:
    max_len: int = 512           # configurable; no hard architecture cap
    min_score: float = 0.08
    min_keep: int = 3
    batch_size: int = 64


class CrossEncoderReranker:
    def __init__(
        self,
        config: RerankerConfig | None = None,
        model_config: EncoderConfig | None = None,
        params=None,
        tokenizer: Tokenizer | None = None,
        topic_matcher=None,
        rng_seed: int = 1,
    ):
        self.config = config or RerankerConfig()
        self.model_config = model_config or EncoderConfig.tiny()
        self.model = CrossEncoderModel(self.model_config)
        self.tokenizer = tokenizer or HashedTokenizer(
            vocab_size=self.model_config.vocab_size
        )
        self._params = params
        self._rng_seed = rng_seed
        self._apply_cache: dict = {}
        self.topic_matcher = topic_matcher
        self._pair_batcher = None   # see enable_pair_batching

    def load(self):
        """Lazy model load (reference `_load_model` at :74-108)."""
        if self._params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            self._params = self.model.init(jax.random.key(self._rng_seed), ids)
        return self._params

    def load_converted(self, state_dict):
        from ..models.convert import convert_cross_encoder_state_dict

        self._params = {"params": jax.tree.map(
            jnp.asarray, convert_cross_encoder_state_dict(state_dict)
        )}

    def _apply(self, b, s):
        key = (b, s)
        if key not in self._apply_cache:
            self._apply_cache[key] = jax.jit(
                lambda p, ids, lengths: self.model.apply(p, ids, lengths)
            )
        return self._apply_cache[key]

    def score_pairs(self, pairs: Sequence[tuple[str, str]]) -> np.ndarray:
        """Sigmoid relevance scores for (query, passage) pairs. With
        `enable_pair_batching`, concurrent callers' pairs coalesce into
        shared cross-encoder forwards (rows are independent under the
        per-row attention mask — scores never change)."""
        params = self.load()
        cfg = self.config
        if self._pair_batcher is not None and len(pairs):
            enc = self.tokenizer.encode_pairs(list(pairs), cfg.max_len)
            rows = np.concatenate(
                [enc.input_ids,
                 np.asarray(enc.lengths, np.int32)[:, None]],
                axis=1).astype(np.int32)
            (scores,) = self._pair_batcher(rows)
            return scores
        out = []
        for i in range(0, len(pairs), cfg.batch_size):
            batch = list(pairs[i : i + cfg.batch_size])
            enc = self.tokenizer.encode_pairs(batch, cfg.max_len)
            seq = min(bucket_length(int(enc.lengths.max())), cfg.max_len)
            ids = enc.input_ids[:, :seq]
            b = len(batch)
            b_pad = max(8, 1 << (b - 1).bit_length())
            if b_pad != b:
                ids = np.concatenate([
                    ids,
                    np.full((b_pad - b, seq), self.tokenizer.pad_id, np.int32),
                ])
                lengths = np.concatenate(
                    [enc.lengths, np.ones((b_pad - b,), np.int32)]
                )
            else:
                lengths = enc.lengths
            logits = self._apply(b_pad, seq)(
                params, jnp.asarray(ids), jnp.asarray(lengths)
            )
            out.append(np.asarray(jax.nn.sigmoid(logits))[:b])
        return np.concatenate(out) if out else np.zeros((0,), np.float32)

    def enable_pair_batching(self, max_batch: int | None = None,
                             max_wait_ms: float = 3.0) -> None:
        """Coalesce concurrent score_pairs calls into shared device
        forwards. A rerank scores ~40 (query, passage) pairs; under
        concurrent serving each query otherwise pays its own
        cross-encoder weight sweeps. Same primitive as the search/
        choose/encode micro-batchers (serving/batcher.py). Idempotent.

        `max_batch` defaults to config.batch_size (64) so coalesced
        forwards use EXACTLY the direct path's program inventory —
        raising it buys more amortization but the first oversized
        coalesce compiles a new (b_pad, seq) program mid-request."""
        if self._pair_batcher is not None:
            return
        from ..serving.batcher import MicroBatcher

        self._pair_batcher = MicroBatcher(
            self._pair_batch_fn,
            max_batch=(self.config.batch_size if max_batch is None
                       else max_batch),
            max_wait_ms=max_wait_ms)

    def _pair_batch_fn(self, stacked: np.ndarray, key):
        """MicroBatcher fn: rows are [max_len ids | true length] int32;
        the sequence bucket is recomputed from the coalesced batch's
        longest row and the batch pads to the direct path's pow2
        buckets — the default max_batch (config.batch_size) keeps the
        program inventory identical to the direct path's; per-row
        scores are identical either way."""
        params = self.load()
        cfg = self.config
        ids_full, lengths = stacked[:, :-1], stacked[:, -1]
        b = stacked.shape[0]
        seq = min(bucket_length(int(lengths.max())), cfg.max_len)
        ids = ids_full[:, :seq]
        b_pad = max(8, 1 << (b - 1).bit_length())
        if b_pad != b:
            ids = np.concatenate(
                [ids, np.full((b_pad - b, seq),
                              self.tokenizer.pad_id, np.int32)])
            lengths = np.concatenate(
                [lengths, np.ones((b_pad - b,), np.int32)])
        logits = self._apply(b_pad, seq)(
            params, jnp.asarray(ids), jnp.asarray(lengths))
        return (np.asarray(jax.nn.sigmoid(logits))[:b],)

    def rerank(
        self,
        question: str,
        chunks: Sequence[RetrievedChunk],
        top_k: int = 10,
        question_topics: Sequence[str] | None = None,
    ) -> list[RetrievedChunk]:
        if not chunks:
            return []
        cfg = self.config
        try:
            pairs = []
            for c in chunks:
                passage = f"{c.heading}\n{c.text}" if c.heading else c.text
                pairs.append((question, passage))
            scores = self.score_pairs(pairs)
            boosted = []
            for c, s in zip(chunks, scores):
                boost = 0.0
                if self.topic_matcher is not None and question_topics:
                    tags = c.metadata.get("rgpd_topics") or []
                    if isinstance(tags, str):
                        tags = [t.strip() for t in tags.split(",") if t.strip()]
                    boost = self.topic_matcher.topic_boost(
                        list(question_topics), tags
                    )
                boosted.append(float(s) + boost)
            order = np.argsort(-np.asarray(boosted), kind="stable")
            ranked = []
            for pos in order[:top_k]:
                c = chunks[pos]
                ranked.append(dataclasses.replace(
                    c, rerank_score=boosted[pos], score=boosted[pos]
                ))
            kept = [c for c in ranked if c.rerank_score >= cfg.min_score]
            if len(kept) < cfg.min_keep:  # keep-≥3 fallback
                kept = ranked[: max(cfg.min_keep, len(kept))]
            return kept
        except Exception:
            # degradation ladder: return incoming order untouched
            return list(chunks[:top_k])


def default_reranker(embedder, model_config=None,
                     rerank_batch: int = 0) -> "CrossEncoderReranker":
    """THE default production reranker: cross-encoder + topic matcher,
    like the reference (`src/rag/pipeline.py:156-160` builds
    TopicMatcher whenever an embedding provider exists;
    `src/rag/reranker.py:168-180` applies the ≤+0.15 tag boost).
    One construction site shared by create_pipeline, bootstrap, and
    the demo stack so default wiring can't drift (review finding).
    `rerank_batch` > 0 coalesces concurrent pair-scoring."""
    from ..rag.topics import TopicMatcher

    rr = CrossEncoderReranker(
        model_config=model_config,
        topic_matcher=TopicMatcher(embedder))
    if rerank_batch > 0:
        rr.enable_pair_batching(max_batch=int(rerank_batch))
    return rr


class MaxSimReranker:
    """Late-interaction rerank over stored ColBERT vectors."""

    def __init__(self, index, embedder):
        self.index = index
        self.embedder = embedder

    def rerank(self, question: str, chunks: Sequence[RetrievedChunk],
               top_k: int = 10, question_topics=None
               ) -> list[RetrievedChunk]:
        if not chunks:
            return []
        out = self.embedder.embed([question], return_colbert=True)
        qv = out["colbert"][0]  # [Lq, Dc]
        rows = [c.row for c in chunks]
        dv = self.index.colbert_vectors(rows)  # [C, LD, Dc] f16
        d_mask = np.any(dv != 0, axis=2)
        lq = qv.shape[0]
        scores = maxsim(
            jnp.asarray(qv[None], jnp.float32),
            jnp.ones((1, lq), bool),
            jnp.asarray(dv, jnp.float32),
            jnp.asarray(d_mask),
        )
        scores = np.asarray(scores)[0] / max(lq, 1)  # length-normalized
        order = np.argsort(-scores, kind="stable")[:top_k]
        return [
            dataclasses.replace(
                chunks[i], rerank_score=float(scores[i]),
                score=float(scores[i]),
            )
            for i in order
        ]
