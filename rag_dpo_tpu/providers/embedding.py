"""TPU embedding provider: batched BGE-M3 encode with bucketed jit cache.

Role-parity with the reference's `EmbeddingProvider`
(`src/utils/embedding_provider.py:34-191`: BGE-M3 via sentence-transformers,
FP16, batch 64, 8192-token max, L2-normalized, lazy load/unload) — but
TPU-native: Flax model under jit, one compiled program per (batch, seq)
bucket, bf16 activations, and one forward yields dense + sparse + ColBERT
(the reference only gets dense). No 20k-char truncation: flash attention
makes full 8192-token encodes feasible.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import BgeM3Config, BgeM3Model
from ..tokenize import HashedTokenizer, Tokenizer, load_hf_tokenizer
from ..tokenize.base import bucket_length


@dataclasses.dataclass
class EmbedderConfig:
    model: BgeM3Config = dataclasses.field(default_factory=BgeM3Config.tiny)
    batch_size: int = 64
    max_seq_len: int = 8192
    query_max_len: int = 512
    batch_buckets: tuple = (1, 8, 64)


class Embedder:
    """Host-facing encode API over the Flax BGE-M3 model."""

    def __init__(
        self,
        config: EmbedderConfig | None = None,
        params=None,
        tokenizer: Tokenizer | None = None,
        rng_seed: int = 0,
        mesh=None,
    ):
        """`mesh`: shard encode batches over its `data` axis (corpus
        ingest data-parallelism — SURVEY.md §2.5; the reference only has
        intra-op batching on one GPU)."""
        self.config = config or EmbedderConfig()
        self.model = BgeM3Model(self.config.model)
        self.tokenizer = tokenizer or (
            load_hf_tokenizer() or HashedTokenizer(
                vocab_size=self.config.model.encoder.vocab_size
            )
        )
        self._params = params
        self._rng_seed = rng_seed
        self._apply_cache: dict = {}
        self.mesh = mesh
        self._query_batcher = None   # see enable_query_batching
        # Bound in-flight encoder dispatches: under 16-worker serving,
        # unbounded concurrent forwards each stage input buffers +
        # program workspace, and the transient sum OOM'd a near-full
        # chip (12B pool + index resident) — seen live in
        # bench_e2e_concurrent.py's agent arm. Two in flight keeps the
        # device busy (it executes one program at a time) without
        # stacking 16 workspaces. enable_query_batching coalesces
        # instead of queueing; this guards the plain path.
        self._dispatch_slots = threading.Semaphore(2)

    @property
    def dim(self) -> int:
        return self.config.model.encoder.hidden_size

    # ------------------------------------------------------------ weights
    def load(self):
        """Lazy param init (reference: lazy `load()` at :79-105). With no
        checkpoint available, params are deterministic random — consistent
        between corpus build and query encode within a process AND across
        processes (fixed seed)."""
        if self._params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            self._params = self.model.init(
                jax.random.key(self._rng_seed), ids
            )
        return self._params

    def load_converted(self, state_dict):
        from ..models.convert import convert_bge_m3_state_dict

        self._params = {
            "params": jax.tree.map(
                jnp.asarray, convert_bge_m3_state_dict(state_dict)
            )
        }

    def unload(self):
        self._params = None
        self._apply_cache.clear()

    # ------------------------------------------------------------- encode
    def _apply(self, b: int, s: int):
        key = (b, s)
        if key not in self._apply_cache:
            fn = lambda p, ids, lengths: self.model.apply(p, ids, lengths)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import AXIS_DATA

                batch_sh = NamedSharding(self.mesh, P(AXIS_DATA))
                repl = NamedSharding(self.mesh, P())
                self._apply_cache[key] = jax.jit(
                    fn,
                    in_shardings=(
                        jax.tree.map(lambda _: repl, self.load()),
                        batch_sh, batch_sh,
                    ),
                )
            else:
                self._apply_cache[key] = jax.jit(fn)
        return self._apply_cache[key]

    def _batch_bucket(self, b: int) -> int:
        bucket = next(
            (x for x in self.config.batch_buckets if b <= x), b
        )
        if self.mesh is not None:
            from ..parallel.mesh import AXIS_DATA

            d = self.mesh.shape[AXIS_DATA]
            bucket = -(-bucket // d) * d
        return bucket

    def _encode_padded(self, texts: Sequence[str], max_len: int):
        params = self.load()
        cfg = self.config
        enc = self.tokenizer.encode_batch(texts, max_len)
        seq = bucket_length(int(enc.lengths.max()) if len(texts) else 8)
        seq = min(seq, max_len)
        ids = enc.input_ids[:, :seq]
        # pad batch to bucket (mesh: round up to the data-axis size)
        b = len(texts)
        b_bucket = self._batch_bucket(b)
        if b_bucket != b:
            ids = np.concatenate(
                [ids, np.full((b_bucket - b, seq),
                              self.tokenizer.pad_id, np.int32)]
            )
            lengths = np.concatenate(
                [enc.lengths, np.ones((b_bucket - b,), np.int32)]
            )
        else:
            lengths = enc.lengths
        with self._dispatch_slots:
            out = self._apply(b_bucket, seq)(
                params, jnp.asarray(ids), jnp.asarray(lengths)
            )
            # hold the slot until the program actually finished —
            # block_until_ready is unreliable through the axon tunnel,
            # a tiny fetch is not (outputs complete together)
            np.asarray(out.dense[:1, :1])
        return out, b, enc

    def embed(self, texts: Sequence[str], *, return_sparse: bool = False,
              return_colbert: bool = False):
        """Corpus encode → dict with 'dense' [B, H] f32 (+ optional heads).

        Sparse output is aggregated per token id: list of {term_id: weight}
        (max over repeated tokens, BGE-M3 convention); colbert is a list of
        [L_i, Dc] arrays cut at true length.
        """
        cfg = self.config
        out_dense, out_sparse, out_colbert = [], [], []
        for i in range(0, len(texts), cfg.batch_size):
            batch = list(texts[i : i + cfg.batch_size])
            out, b, enc = self._encode_padded(batch, cfg.max_seq_len)
            out_dense.append(np.asarray(out.dense[:b], np.float32))
            if return_sparse and out.sparse is not None:
                sp = np.asarray(out.sparse[:b], np.float32)
                for row in range(b):
                    L = int(enc.lengths[row])
                    weights: dict[int, float] = {}
                    for t, w in zip(enc.input_ids[row, :L], sp[row, :L]):
                        t = int(t)
                        if w <= 0 or t in (
                            self.tokenizer.cls_id, self.tokenizer.sep_id,
                            self.tokenizer.pad_id,
                        ):
                            continue
                        weights[t] = max(weights.get(t, 0.0), float(w))
                    out_sparse.append(weights)
            if return_colbert and out.colbert is not None:
                cb = np.asarray(out.colbert[:b], np.float32)
                for row in range(b):
                    out_colbert.append(cb[row, : int(enc.lengths[row])])
        result = {"dense": np.concatenate(out_dense) if out_dense
                  else np.zeros((0, self.dim), np.float32)}
        if return_sparse:
            result["sparse"] = out_sparse
        if return_colbert:
            result["colbert"] = out_colbert
        return result

    def embed_query(self, text: str) -> np.ndarray:
        return self.embed_queries([text])[0]

    def embed_queries(self, texts: Sequence[str]) -> np.ndarray:
        """Query encode (shorter bucket) → [B, H] f32 L2-normalized.
        With `enable_query_batching`, concurrent callers coalesce into
        one encoder forward (rows are independent under the per-row
        attention mask, so coalescing never changes a caller's
        vectors)."""
        cfg = self.config
        texts = list(texts)
        if self._query_batcher is not None and texts:
            enc = self.tokenizer.encode_batch(texts, cfg.query_max_len)
            rows = np.concatenate(
                [enc.input_ids,
                 np.asarray(enc.lengths, np.int32)[:, None]],
                axis=1).astype(np.int32)
            (dense,) = self._query_batcher(rows)
            return dense
        out, b, _ = self._encode_padded(texts, cfg.query_max_len)
        return np.asarray(out.dense[:b], np.float32)

    def enable_query_batching(self, max_batch: int = 64,
                              max_wait_ms: float = 3.0) -> None:
        """Coalesce concurrent embed_queries calls into one device
        forward. Under concurrent serving every query encodes its
        ~4 expansion reformulations in its own small forward; each
        dispatch pays the host↔device round trip plus a full encoder
        weight sweep, so 16 workers serialize 16 sweeps where one
        batched sweep would do. Same primitive as the search/choose
        micro-batchers (serving/batcher.py). Idempotent."""
        if self._query_batcher is not None:
            return
        from ..serving.batcher import MicroBatcher

        self._query_batcher = MicroBatcher(
            self._query_batch_fn, max_batch=max_batch,
            max_wait_ms=max_wait_ms)

    def _query_batch_fn(self, stacked: np.ndarray, key):
        """MicroBatcher fn: rows are [query_max_len | true length]
        int32; the sequence bucket is recomputed from the coalesced
        batch's longest row (same program inventory as the direct
        path: length buckets × batch buckets)."""
        cfg = self.config
        params = self.load()
        ids_full, lengths = stacked[:, :-1], stacked[:, -1]
        b = stacked.shape[0]
        seq = min(bucket_length(int(lengths.max())), cfg.query_max_len)
        ids = ids_full[:, :seq]
        # _batch_bucket falls through to the raw count past the largest
        # bucket; coalesced batches arrive at ARBITRARY counts, so pow2
        # first to bound the program inventory (the hazard the search/
        # choose/rerank batchers pad for), then bucket (mesh multiple)
        b_bucket = self._batch_bucket(
            b if b <= max(cfg.batch_buckets)
            else 1 << (b - 1).bit_length())
        if b_bucket != b:
            ids = np.concatenate(
                [ids, np.full((b_bucket - b, seq),
                              self.tokenizer.pad_id, np.int32)])
            lengths = np.concatenate(
                [lengths, np.ones((b_bucket - b,), np.int32)])
        out = self._apply(b_bucket, seq)(
            params, jnp.asarray(ids), jnp.asarray(lengths))
        return (np.asarray(out.dense[:b], np.float32),)
