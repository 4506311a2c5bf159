"""Device-resident sharded vector index — the ChromaDB replacement.

The reference persists 16,919 BGE-M3 vectors in ChromaDB (hnswlib graph +
SQLite, `create_chromadb_index.py:100-130`) and queries it per-arm from
Python (`src/rag/retriever.py:215-220`). Here the index is:

* a canonical host store (numpy: f16 dense matrix, ELL sparse arrays,
  optional ColBERT token vectors, columnar metadata, string chunk ids);
* a device image: bf16 embedding matrix padded to block multiples, living
  in HBM — single-chip or row-sharded over the mesh `shard` axis — plus
  the ELL arrays for the lexical arm;
* search = fused Pallas matmul+top-k (dense), ELL kernel (sparse), with
  optional metadata filter masks applied on device before selection;
* add / update / delete(tombstone) mirror the reference's reset/append/
  update indexing modes (`create_chromadb_index.py:70-130`); checkpointing
  (the `package_cnil_db.py` analog) is plain npz + json shards.

Exact brute-force scoring means recall is 1.0 by construction (vs HNSW's
approximate recall) — see ops/topk.py for the bandwidth math.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import approx_topk, blocked_topk
from ..ops.sparse import ell_topk
from ..parallel.mesh import AXIS_SHARD
from .metadata import MetadataStore, compile_filter

NEG_INF = -1e30


def _repl(x):
    """Multihost-safe replicated operand: committed process-local jax
    arrays cannot be auto-resharded into a cross-host replication, so
    under multi-process the value travels as host numpy (every process
    contributes the identical value — SPMD contract)."""
    return np.asarray(x) if jax.process_count() > 1 else x


def _local_row_range(sharding, shape) -> tuple[int, int]:
    """[lo, hi) leading-axis rows owned by THIS process under a
    row-sharded NamedSharding. With host-major device ordering and
    P(shard) the local rows are one contiguous run; asserted, since
    `host_local_rows` requires process-local data in global order."""
    pid = jax.process_index()
    slices = sorted(
        (idx[0].start or 0,
         shape[0] if idx[0].stop is None else idx[0].stop)
        for d, idx in sharding.devices_indices_map(tuple(shape)).items()
        if d.process_index == pid
    )
    lo, hi = slices[0][0], slices[0][1]
    for s, e in slices[1:]:
        assert s <= hi, (
            f"non-contiguous local rows under {sharding}: {slices}")
        hi = max(hi, e)
    return lo, hi


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    dim: int = 1024
    ell_width: int = 32          # sparse terms stored per chunk
    colbert_dim: int = 0         # 0 = no multi-vector storage
    colbert_len: int = 0
    row_block: int = 1024        # device padding granularity
    device_dtype: Any = jnp.bfloat16
    # sparse engine: ELL equality-join is O(N) per query (fine small);
    # above this row count the impact-ordered postings engine takes over
    # (O(T·cap) per query — see ops/postings.py)
    postings_threshold: int = 100_000
    postings_cap: int = 512
    # rescore-candidate pool of the postings engine. 512 is the
    # exhaustive default; serving at batch ≥512 runs lossless at 64 on
    # the 1M benchmark corpus and keeps the sparse arm within ~7% of the
    # dense arm (BENCHMARKS.md "Hybrid tracking dense", VERDICT r2 #2)
    postings_candidates: int = 512
    # int8 dense storage: halves HBM (2× corpus per chip), int8 MXU rate;
    # recall loss ≲1% recovered by oversample+refine. Works single-device
    # and row-sharded over a mesh (`_sharded_int8`).
    quantize_int8: bool = False
    # refine int8 candidates ON DEVICE against the dequantized int8 rows
    # instead of on host against the f16 row store: one device program,
    # no candidate round-trip (≈28 ms saved per query through a tunneled
    # device), and the capacity point — 10M×1024 fits one v5e chip at
    # 9.5 GB (benchmarks/bench_10m_one_chip.py: 1,970 qps batch-32,
    # planted-neighbor self-match 1.0). Scores carry the corpus rows'
    # int8 quantization instead of the host store's f16.
    device_refine: bool = False
    # device_refine sweep blocking: 0 = auto — scan row-blocks when the
    # [Q, N] score intermediate would exceed ~1 GB f32 (it crowds out a
    # 10M-row corpus at batch ≥64); >0 forces that block size. Batch 256
    # at 10M rows measures 11.1k qps vs 2.0k at the full-sweep batch-32
    # cap (benchmarks/bench_10m_batch.py).
    sweep_block_rows: int = 0


class DeviceIndex:
    def __init__(self, config: IndexConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.ids: list[str] = []
        self._id_pos: dict[str, int] = {}
        self.meta = MetadataStore()
        self._dense = np.zeros((0, config.dim), np.float16)
        self._terms = np.full((0, config.ell_width), -1, np.int32)
        self._impacts = np.zeros((0, config.ell_width), np.float32)
        # raw term frequencies + doc lengths: impacts are derived data
        # (f(tf, dl, avgdl)) and get recomputed when stats shift on
        # incremental appends; persisted with the checkpoint.
        self._tf = np.zeros((0, config.ell_width), np.int32)
        self._dl = np.zeros((0,), np.int32)
        # query-side BM25 stats (vocab/idf/df/avgdl) — persisted with the
        # checkpoint so append/update reuse the SAME term-id space
        # (advisor finding, round 1: a fresh subset vocab silently
        # corrupts the sparse arm).
        self.bm25_stats = None
        self._colbert = (
            np.zeros((0, config.colbert_len, config.colbert_dim), np.float16)
            if config.colbert_dim
            else None
        )
        self._alive = np.zeros((0,), bool)
        self._device = None  # (embs, terms, impacts, alive, n_pad)
        self._searchers: dict = {}

    # ------------------------------------------------------------ basics
    def __len__(self) -> int:
        return int(self._alive.sum())

    @property
    def n_rows(self) -> int:
        return len(self.ids)

    def __contains__(self, chunk_id: str) -> bool:
        pos = self._id_pos.get(chunk_id)
        return pos is not None and bool(self._alive[pos])

    # ------------------------------------------------------------- write
    def add(
        self,
        chunk_ids: Sequence[str],
        dense: np.ndarray,
        metadatas: Sequence[Mapping[str, Any]] | None = None,
        terms: np.ndarray | None = None,
        impacts: np.ndarray | None = None,
        colbert: np.ndarray | None = None,
        tf: np.ndarray | None = None,
        dl: np.ndarray | None = None,
    ):
        """Append rows. Existing ids are updated in place (upsert)."""
        cfg = self.config
        dense = np.asarray(dense, np.float16)
        assert dense.shape == (len(chunk_ids), cfg.dim), dense.shape
        metadatas = metadatas or [{} for _ in chunk_ids]
        if terms is None:
            terms = np.full((len(chunk_ids), cfg.ell_width), -1, np.int32)
        terms = np.asarray(terms, np.int32)
        if impacts is None:  # terms without impacts: zero contribution
            impacts = np.zeros(terms.shape, np.float32)
        impacts = np.asarray(impacts, np.float32)
        tf = (np.zeros(terms.shape, np.int32) if tf is None
              else np.asarray(tf, np.int32))
        dl = (np.zeros((len(chunk_ids),), np.int32) if dl is None
              else np.asarray(dl, np.int32))

        fresh_rows, fresh_meta = [], []
        batch_pos: dict[str, int] = {}  # id → row WITHIN this batch
        for row, cid in enumerate(chunk_ids):
            pos = self._id_pos.get(cid)
            if pos is None and cid in batch_pos:
                # duplicate id inside ONE batch: later occurrence wins —
                # without this, both rows append live and the first
                # becomes an undeletable orphan (review finding)
                dup_idx = fresh_rows.index(batch_pos[cid])
                fresh_rows[dup_idx] = row
                fresh_meta[dup_idx] = metadatas[row]
                batch_pos[cid] = row
                continue
            if pos is not None:  # in-place update
                self._dense[pos] = dense[row]
                self._terms[pos] = terms[row]
                self._impacts[pos] = impacts[row]
                self._tf[pos] = tf[row]
                self._dl[pos] = dl[row]
                if self._colbert is not None:
                    # no colbert supplied → zero out, never keep stale
                    # token vectors from the previous version of the row
                    self._colbert[pos] = (
                        colbert[row] if colbert is not None else 0
                    )
                self._alive[pos] = True
                self.meta.update(pos, metadatas[row])
            else:
                batch_pos[cid] = row
                fresh_rows.append(row)
                fresh_meta.append(metadatas[row])

        if fresh_rows:
            sel = np.asarray(fresh_rows)
            base = len(self.ids)
            for row in fresh_rows:
                self._id_pos[chunk_ids[row]] = base
                self.ids.append(chunk_ids[row])
                base += 1
            self._dense = np.concatenate([self._dense, dense[sel]])
            self._terms = np.concatenate([self._terms, terms[sel]])
            self._impacts = np.concatenate([self._impacts, impacts[sel]])
            self._tf = np.concatenate([self._tf, tf[sel]])
            self._dl = np.concatenate([self._dl, dl[sel]])
            if self._colbert is not None:
                cb = (
                    np.asarray(colbert, np.float16)[sel]
                    if colbert is not None
                    else np.zeros(
                        (len(sel), cfg.colbert_len, cfg.colbert_dim),
                        np.float16,
                    )
                )
                self._colbert = np.concatenate([self._colbert, cb])
            self._alive = np.concatenate(
                [self._alive, np.ones((len(sel),), bool)]
            )
            self.meta.append(fresh_meta)
        self._device = None  # invalidate device image
        self._searchers.clear()

    def delete(self, chunk_ids: Sequence[str]):
        """Tombstone rows (device mask; storage reclaimed on compact())."""
        for cid in chunk_ids:
            pos = self._id_pos.get(cid)
            if pos is not None:
                self._alive[pos] = False
        self._device = None

    def recompute_impacts(self, stats):
        """Re-derive every row's BM25 impacts from stored (tf, dl) under
        new stats (avgdl/k1/b) — exact full-corpus semantics after an
        incremental append shifts avgdl. Adopts `stats` as the index's
        query-side stats."""
        from ..retrieval.bm25 import impacts_from_tf

        if self.n_rows:
            self._impacts = impacts_from_tf(self._tf, self._dl, stats)
        self.bm25_stats = stats
        self._device = None
        self._searchers.clear()

    def compact(self):
        keep = np.nonzero(self._alive)[0]
        self._dense = self._dense[keep]
        self._terms = self._terms[keep]
        self._impacts = self._impacts[keep]
        self._tf = self._tf[keep]
        self._dl = self._dl[keep]
        if self._colbert is not None:
            self._colbert = self._colbert[keep]
        kept_ids = [self.ids[i] for i in keep]
        kept_docs = [self.meta._docs[i] for i in keep]
        self.ids = kept_ids
        self._id_pos = {cid: i for i, cid in enumerate(kept_ids)}
        meta = MetadataStore()
        meta.append(kept_docs)
        self.meta = meta
        self._alive = np.ones((len(keep),), bool)
        self._device = None
        self._searchers.clear()

    # ------------------------------------------------------------ device
    def _put_rows(self, x):
        """Upload an array sharded along its LEADING axis over the mesh
        `shard` axis (corpus rows, penalty vectors, stacked per-shard
        posting tables). Single-host: a plain sharded device_put. In a
        multi-host deployment (jax.process_count() > 1) each process
        uploads ONLY the slice its own devices hold, assembled through
        `host_local_rows` — no host ever ships another host's rows, and
        the resulting global array feeds the exact same shard_map search
        programs over DCN (tests/test_multihost.py runs this for every
        engine against a single-device oracle)."""
        arr = np.asarray(x)
        if self.mesh is None:
            return jax.device_put(jnp.asarray(arr))
        from ..parallel.mesh import host_local_rows, shard_leading_axis

        sh = shard_leading_axis(self.mesh)
        if jax.process_count() > 1:
            lo, hi = _local_row_range(sh, arr.shape)
            return host_local_rows(arr.shape, self.mesh, arr[lo:hi])
        return jax.device_put(jnp.asarray(arr), sh)

    def _n_pad(self) -> int:
        blk = self.config.row_block
        if self.mesh is not None:
            blk *= self.mesh.shape[AXIS_SHARD]
        return max(blk, -(-self.n_rows // blk) * blk)

    def device_image(self):
        if self._device is not None:
            return self._device
        cfg = self.config
        n, n_pad = self.n_rows, self._n_pad()
        embs = np.zeros((n_pad, cfg.dim), np.float32)
        embs[:n] = self._dense.astype(np.float32)
        terms = np.full((n_pad, cfg.ell_width), -1, np.int32)
        terms[:n] = self._terms
        impacts = np.zeros((n_pad, cfg.ell_width), np.float32)
        impacts[:n] = self._impacts
        alive = np.zeros((n_pad,), np.float32)
        alive[:n] = self._alive.astype(np.float32)
        alive_penalty = (alive - 1.0) * 1e4  # 0 for live, -1e4 otherwise

        put = self._put_rows
        embs_d = put(embs)
        if cfg.quantize_int8:
            from ..ops.quantize import quantize_rows

            if self.mesh is not None:
                # per-row quantization is embarrassingly row-parallel:
                # keep outputs sharded along the same row axis
                from jax.sharding import NamedSharding, PartitionSpec

                embs_i8, embs_scale = jax.jit(
                    quantize_rows,
                    out_shardings=(
                        NamedSharding(self.mesh,
                                      PartitionSpec(AXIS_SHARD)),
                        NamedSharding(self.mesh,
                                      PartitionSpec(AXIS_SHARD)),
                    ),
                )(embs_d)
            else:
                embs_i8, embs_scale = jax.jit(quantize_rows)(embs_d)
            embs_d = None
        else:
            embs_i8, embs_scale = None, None
            embs_d = jax.jit(
                lambda x: x.astype(cfg.device_dtype),
                out_shardings=embs_d.sharding
                if self.mesh is not None else None,
            )(embs_d)
        self._device = {
            "embs": embs_d,
            "embs_i8": embs_i8,
            "embs_scale": embs_scale,
            "terms": put(terms),
            "impacts": put(impacts),
            "alive": put(alive),
            "alive_penalty": put(alive_penalty),
            "row_ids": put(np.arange(n_pad, dtype=np.int32)),
            "n_pad": n_pad,
        }
        return self._device

    # ------------------------------------------------------------ search
    def _mask_vector(self, where) -> np.ndarray | None:
        mask = compile_filter(self.meta, where)
        alive = self._alive
        if mask is None:
            if alive.all():
                return None
            mask = alive.copy()
        else:
            mask = mask & alive
        return mask

    def _combined_penalty(self, mask, dev):
        """[n_pad] additive score penalty: 0 for selectable rows, −1e4 for
        padding, tombstones, and filtered-out rows. One vector serves every
        engine (dense bf16/int8, ELL, postings) — cosine scores live in
        [−1, 1] and BM25 in [0, ~30], so −1e4 excludes deterministically.
        Sharded along the row axis when a mesh is attached (round-1 advisor
        fix: the sharded path previously applied NO alive/padding penalty,
        letting zero-padded rows outrank valid negative-cosine hits)."""
        if mask is None:
            return dev["alive_penalty"]
        m = np.full((dev["n_pad"],), -1e4, np.float32)
        m[: len(mask)] = np.where(mask, 0.0, -1e4)
        if self.mesh is not None:
            return self._put_rows(m)
        return jnp.asarray(m)

    def _finish(self, s, i, k):
        """Post-merge cleanup shared by all penalty-folded engines: any
        slot whose score carries the −1e4 penalty (or points past the live
        corpus) becomes (-inf, -1)."""
        s, i = np.asarray(s), np.asarray(i)
        i = np.where((i >= 0) & (i < self.n_rows) & (s > -5e3), i, -1)
        s = np.where(i >= 0, s, NEG_INF).astype(np.float32)
        return s, i

    def search_dense(self, queries: np.ndarray, k: int, where=None,
                     exact: bool = False):
        """queries [Q, D] (L2-normalized) → (scores [Q,k], ids [Q,k] int
        rows; -1 = empty). Filter `where` is a ChromaDB-style tree.

        Default path is approx_topk (recall ≈ 0.99, fastest measured);
        `exact=True` switches to exact per-shard selection (recall 1.0)
        on every bf16 path — single-device, masked, and mesh-sharded.
        Int8 storage cannot honor `exact` on device (the full-precision
        image isn't resident); its host refine still returns exact
        SCORES for the approximately-selected candidates.
        With a mesh attached, the corpus is row-sharded and per-shard
        top-k results merge through one all-gather (dense, int8, masked
        and unmasked all ride the same penalty-folded program)."""
        dev = self.device_image()
        mask = self._mask_vector(where)
        if self.mesh is not None:
            qf = jnp.asarray(np.asarray(queries, np.float32))
            if dev["embs_i8"] is not None:
                return self._sharded_int8(qf, k, mask, dev)
            return self._sharded_dense(
                qf.astype(self.config.device_dtype), k, mask, dev,
                exact=exact)
        if dev["embs_i8"] is not None:
            return self._int8_dense(queries, k, mask, dev)
        q = jnp.asarray(np.asarray(queries, np.float32)).astype(
            self.config.device_dtype
        )
        if mask is not None:
            if exact:
                pen = self._combined_penalty(mask, dev)
                s, i = blocked_topk(q, dev["embs"], k, penalty=pen)
                return self._finish(s, i, k)
            return self._masked_dense(q, k, mask)
        if exact:
            s, i = blocked_topk(q, dev["embs"], k,
                                penalty=dev["alive_penalty"])
            s, i = np.asarray(s), np.asarray(i)
            ok = (i >= 0) & (i < self.n_rows) & (s > -5e3)
            i = np.where(ok, i, -1)
            s = np.where(ok, s, NEG_INF).astype(np.float32)
            return s, i
        s, i = approx_topk(q, dev["embs"], k,
                           penalty=dev["alive_penalty"])
        s, i = np.asarray(s), np.asarray(i)
        i = np.where((i >= 0) & (i < self.n_rows), i, -1)
        return self._strip_dead(s, i, k)

    # --------------------------------------------------- sharded engines
    def _sharded_dense(self, q, k: int, mask, dev, exact: bool = False):
        from ..parallel.collectives import sharded_topk_multi

        key = ("sharded_dense", k, exact)
        if key not in self._searchers:
            def local_fn(qs, shard_embs, pen):
                s = jnp.dot(qs, shard_embs.T,
                            preferred_element_type=jnp.float32)
                s = s + pen[None, :]
                if exact:  # full per-shard sort: recall 1.0
                    return jax.lax.top_k(s, min(k, s.shape[1]))
                kk = min(4 * k, s.shape[1])
                return jax.lax.approx_max_k(s, kk)

            self._searchers[key] = sharded_topk_multi(
                self.mesh, local_fn, k, n_sharded=2)
        pen = self._combined_penalty(mask, dev)
        s, i = self._searchers[key](_repl(q), dev["row_ids"],
                                    dev["embs"], pen)
        return self._finish(s, i, k)

    def _sharded_int8(self, qf, k: int, mask, dev):
        """Sharded int8 sweep over-fetches 4k candidates through the
        merge, then refines them exactly — on host against the f16 row
        store by default, or ON DEVICE against the dequantized sharded
        int8 rows when `device_refine` is set (no candidate round-trip;
        no full-precision store needed)."""
        from ..ops.quantize import (
            dequant_refine,
            int8_blockscan_candidates,
            quantize_rows,
        )
        from ..parallel.collectives import sharded_topk_multi

        q_i8, q_scale = jax.jit(quantize_rows)(qf)
        k_fetch = min(4 * k, dev["n_pad"])
        q_n = int(qf.shape[0])
        # 2 GB of live f32 per shard: the 10M tuning sweep measured the
        # 2M-row slab 17% faster than 1M at batch 256 (fewer carry
        # merges; benchmarks/bench_10m_tuning.py, VERDICT r2 item 8)
        score_budget = 512 * 1024 * 1024
        blk = self.config.sweep_block_rows or max(
            self.config.row_block, score_budget // max(q_n, 1))
        key = ("sharded_int8", k_fetch, q_n)
        if key not in self._searchers:
            def local_fn(q_pack, e_i8, e_scale, pen):
                qi, qsc = q_pack
                kk = min(k_fetch, e_i8.shape[0])
                if blk < e_i8.shape[0]:
                    # per-shard block-scan: the [Q, n_local] score
                    # intermediate never materializes (same batch-cap
                    # removal as the single-chip path)
                    return int8_blockscan_candidates(
                        qi, qsc, e_i8, e_scale, kk, blk, penalty=pen)
                raw = jax.lax.dot_general(
                    qi, e_i8,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = (raw.astype(jnp.float32) * qsc[:, None]
                     * e_scale[None, :] + pen[None, :])
                return jax.lax.approx_max_k(s, min(k_fetch, s.shape[1]))

            self._searchers[key] = sharded_topk_multi(
                self.mesh, local_fn, k_fetch, n_sharded=3)
        pen = self._combined_penalty(mask, dev)
        s, i = self._searchers[key](
            (_repl(q_i8), _repl(q_scale)), dev["row_ids"],
            dev["embs_i8"], dev["embs_scale"], pen,
        )
        if self.config.device_refine:
            s, i = dequant_refine(qf, dev["embs_i8"],
                                  dev["embs_scale"], s, i, k)
            return self._finish(s, i, k)
        s, i = np.asarray(s), np.asarray(i)
        ok = (i >= 0) & (i < self.n_rows) & (s > -5e3)
        return self._host_refine(np.asarray(qf, np.float32), s, i, ok, k)

    def _sharded_postings(self, dev):
        """Per-shard impact-ordered posting tables, stacked [S, V, cap]
        and row-sharded so each device inverts only its own corpus rows
        (local doc ids; the merge translates them to global)."""
        if "postings_sharded" in dev:
            return dev["postings_sharded"]
        from ..ops.postings import PostingsIndex

        n_shards = self.mesh.shape[AXIS_SHARD]
        n_pad = dev["n_pad"]
        nloc = n_pad // n_shards
        vocab = int(self._terms.max()) + 1 if self.n_rows else 1
        cap = min(self.config.postings_cap, max(64, -(-nloc // 64) * 64))
        w = self.config.ell_width
        terms_h = np.full((n_pad, w), -1, np.int32)
        terms_h[: self.n_rows] = self._terms
        imps_h = np.zeros((n_pad, w), np.float32)
        imps_h[: self.n_rows] = self._impacts
        docs_s, imps_s = [], []
        for s in range(n_shards):
            pidx = PostingsIndex.build(
                terms_h[s * nloc:(s + 1) * nloc],
                imps_h[s * nloc:(s + 1) * nloc],
                vocab_size=max(vocab, 1), cap=cap,
            )
            docs_s.append(pidx.post_docs)
            imps_s.append(pidx.post_impacts)
        dev["postings_sharded"] = (
            self._put_rows(np.stack(docs_s)),
            self._put_rows(np.stack(imps_s)),
        )
        return dev["postings_sharded"]

    def _sharded_sparse(self, q_terms, q_weights, k: int, mask, dev):
        """Row-sharded lexical top-k: each shard scores its ELL slice
        (equality-join small, impact-ordered postings at scale), penalty
        folds filters/tombstones, all-gather merges. Mirrors the single-
        device engine choice in `search_sparse`."""
        from ..parallel.collectives import sharded_topk_multi

        n_shards = self.mesh.shape[AXIS_SHARD]
        nloc = dev["n_pad"] // n_shards
        heavy = q_terms.shape[0] * q_terms.shape[1] > 128
        use_postings = nloc > self.config.postings_threshold or heavy
        pen = self._combined_penalty(mask, dev)
        qt = _repl(jnp.asarray(np.asarray(q_terms), jnp.int32))
        qw = _repl(jnp.asarray(np.asarray(q_weights), jnp.float32))

        if use_postings:
            post_docs, post_imps = self._sharded_postings(dev)
            n_cand = self.config.postings_candidates
            key = ("sharded_sparse_post", k, n_cand)
            if key not in self._searchers:
                from ..ops.postings import postings_candidates_topk

                def local_fn(q_pack, pd, pi, terms, impacts, pen_l):
                    qt_, qw_ = q_pack
                    s, ids = postings_candidates_topk(
                        pd[0], pi[0], terms, impacts, qt_, qw_,
                        k=min(k, terms.shape[0]),
                        n_candidates=n_cand,
                        penalty=pen_l,
                    )
                    return s, jnp.where(ids >= 0, ids, 0)

                self._searchers[key] = sharded_topk_multi(
                    self.mesh, local_fn, k, n_sharded=5)
            s, i = self._searchers[key](
                (qt, qw), dev["row_ids"], post_docs, post_imps,
                dev["terms"], dev["impacts"], pen,
            )
            return self._finish(s, i, k)

        key = ("sharded_sparse_ell", k)
        if key not in self._searchers:
            from ..ops.sparse import ell_scores

            def local_fn(q_pack, terms, impacts, pen_l):
                qt_, qw_ = q_pack
                s = ell_scores(terms, impacts, qt_, qw_) + pen_l[None, :]
                kk = min(k, s.shape[1])
                return jax.lax.top_k(s, kk)

            self._searchers[key] = sharded_topk_multi(
                self.mesh, local_fn, k, n_sharded=3)
        s, i = self._searchers[key](
            (qt, qw), dev["row_ids"], dev["terms"], dev["impacts"], pen,
        )
        return self._finish(s, i, k)

    def _int8_dense(self, queries, k: int, mask, dev):
        """Quantized dense search; filters fold into the score penalty.
        The device does the int8 sweep with 4× oversampling; survivors
        are exactly re-scored — on host against the f16 row store by
        default (full precision), or in the same device program against
        the dequantized int8 rows when `device_refine` is set (see
        IndexConfig.device_refine)."""
        from ..ops.quantize import (
            approx_topk_int8,
            approx_topk_int8_blockscan,
            approx_topk_int8_selfrefined,
            quantize_rows,
        )

        qf32 = np.asarray(queries, np.float32)
        qf = jnp.asarray(qf32)
        penalty = dev["alive_penalty"]
        if mask is not None:
            m = np.full((dev["n_pad"],), -1e4, np.float32)
            m[: len(mask)] = np.where(mask, 0.0, -1e4)
            penalty = jnp.asarray(m)
        if self.config.device_refine:
            # sweep + dequant refine in ONE device program (no candidate
            # round-trip; corpus may exceed what a host f16 refine store
            # could mirror — see IndexConfig.device_refine)
            q_n, n_pad = qf.shape[0], dev["n_pad"]
            # 2 GB live f32: measured optimum at 10M rows (2M-row slab
            # beats 1M by 17% at b256 — bench_10m_tuning.py)
            score_budget = 512 * 1024 * 1024
            if self.config.sweep_block_rows:
                blk = self.config.sweep_block_rows
            elif q_n * n_pad > score_budget:
                blk = max(self.config.row_block, score_budget // q_n)
            else:
                blk = 0
            if blk and blk < n_pad:
                s, i = approx_topk_int8_blockscan(
                    qf, dev["embs_i8"], dev["embs_scale"], k,
                    oversample=4, block_rows=blk, penalty=penalty,
                )
            else:
                s, i = approx_topk_int8_selfrefined(
                    qf, dev["embs_i8"], dev["embs_scale"], k,
                    oversample=4, penalty=penalty,
                )
            return self._finish(s, i, k)
        q_i8, q_scale = quantize_rows(qf)
        kk = min(4 * k, dev["n_pad"])
        s, i = approx_topk_int8(
            q_i8, q_scale, dev["embs_i8"], dev["embs_scale"], kk,
            oversample=1, penalty=penalty,
        )
        s, i = np.asarray(s), np.asarray(i)
        ok = (i >= 0) & (i < self.n_rows) & (s > -5e3)
        return self._host_refine(qf32, s, i, ok, k)

    def _host_refine(self, qf32, s, i, ok, k: int):
        """Exact f32 re-score of device-selected candidates against the
        host f16 rows; invalid slots stay excluded."""
        safe = np.where(ok, i, 0)
        rows = self._dense[safe].astype(np.float32)      # [Q, C, D]
        exact = np.einsum("qd,qcd->qc", qf32, rows)
        exact = np.where(ok, exact, NEG_INF)
        order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
        top = np.take_along_axis(exact, order, axis=1)
        ids = np.take_along_axis(np.where(ok, i, -1), order, axis=1)
        ids = np.where(top > NEG_INF / 2, ids, -1)
        if ids.shape[1] < k:
            pad = k - ids.shape[1]
            top = np.pad(top, ((0, 0), (0, pad)), constant_values=NEG_INF)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return top.astype(np.float32), ids

    def _masked_dense(self, q, k: int, mask: np.ndarray):
        """Filtered dense search: mask folds into a score penalty and the
        approx+refine selector runs unchanged (cosine scores are in
        [-1, 1], so a −1e4 penalty excludes deterministically — and
        avoids `lax.top_k`'s full device sort, which takes seconds at
        1M rows)."""
        dev = self.device_image()
        m = np.full((dev["n_pad"],), -1e4, np.float32)
        m[: len(mask)] = np.where(mask, 0.0, -1e4)
        penalty = jnp.asarray(m)
        s, i = approx_topk(q, dev["embs"], k, penalty=penalty)
        s, i = np.asarray(s), np.asarray(i)
        i = np.where((i >= 0) & (i < self.n_rows) & (s > -5e3), i, -1)
        s = np.where(i >= 0, s, NEG_INF)
        return s, i

    def _postings_index(self):
        if self._device is not None and "postings" in self._device:
            return self._device["postings"]
        from ..ops.postings import PostingsIndex

        vocab = int(self._terms.max()) + 1 if self.n_rows else 1
        cap = min(self.config.postings_cap,
                  max(64, -(-self.n_rows // 64) * 64))
        pidx = PostingsIndex.build(
            self._terms, self._impacts, vocab_size=max(vocab, 1),
            cap=cap,
        )
        dev = self.device_image()
        dev["postings"] = (pidx, pidx.device_arrays())
        return dev["postings"]

    def search_sparse(self, q_terms: np.ndarray, q_weights: np.ndarray,
                      k: int, where=None):
        """Lexical top-k (BM25 / learned sparse). q padding id: -2.

        Engine choice: the ELL equality-join kernel unrolls Q·T in VMEM —
        fine for modest query shapes, OOM at ~100k-chunk blocks with
        Q·T ≳ 128 (measured). Large corpora OR heavy query batches route
        to the postings engine."""
        dev = self.device_image()
        mask = self._mask_vector(where)
        if self.mesh is not None:
            return self._sharded_sparse(q_terms, q_weights, k, mask, dev)
        heavy_query = q_terms.shape[0] * q_terms.shape[1] > 128
        if mask is None and (
            self.n_rows > self.config.postings_threshold or heavy_query
        ):
            from ..ops.postings import postings_candidates_topk

            pidx, arrays = self._postings_index()
            s, i = postings_candidates_topk(
                *arrays, dev["terms"], dev["impacts"],
                jnp.asarray(q_terms), jnp.asarray(q_weights), k=k,
                n_candidates=self.config.postings_candidates,
            )
            s, i = np.asarray(s), np.asarray(i)
            i = np.where((i >= 0) & (i < self.n_rows), i, -1)
            return self._strip_dead(s, i, k)
        if mask is None:
            s, i = ell_topk(
                dev["terms"], dev["impacts"],
                jnp.asarray(q_terms), jnp.asarray(q_weights), k=k,
            )
            s, i = np.asarray(s), np.asarray(i)
            i = np.where((i >= 0) & (i < self.n_rows), i, -1)
            return self._strip_dead(s, i, k)
        if self.n_rows > self.config.postings_threshold or heavy_query:
            # masked at scale: overfetch unfiltered from the postings
            # engine, then host-filter (the O(N·L·T) full scorer below is
            # only viable on small corpora)
            from ..ops.postings import postings_candidates_topk

            pidx, arrays = self._postings_index()
            overfetch = min(max(4 * k, 64), 256)
            s, i = postings_candidates_topk(
                *arrays, dev["terms"], dev["impacts"],
                jnp.asarray(q_terms), jnp.asarray(q_weights),
                k=overfetch,
                n_candidates=self.config.postings_candidates,
            )
            s, i = np.asarray(s), np.asarray(i)
            ok = (i >= 0) & (i < self.n_rows)
            ok &= np.where(ok, mask[np.clip(i, 0, self.n_rows - 1)],
                           False)
            s = np.where(ok, s, NEG_INF)
            i = np.where(ok, i, -1)
            order = np.argsort(-s, axis=1, kind="stable")[:, :k]
            return (np.take_along_axis(s, order, axis=1),
                    np.take_along_axis(i, order, axis=1))
        # masked, small corpus: exact full scores then mask+topk
        from ..ops.sparse import ell_scores

        s = ell_scores(
            dev["terms"], dev["impacts"],
            jnp.asarray(q_terms), jnp.asarray(q_weights),
        )
        s = np.asarray(s)[:, : self.n_rows]
        s = np.where(mask[None, :], s, NEG_INF)
        idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
        top = np.take_along_axis(s, idx, axis=1)
        idx = np.where(top > NEG_INF / 2, idx, -1).astype(np.int32)
        if idx.shape[1] < k:  # corpus smaller than k: fixed width
            pad = k - idx.shape[1]
            top = np.pad(top, ((0, 0), (0, pad)), constant_values=NEG_INF)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        return top.astype(np.float32), idx

    def _strip_dead(self, s, i, k):
        """Drop tombstoned rows from (already unfiltered) results."""
        if self._alive.all():
            return s, i
        dead = ~self._alive
        bad = (i >= 0) & dead[np.clip(i, 0, self.n_rows - 1)]
        s = np.where(bad, NEG_INF, s)
        i = np.where(bad, -1, i)
        order = np.argsort(-s, axis=1, kind="stable")
        return np.take_along_axis(s, order, axis=1), np.take_along_axis(
            i, order, axis=1
        )

    def warm(self, batch_sizes: Sequence[int] = (1, 64, 256),
             k: int = 10, sparse_terms: int = 16):
        """Pre-compile the search programs for the given query batch
        shapes. A production server otherwise pays the XLA compile on
        the first live request of each shape (multi-second on a TPU
        host, minutes through a tunneled remote compile —
        benchmarks/bench_http_serving.py measures it). Pairs with the
        serving batcher's power-of-two padding: warming the powers of
        two up to max_batch covers every program the server can hit.
        Results are discarded; zero-vector queries exercise the real
        engines (dense bf16/int8, masked excluded — filters change the
        penalty vector, not the program)."""
        if not self.n_rows:
            return
        d = self.config.dim
        for b in batch_sizes:
            q = np.zeros((int(b), d), np.float32)
            q[:, 0] = 1.0
            self.search_dense(q, k)
            if sparse_terms:
                qt = np.full((int(b), sparse_terms), -2, np.int32)
                qt[:, 0] = 0
                qw = np.ones((int(b), sparse_terms), np.float32)
                self.search_sparse(qt, qw, k)

    def colbert_vectors(self, rows: Sequence[int]):
        assert self._colbert is not None, "index built without colbert"
        return self._colbert[np.asarray(rows)]

    def dense_vectors(self, rows: Sequence[int]) -> np.ndarray:
        return self._dense[np.asarray(rows)].astype(np.float32)

    def chunk_ids(self, rows) -> list[str | None]:
        return [self.ids[r] if r >= 0 else None for r in np.asarray(rows)]

    # -------------------------------------------------------- checkpoint
    def save(self, directory):
        d = pathlib.Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        np.savez(
            d / "arrays.npz",
            dense=self._dense,
            terms=self._terms,
            impacts=self._impacts,
            tf=self._tf,
            dl=self._dl,
            alive=self._alive,
            **({"colbert": self._colbert} if self._colbert is not None else {}),
        )
        manifest = {
            "config": {
                f.name: getattr(self.config, f.name)
                for f in dataclasses.fields(self.config)
                if f.name != "device_dtype"  # jnp dtype, not JSON
            },
            "ids": self.ids,
            "n_rows": self.n_rows,
        }
        (d / "manifest.json").write_text(json.dumps(manifest))
        self.meta.save(d / "metadata.json")
        if self.bm25_stats is not None:
            (d / "bm25.json").write_text(
                json.dumps(self.bm25_stats.to_dict())
            )

    @classmethod
    def load(cls, directory, mesh=None) -> "DeviceIndex":
        d = pathlib.Path(directory)
        manifest = json.loads((d / "manifest.json").read_text())
        cfg = IndexConfig(**manifest["config"])
        idx = cls(cfg, mesh=mesh)
        arrays = np.load(d / "arrays.npz")
        idx._dense = arrays["dense"]
        idx._terms = arrays["terms"]
        idx._impacts = arrays["impacts"]
        idx._alive = arrays["alive"]
        n = idx._terms.shape[0]
        idx._tf = (arrays["tf"] if "tf" in arrays
                   else np.zeros_like(idx._terms))
        idx._dl = (arrays["dl"] if "dl" in arrays
                   else np.zeros((n,), np.int32))
        if "colbert" in arrays:
            idx._colbert = arrays["colbert"]
        idx.ids = list(manifest["ids"])
        idx._id_pos = {cid: i for i, cid in enumerate(idx.ids)}
        idx.meta = MetadataStore.load(d / "metadata.json")
        bm25_path = d / "bm25.json"
        if bm25_path.exists():
            from ..retrieval.bm25 import Bm25Stats

            idx.bm25_stats = Bm25Stats.from_dict(
                json.loads(bm25_path.read_text())
            )
        return idx
