"""Bootstrap: FrameworkConfig + on-disk artifacts → ready pipelines.

Closes the loop the reference never closed (SURVEY.md §5: config.yaml is
only partially read; most values are duplicated as code defaults): here
the typed `FrameworkConfig` actually drives construction of every
component — index, embedder, BM25, retriever recipe, reranker, LLM
provider, both orchestrators, logging and alerting.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from typing import Any

from .utils.config import FrameworkConfig, load_config
from .utils.paths import Paths, default_paths

log = logging.getLogger(__name__)


@dataclasses.dataclass
class Stack:
    config: FrameworkConfig
    paths: Paths
    index: Any
    embedder: Any
    bm25_stats: Any
    summary_index: Any
    llm: Any
    pipeline: Any          # sequential RAGPipeline
    agent: Any             # RAGAgentPipeline
    query_logger: Any
    alerter: Any

    def active(self, use_agent: bool | None = None):
        if use_agent is None:
            use_agent = self.config.agent.enable
        return self.agent if use_agent else self.pipeline


def _load_bm25_stats(index):
    """Query-side BM25 stats come from the index checkpoint (persisted by
    the indexer, `DeviceIndex.save` → bm25.json) — the vocab there is THE
    term-id space the stored ELL arrays were written in. Re-deriving it
    from metadata texts only matches for a pristine reset-built index;
    after any compact/delete/append the rebuilt ids shift (advisor
    finding, round 1), so a legacy checkpoint without stats fails loudly
    instead of silently mis-scoring the sparse arm."""
    if index.bm25_stats is not None:
        return index.bm25_stats
    raise RuntimeError(
        "index checkpoint has no persisted BM25 stats (bm25.json) — "
        "rebuild it with `python -m rag_dpo_tpu.ingest.rebuild` (any "
        "indexer build persists the stats), or disable hybrid retrieval "
        "in the config"
    )


def try_build_stack(paths: Paths | None = None, llm=None,
                    config_path=None) -> "Stack | None":
    """The app surfaces' shared selection rule (CLI, HTTP server,
    Streamlit): a saved index checkpoint routes to the config-driven
    production stack; None means 'fall back to the demo stack'."""
    paths = paths or default_paths()
    if not (paths.index_dir / "manifest.json").exists():
        return None
    return build_stack(load_config(config_path), paths, llm=llm)


def build_stack(
    config: FrameworkConfig | None = None,
    paths: Paths | None = None,
    llm=None,
    index=None,
    embedder=None,
    reranker=None,
) -> Stack:
    """Load the saved index + summaries and wire everything per config.
    Components may be injected (tests); anything not injected is built."""
    from .agent import create_agent_pipeline
    from .index import DeviceIndex
    from .providers import Embedder, EmbedderConfig
    from .providers.factory import create_llm
    from .rag import create_pipeline
    from .retrieval import SummaryBm25Index
    from .utils import Alerter, AlertConfig, QueryLogger

    config = config or load_config()
    paths = (paths or default_paths()).ensure()

    if llm is None:
        tpu_kwargs = {}
        if config.llm.mode == "tpu":
            tpu_kwargs = dict(
                checkpoint_path=config.llm.checkpoint_path,
                tokenizer_path=config.llm.tokenizer_path,
                arch=config.llm.arch,
                quantize_int8=config.llm.quantize_int8,
                quantize_kv=config.llm.quantize_kv,
                scheduler=config.llm.scheduler,
                speculative=config.llm.speculative,
                max_batch=config.llm.max_batch,
                prefix_cache=config.llm.prefix_cache,
                prefix_block=config.llm.prefix_block,
                prefix_cache_host=config.llm.prefix_cache_host,
                prefill_chunk=config.llm.prefill_chunk,
                decode_chunk=config.llm.decode_chunk,
                top_p=config.llm.top_p,
                request_timeout_s=(config.llm.request_timeout_s
                                   or None),
                age_steps=config.llm.age_steps,
                preemption=config.llm.preemption,
                choose_batch=config.llm.choose_batch,
            )
        llm = create_llm(
            config.llm.mode, base_url=config.llm.base_url,
            model=config.llm.model, **tpu_kwargs,
        )
    if index is None:
        manifest = paths.index_dir / "manifest.json"
        if not manifest.exists():
            raise FileNotFoundError(
                f"no index at {paths.index_dir} — run "
                "`python -m rag_dpo_tpu.ingest.rebuild` or "
                "`python scripts/download_index.py <artifact>`"
            )
        index = DeviceIndex.load(paths.index_dir)
    if config.retrieval.postings_candidates:
        # serving-time override of the sparse rescore pool (the stored
        # manifest keeps the build-time exhaustive default)
        index.config = dataclasses.replace(
            index.config,
            postings_candidates=int(config.retrieval.postings_candidates))
        index._searchers.clear()

    if embedder is None:
        kwargs = dict(
            batch_size=config.embedding.batch_size,
            max_seq_len=config.embedding.max_seq_len,
            query_max_len=config.embedding.query_max_len,
        )
        ckpt = config.embedding.checkpoint_path
        if ckpt:
            # converted real weights → production-size architecture
            from .models.bge_m3 import BgeM3Config
            from .models.convert import load_params_npz

            embedder = Embedder(
                EmbedderConfig(model=BgeM3Config(), **kwargs),
                params=load_params_npz(ckpt),
            )
        else:
            embedder = Embedder(EmbedderConfig(**kwargs))
    # applies to injected embedders too (enable is idempotent): the
    # config said coalesce — silently skipping it for a pre-built
    # embedder would leave concurrent encodes serializing with no
    # signal (review finding)
    if config.embedding.query_batch > 0 and \
            hasattr(embedder, "enable_query_batching"):
        embedder.enable_query_batching(
            max_batch=int(config.embedding.query_batch))

    # the query encoder MUST produce vectors in the index's space — a
    # default tiny random-weight embedder against a real 1024-dim corpus
    # would shape-error or return garbage (review finding); fail loudly
    # with the fix instead.
    if embedder.dim != index.config.dim:
        raise ValueError(
            f"embedder dim {embedder.dim} ≠ index dim "
            f"{index.config.dim}: the saved index was built with a "
            "different encoder. Set RAGDPO_EMBEDDING_CHECKPOINT_PATH "
            "(converted weights npz) or inject the matching embedder."
        )

    bm25_stats = None
    if config.retrieval.hybrid:
        bm25_stats = _load_bm25_stats(index)

    summary_index = None
    if paths.document_summaries.exists():
        summaries = json.loads(paths.document_summaries.read_text())
        summary_index = SummaryBm25Index()
        summary_index.build([
            {"doc_key": key, "title": fiche.get("title", ""),
             "summary": fiche.get("summary", ""),
             "url": fiche.get("url", "")}
            for key, fiche in summaries.items()
            if not fiche.get("navigation")
        ])

    texts = None  # chunk text lives in index metadata
    r = config.retrieval
    from .retrieval.retriever import RetrieverConfig

    retriever_config = RetrieverConfig(
        n_expansions=r.n_expansions,
        rrf_k=r.rrf_k,
        prefilter_top_docs=r.prefilter_top_docs,
        per_arm_k=r.n_candidates,
        use_sparse=r.hybrid,
        dense_exact=r.dense_exact,
    )
    # ONE cross-encoder shared by both pipelines: one param set in HBM,
    # and concurrent rerank pair-scoring can coalesce across both
    # surfaces when rerank_batch is on. Injectable like embedder/llm
    # (converted-weights boots, tests).
    if reranker is None and r.use_reranker:
        from .retrieval.reranker import default_reranker

        reranker = default_reranker(embedder,
                                    rerank_batch=r.rerank_batch)
    pipeline = create_pipeline(
        index, embedder, llm,
        bm25_stats=bm25_stats, summary_index=summary_index, texts=texts,
        retriever_config=retriever_config,
        use_reranker=r.use_reranker,
        reranker=reranker,
        intent_fast=r.intent_fast,
        expansion_parallel=r.expansion_parallel,
        n_candidates=r.n_candidates,
        rerank_top_k=r.rerank_top_k,
        max_context_chars=r.max_context_chars,
        generation_temperature=config.llm.temperature,
    )
    agent = create_agent_pipeline(
        index, embedder, llm,
        bm25_stats=bm25_stats, summary_index=summary_index, texts=texts,
        retriever_config=retriever_config,
        reranker=reranker,
        n_candidates=r.n_candidates,
        rerank_top_k=r.rerank_top_k,
        max_context_chars=r.max_context_chars,
        enable_expert_refinement=config.agent.enable_expert_refinement,
        enable_completeness=config.agent.enable_completeness,
        generation_temperature=config.llm.temperature,
        intent_fast=r.intent_fast,
        expansion_parallel=r.expansion_parallel,
    )

    o = config.observability
    query_logger = QueryLogger(paths.queries_log, paths.feedback_log,
                               rotate_mb=o.query_log_rotate_mb)
    alerter = Alerter(query_logger, paths.alerts_log, AlertConfig(
        error_rate=o.alert_error_rate,
        avg_time_s=o.alert_avg_time_s,
        satisfaction=o.alert_satisfaction,
        zero_citation_rate=o.alert_zero_citation_rate,
        smtp_enabled=o.smtp_enabled,
        smtp_host=o.smtp_host,
        smtp_to=o.smtp_to,
    ))
    return Stack(
        config=config, paths=paths, index=index, embedder=embedder,
        bm25_stats=bm25_stats, summary_index=summary_index, llm=llm,
        pipeline=pipeline, agent=agent,
        query_logger=query_logger, alerter=alerter,
    )
