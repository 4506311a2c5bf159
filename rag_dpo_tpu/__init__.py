"""rag_dpo_tpu — a TPU-native retrieval framework.

A ground-up re-design of the capabilities of MatJoss/RAG-DPO (a local French
GDPR/CNIL legal RAG assistant) as a TPU-first retrieval engine:

* the ChromaDB/HNSW + sentence-transformers + rank_bm25 stack of the reference
  collapses into one device program — encode → score → top-k → fuse → rerank —
  running on the MXU via fused Pallas kernels over a sharded device-resident
  embedding matrix;
* hybrid retrieval (dense + sparse lexical + RRF + cross-encoder/MaxSim
  rerank) keeps the reference's semantics (weights, RRF k, thresholds) as the
  correctness oracle while the implementation is jax/XLA/pallas/pjit;
* the app layers above (intent classification, query expansion, context
  building, grounding validation, the 9-node agent graph, ingest pipeline,
  eval harness) are re-implemented with the same behavior.

Package layout::

    parallel/   mesh + collectives (the NCCL-equivalent is jax.lax over ICI)
    ops/        Pallas kernels + jnp references (topk, flash-attn, maxsim,
                sparse lexical scoring, RRF fusion)
    models/     Flax encoders (BGE-M3-style dense/sparse/ColBERT, reranker)
    tokenize/   host-side tokenizers (HF adapter + offline deterministic)
    index/      sharded device index, metadata filters, checkpoints
    retrieval/  hybrid retriever, BM25 indexes, reranker
    rag/        sequential pipeline, prompts, validators
    agent/      explicit state-machine agent graph + tools
    providers/  LLM providers (HTTP endpoint + deterministic fake)
    ingest/     corpus build pipeline (host-side parsing, device encode)
    evals/      qa-replay eval harness + retrieval-only metrics
    train/      sharded contrastive training of the retriever
    utils/      config, paths, structured logging, query log, alerter
"""

__version__ = "0.1.0"
