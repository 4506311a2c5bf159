from .types import RetrievedChunk, RetrievedDocument  # noqa: F401
from .bm25 import Bm25Stats, build_ell_corpus, SummaryBm25Index  # noqa: F401
from .retriever import HybridRetriever, RetrieverConfig  # noqa: F401
from .reranker import CrossEncoderReranker, MaxSimReranker  # noqa: F401
from .calibrate import calibrate_fusion_weights  # noqa: F401
