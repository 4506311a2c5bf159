from .harness import EvalHarness, EvalConfig, load_qa_dataset  # noqa: F401
from .retrieval_eval import (  # noqa: F401
    cited_source_hit_rate,
    measure_qps,
    recall_at_k,
)
