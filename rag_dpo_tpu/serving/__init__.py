from .batcher import (  # noqa: F401
    BatcherStats,
    MicroBatcher,
    batched_dense_search,
)
