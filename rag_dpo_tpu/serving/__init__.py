from .batcher import (  # noqa: F401
    BatcherStats,
    MicroBatcher,
    batched_dense_search,
)
from .continuous import ContinuousEngine  # noqa: F401
