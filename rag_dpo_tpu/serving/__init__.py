from .batcher import (  # noqa: F401
    BatcherStats,
    MicroBatcher,
    batched_dense_search,
)
from .continuous import (  # noqa: F401
    ContinuousDriver,
    ContinuousEngine,
    DeadlineExceeded,
    GenerationHandle,
)
