"""Device kernels (Pallas) with pure-jnp references.

Every kernel ships with a `*_reference` jnp implementation used for parity
tests; kernels auto-select Pallas interpret mode when not running on TPU so
the whole suite runs on the CPU fake-mesh.
"""

import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def interpret_default() -> bool:
    """Pallas `interpret=` default: compiled on TPU, interpreted elsewhere."""
    return not on_tpu()


from .topk import (  # noqa: E402,F401
    approx_topk,
    blocked_topk,
    cosine_topk_reference,
    fused_candidates_topk,
    fused_topk,
)
from .fusion import rrf_fuse, rrf_fuse_reference  # noqa: E402,F401
from .flash_attention import (  # noqa: E402,F401
    attention_reference,
    flash_attention,
)
from .maxsim import maxsim, maxsim_reference  # noqa: E402,F401
from .sparse import ell_scores, ell_topk  # noqa: E402,F401
