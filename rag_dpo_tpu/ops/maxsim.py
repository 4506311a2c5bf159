"""ColBERT-style MaxSim late interaction on the MXU.

New capability over the reference: BGE-M3 natively emits multi-vector
(ColBERT) representations but the reference only ever uses the dense head
(`src/utils/embedding_provider.py` encodes dense-only). MaxSim rerank of the
dense top-k is BASELINE.json config 4.

score(q, d) = Σ_{l ∈ q tokens} max_{m ∈ d tokens} <q_l, d_m>

Kernel trick: both the token-level similarity and the per-query-token sum
ride the MXU — the masked "sum over this query's valid tokens" is a matmul
with a 0/1 ownership matrix, so the only VPU work is the max over doc
tokens. Grid streams candidate blocks; doc padding handled by mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import interpret_default

NEG_INF = -1e30


def maxsim_reference(qv, q_mask, dv, d_mask):
    """Oracle. qv: [Q, LQ, D], q_mask: [Q, LQ], dv: [C, LD, D], d_mask: [C, LD]
    → [Q, C] f32."""
    sim = jnp.einsum(
        "qld,cmd->qlcm", qv.astype(jnp.float32), dv.astype(jnp.float32)
    )
    sim = jnp.where(d_mask[None, None, :, :], sim, NEG_INF)
    mx = jnp.max(sim, axis=-1)  # [Q, LQ, C]
    mx = jnp.maximum(mx, NEG_INF)  # fully-masked docs stay huge-negative
    mx = jnp.where(q_mask[:, :, None], mx, 0.0)
    return jnp.sum(mx, axis=1)


def _maxsim_kernel(qv_ref, owner_ref, dv_ref, dmask_ref, out_ref,
                   *, block_c: int, ld: int):
    # qv_ref: [QL, D] flattened query tokens; owner_ref: [QL, Q] 0/1;
    # dv_ref: [BC, LD, D]; dmask_ref: [BC, LD]; out: [BC, Q].
    qv = qv_ref[:].astype(jnp.float32)
    dv = dv_ref[:].astype(jnp.float32)
    bc = dv.shape[0]
    d = dv.shape[2]

    dv_flat = dv.reshape(bc * ld, d)
    sim = jax.lax.dot_general(
        dv_flat, qv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BC*LD, QL]
    ql = sim.shape[1]
    sim = sim.reshape(bc, ld, ql)
    sim = jnp.where(dmask_ref[:][:, :, None] != 0, sim, NEG_INF)
    mx = jnp.max(sim, axis=1)  # [BC, QL]
    mx = jnp.maximum(mx, NEG_INF)  # keep finite-ish for the matmul
    out_ref[:] = jax.lax.dot_general(
        mx, owner_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BC, Q]


@functools.partial(
    jax.jit, static_argnames=("block_c", "interpret")
)
def maxsim(qv, q_mask, dv, d_mask, *, block_c: int = 32,
           interpret: bool | None = None):
    """Late-interaction scores. Shapes as `maxsim_reference`; returns [Q, C].

    Documents whose mask is entirely zero score a large negative value
    (they sort last); slice them off or ignore.
    """
    if interpret is None:
        interpret = interpret_default()
    q, lq, d = qv.shape
    c, ld = d_mask.shape

    qv_flat = qv.reshape(q * lq, d)
    owner = (
        jnp.repeat(jnp.eye(q, dtype=jnp.float32), lq, axis=0)
        * q_mask.reshape(q * lq, 1)
    )  # [Q*LQ, Q]

    bc = min(block_c, c)
    c_pad = -(-c // bc) * bc
    if c_pad != c:
        dv = jnp.pad(dv, ((0, c_pad - c), (0, 0), (0, 0)))
        d_mask = jnp.pad(d_mask, ((0, c_pad - c), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_maxsim_kernel, block_c=bc, ld=ld),
        grid=(c_pad // bc,),
        in_specs=[
            pl.BlockSpec((q * lq, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q * lq, q), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ld, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ld), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_pad, q), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c_pad * ld * q * lq * d,
            bytes_accessed=c_pad * ld * d * dv.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qv_flat, owner, dv, d_mask.astype(jnp.int32))

    return out[:c].T  # [Q, C]
