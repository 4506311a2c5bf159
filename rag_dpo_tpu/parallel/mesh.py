"""Device mesh and sharding helpers — the framework's topology layer.

The reference is single-process/single-GPU with no distributed backend at all
(SURVEY.md §2.5; its only "comm layer" is HTTP to Ollama). The TPU-native
equivalent of NCCL/MPI is a `jax.sharding.Mesh` plus `jax.lax` collectives
over ICI — declared through sharding annotations, with XLA inserting the
actual all-gathers/psums. This module owns the axis-name vocabulary used
everywhere else:

* ``data``  — batch/data parallelism (corpus encode, multi-query encode)
* ``model`` — tensor parallelism inside an encoder (MLP/attention shards)
* ``shard`` — index sharding: the corpus embedding matrix is split along its
  row (chunk) axis; each device scores its shard and top-k results are merged
  with an all-gather (see parallel.collectives).

The same code runs on a CPU fake-mesh (``--xla_force_host_platform_device_count``)
and on a real TPU pod slice.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SHARD = "shard"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. Any axis may be 1 (strategy disabled)."""

    data: int = 1
    model: int = 1
    shard: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model * self.shard

    @classmethod
    def for_devices(cls, n: int, *, model: int = 1) -> "MeshSpec":
        """Default layout: give everything not used by TP to index sharding."""
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        return cls(data=1, model=model, shard=n // model)


def local_device_count() -> int:
    return jax.local_device_count()


def create_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a named mesh over the available devices.

    Axis order is (data, model, shard): `shard` is innermost so that the
    top-k merge all-gather between index shards rides the fastest (most
    contiguous) ICI links.
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec.for_devices(len(devices))
    if spec.n_devices > len(devices):
        raise ValueError(
            f"mesh {spec} needs {spec.n_devices} devices, have {len(devices)}"
        )
    devs = np.asarray(devices[: spec.n_devices]).reshape(
        spec.data, spec.model, spec.shard
    )
    return Mesh(devs, (AXIS_DATA, AXIS_MODEL, AXIS_SHARD))


def shard_leading_axis(mesh: Mesh, axis: str = AXIS_SHARD) -> NamedSharding:
    """Sharding for a [N, ...] array split along its leading axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)


# --------------------------------------------------------- multi-host DCN
def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Join this process to a multi-host deployment.

    On Cloud TPU pods all three arguments are discovered from the
    metadata server — call with no arguments. Off-pod (multi-host CPU/
    GPU, or tests) pass them explicitly. Idempotent: a second call in an
    already-initialized process is a no-op. After this, `jax.devices()`
    is GLOBAL (every chip of every host) while computation launched here
    only feeds the process-local shards (`jax.local_device_count()`).

    This is the framework's NCCL/MPI-init equivalent: the reference has
    no distributed backend at all (SURVEY §2.5); here cross-host traffic
    is XLA collectives over DCN, declared by the same shardings that
    drive single-host ICI."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        # jax wording varies across versions: 0.9 raises "distributed.
        # initialize should only be called once", older builds said
        # "already initialized"
        if "already initialized" in msg or "only be called once" in msg:
            return
        # auto mode in an already-running single-process session (XLA
        # backends up, nothing to join) is a benign no-op; with EXPLICIT
        # coordinates the same condition is a real misconfiguration —
        # the caller wanted a multi-host join that can no longer happen
        if (coordinator_address is None
                and "before any jax calls" in msg.replace("  ", " ")):
            return
        raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def create_multihost_mesh(spec: MeshSpec | None = None, *,
                          allow_split_collectives: bool = False) -> Mesh:
    """Mesh over ALL hosts' devices, host-boundary-aligned.

    Devices are ordered host-major ((slice, process, local id)), so with
    axis order (data, model, shard) the OUTERMOST `data` axis is the one
    that crosses DCN whenever spec.data is a multiple of the host count
    — index-shard top-k merges and TP collectives then ride intra-host
    ICI, and only data-parallel gradient/batch reductions cross the slow
    network (the layout the scaling playbooks prescribe).

    Works identically on a real multi-slice pod (slice_index present) and
    on the multi-process CPU harness used in tests (process grouping)."""
    devices = sorted(
        jax.devices(),
        key=lambda d: (getattr(d, "slice_index", 0) or 0,
                       d.process_index, d.id),
    )
    if spec is None:
        n_hosts = jax.process_count()
        per_host = len(devices) // n_hosts
        spec = MeshSpec(data=n_hosts, model=1, shard=per_host)
    n_hosts = jax.process_count()
    if spec.n_devices != len(devices):
        raise ValueError(
            f"mesh {spec} covers {spec.n_devices} devices but the "
            f"deployment has {len(devices)}")
    # Host alignment: devices are host-major, so a (data, model, shard)
    # reshape keeps model/shard collectives inside one host iff each
    # host's device count is a whole number of (model·shard) rows.
    per_host = len(devices) // max(n_hosts, 1)
    inner = spec.model * spec.shard
    if n_hosts > 1 and per_host % inner != 0 \
            and not allow_split_collectives:
        raise ValueError(
            f"model×shard={inner} does not divide the {per_host} devices "
            f"per host: shard/model collectives would cross DCN. Use a "
            f"data axis that is a multiple of the host count, or pass "
            f"allow_split_collectives=True to accept DCN-crossing "
            f"shard merges (corpus larger than one host's HBM)")
    devs = np.asarray(devices).reshape(spec.data, spec.model, spec.shard)
    return Mesh(devs, (AXIS_DATA, AXIS_MODEL, AXIS_SHARD))


def host_local_rows(global_shape, mesh: Mesh, local_data,
                    axis: str = AXIS_SHARD):
    """Assemble a globally row-sharded array from per-process data.

    Each process contributes `local_data` — its rows of the
    [global_shape[0], ...] array split along `axis` — and receives the
    logical global array (only local shards addressable). This is how a
    multi-host corpus loads WITHOUT any host ever materializing the full
    matrix (the 10M×1024 case: each host reads its own checkpoint
    shard)."""
    sharding = NamedSharding(mesh, P(axis))
    local_data = np.asarray(local_data)
    return jax.make_array_from_process_local_data(
        sharding, local_data, global_shape)


# ------------------------------------------------- context-parallel scope
# The encoder's ring-attention path needs a mesh, but Flax module configs
# must stay hashable — so the mesh travels through a scoped global rather
# than the config tree.
_ACTIVE_CP_MESH: list[Mesh] = []


class context_parallel:
    """`with context_parallel(mesh): model.apply(...)` — encoder layers
    with `attention_impl='ring'` shard the sequence over the mesh's
    `shard` axis and rotate KV blocks around the ICI ring."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE_CP_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_CP_MESH.pop()
        return False


def active_cp_mesh() -> Mesh | None:
    return _ACTIVE_CP_MESH[-1] if _ACTIVE_CP_MESH else None
