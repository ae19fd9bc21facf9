"""Device mesh setup and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.3: no
distributed backend exists). Here SPMD is first-class: evaluation shards
*problems* and training shards the *problem batch* over a 1-axis ``dp``
mesh — the parallelism warranted by these model sizes (<1M params; TP/PP/SP
are intentionally out of scope, documented in SURVEY.md §5). Collectives are
XLA-inserted (psum for gradients) and ride ICI within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
):
    """Multi-process SPMD entry (SURVEY §2.3/§5 distributed-backend row).

    Wraps ``jax.distributed.initialize``: every participating process calls
    this before touching any JAX backend, after which ``jax.devices()``
    is the GLOBAL device list, collectives ride ICI within a slice and DCN
    across slices, and ``shard_indexes`` (parallel/sharded_eval.py) gives
    each process its disjoint problem range for sweep sharding.

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so
    launchers only export those. A no-op when neither arguments nor env
    vars request multi-process mode. Returns (process_id, process_count).
    """

    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def global_mesh(axis: str = "dp") -> Mesh:
    """1-axis mesh over ALL global devices (every process's locals)."""

    return Mesh(np.array(jax.devices()), (axis,))


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """Build a 1-axis mesh over exactly ``n_devices`` devices.

    Raises if fewer devices exist than requested — a silently-truncated mesh
    makes an 8-way sharding test "pass" on one device, proving nothing.
    """

    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devs)} JAX devices "
                f"exist ({devs[0].platform}); for host testing set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} JAX_PLATFORMS=cpu before importing jax"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (problem-batch) axis."""

    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
