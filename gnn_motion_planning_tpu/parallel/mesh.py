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
