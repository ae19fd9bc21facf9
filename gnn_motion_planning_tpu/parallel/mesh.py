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
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (problem-batch) axis."""

    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
