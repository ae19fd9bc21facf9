"""Pallas TPU kernel: batched occupancy-grid lookups.

The maze oracle's hot primitive is "occupancy at grid cell of point"
(envs/maze.py::_occ_at) — a 2D gather, which TPUs execute on the slow
scalar path. This kernel reformulates the lookup as two one-hot
contractions that run on the MXU/VPU: rows = onehot(cx) @ occ picks each
point's row, then a masked lane-reduction picks the column.

The public entry (:func:`points_occupied`) pads the batch to lane multiples
and falls back to the XLA gather off-TPU. ops/pallas_maze_bench.py (test
suite) A/B-checks correctness against the gather path; enable in the maze
kernels via GMP_PALLAS_MAZE=1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 512  # points per program


def _lookup_kernel(occ_ref, cx_ref, cy_ref, out_ref):
    import jax.numpy as jnp

    occ = occ_ref[:]  # (16, 128) f32 padded grid
    cx = cx_ref[:]  # (BLOCK,) int32
    cy = cy_ref[:]

    rows16 = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 16), 1)
    onehot_rows = (rows16 == cx[:, None]).astype(jnp.float32)  # (BLOCK, 16)
    sel = jnp.dot(onehot_rows, occ, preferred_element_type=jnp.float32)  # (BLOCK, 128)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, 128), 1)
    picked = jnp.sum(jnp.where(lanes == cy[:, None], sel, 0.0), axis=1)
    out_ref[:] = picked


@functools.partial(jax.jit, static_argnames=("width",))
def _pallas_lookup(occ_padded: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray, width: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = cx.shape[0]
    grid = (n // _BLOCK,)
    return pl.pallas_call(
        _lookup_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
    )(occ_padded, cx, cy)


def pad_occ(occ: jnp.ndarray) -> jnp.ndarray:
    """(w, w) grid -> (16, 128) f32 VMEM-friendly tile."""

    occ = jnp.asarray(occ, jnp.float32)
    return jnp.zeros((16, 128), jnp.float32).at[: occ.shape[0], : occ.shape[1]].set(occ)


def points_occupied(occ_padded: jnp.ndarray, coords: jnp.ndarray, width: int = 15):
    """(n,) bool occupancy for int coords (n, 2); n padded to the block."""

    n = coords.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    cx = jnp.zeros(n_pad, jnp.int32).at[:n].set(coords[:, 0])
    cy = jnp.zeros(n_pad, jnp.int32).at[:n].set(coords[:, 1])
    vals = _pallas_lookup(occ_padded, cx, cy, width)
    return vals[:n] != 0.0


def pallas_maze_enabled() -> bool:
    return os.environ.get("GMP_PALLAS_MAZE", "0") == "1" and jax.default_backend() == "tpu"
