"""2D point / 3D stick maze environments, TPU-native.

The reference implements the maze collision oracle as recursive Python over a
15x15 occupancy grid (reference: environment/maze_env.py:236-347). Here the
oracle exists twice with identical semantics *including the collision-check
counter* (the paper's headline metric — counts increment exactly where
reference maze_env.py:276 does):

* :class:`MazeEnv` — a host (numpy) wrapper with the reference env protocol,
  used for sampling (bit-identical MT19937 stream), baselines and tests;
* jittable device kernels (:func:`point_free_2d`, :func:`edge_free_2d`,
  :func:`stick_free_3d`, :func:`edge_free_3d`) — pure functions over the
  occupancy grid that run *inside* compiled planner loops.

The reference's recursive segment bisection (maze_env.py:301-314) has
data-dependent recursion with short-circuit evaluation. On device we unroll
it over the **static complete bisection tree in DFS preorder**: which nodes
*would* be visited is purely geometric (grid-coordinate spread > 1 and L1
length > RRT_EPS), and the short-circuit "stop at first colliding midpoint"
is the first preorder index among visited-and-colliding nodes. This
reproduces both the free/collide decision and the exact check count with
static shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.env_config import LIMITS, RRT_EPS, STICK_LENGTH
from gnn_motion_planning_tpu.utils.timer import Timer, timed

_BIG = np.int32(1 << 30)


# ---------------------------------------------------------------------------
# Static bisection-tree tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _preorder_tree(depth: int):
    """Complete bisection tree in DFS preorder.

    Returns (t0, t1, parent) arrays of length 2**depth - 1, where node i
    covers the segment fraction [t0[i], t1[i]] and parent[i] is the preorder
    index of its parent (-1 for the root). Children are emitted left-first so
    preorder rank equals the reference's recursive visit order
    (maze_env.py:312 recurses (left, mid) before (mid, right)).
    """

    t0s, t1s, parents = [], [], []

    def rec(t0, t1, level, parent):
        if level >= depth:
            return
        idx = len(t0s)
        t0s.append(t0)
        t1s.append(t1)
        parents.append(parent)
        tm = 0.5 * (t0 + t1)
        rec(t0, tm, level + 1, idx)
        rec(tm, t1, level + 1, idx)

    rec(0.0, 1.0, 0, -1)
    return (
        np.asarray(t0s, np.float64),
        np.asarray(t1s, np.float64),
        np.asarray(parents, np.int32),
    )


def bisection_depth(max_l1: float, eps: float = RRT_EPS) -> int:
    """Levels at which `L1 segment length > eps` can still hold."""

    depth = 0
    length = float(max_l1)
    while length > eps:
        depth += 1
        length *= 0.5
    return max(depth, 1)


# Max L1 length of a segment between valid 2D points is 4 ((-1,-1)->(1,1)).
_DEPTH_2D = bisection_depth(4.0)
# A stick is STICK_LENGTH long; its endpoint segment L1 <= sqrt(2)*len.
_DEPTH_STICK = bisection_depth(float(np.sqrt(2.0) * STICK_LENGTH))
# Interior stick interpolation: K = int(d / 0.015), d <= sqrt(8 + 0.4^2).
_K_MAX_3D = int(np.sqrt(8.0 + LIMITS[2] ** 2) / 0.015) + 2


# ---------------------------------------------------------------------------
# Device kernels (pure, jittable; vmap for batches)
# ---------------------------------------------------------------------------


def grid_coord(xy: jnp.ndarray, width: int) -> jnp.ndarray:
    """State -> grid coordinate (reference maze_env.py:236-239).

    Truncation toward zero equals floor here because xy >= -1 in all call
    sites (validity is checked first).
    """

    coord = ((xy + 1.0) * width / 2.0).astype(jnp.int32)
    return jnp.minimum(coord, width - 1)


class OccScene(NamedTuple):
    """Occupancy scene: the grid plus gather-free lookup tables.

    Tiny-table gathers serialize on the TPU VPU, so lookups are vectorized
    compares instead. Two forms, both bit-exact vs the grid gather:

    - `row_masks` (the default path): each grid row packed into one int32
      bitmask; a lookup is a W-wide row one-hot dotted with the masks plus
      a bit test — ~3W VPU ops per point.
    - `cells` (legacy path, kept for A/B): -1-padded flat ids of occupied
      cells; a lookup is `any(flat_id == cells)` over the fixed `cap`
      (~256 compares per point). The bitmap path replaced it for a ~7x
      cut in per-point compare work (tools/ab_occ.py).
    - `flat_words` (packed path, round 5): the whole W*W grid packed into
      ceil(W*W/32) int32 words indexed by the flat cell id; a lookup
      selects 1 of ~8 words (vs 1 of W rows) — about half the compare
      work of the row path at W=15. A/B'd in tools/ab_occ.py; the faster
      one on the device wins via `OCC_LOOKUP`.
    """

    occ: jnp.ndarray  # (W, W) occupancy grid, nonzero = obstacle
    cells: jnp.ndarray  # (K,) int32 flat ids of occupied cells, -1 pad
    row_masks: jnp.ndarray  # (W,) int32, bit j of entry i = occ[i, j]
    flat_words: jnp.ndarray  # (ceil(W*W/32),) int32 packed flat bitmap


def make_occ_scene(occ_map, cap: int = 256) -> OccScene:
    occ_np = np.asarray(occ_map)
    flat = np.flatnonzero(occ_np.reshape(-1) != 0).astype(np.int32)
    if len(flat) > cap:
        raise ValueError(f"{len(flat)} occupied cells exceed cap {cap}")
    cells = np.full(cap, -1, np.int32)
    cells[: len(flat)] = flat
    width = occ_np.shape[-1]
    if width > 31:  # row must fit an int32 bitmask
        raise ValueError(f"grid width {width} exceeds bitmap capacity 31")
    masks = (np.asarray(occ_np != 0, np.int64) << np.arange(width)).sum(1)
    n_words = -(-(width * width) // 32)
    occ_flat = np.flatnonzero(occ_np.reshape(-1) != 0)
    words = np.zeros(n_words, np.int64)
    np.bitwise_or.at(words, occ_flat >> 5, np.int64(1) << (occ_flat & 31))
    # int64 -> int32 bit pattern (bit 31 would overflow a signed int32)
    words = words.astype(np.uint32).view(np.int32)
    return OccScene(
        jnp.asarray(occ_np),
        jnp.asarray(cells),
        jnp.asarray(masks.astype(np.int32)),
        jnp.asarray(words),
    )


def _occ_width(occ) -> int:
    return (occ.occ if isinstance(occ, OccScene) else occ).shape[-1]


def _occ_at_cells(occ: OccScene, xy: jnp.ndarray) -> jnp.ndarray:
    """Legacy padded-cell-list compare (kept for tools/ab_occ.py)."""

    width = occ.occ.shape[-1]
    c = grid_coord(xy, width)
    flat = c[..., 0] * width + c[..., 1]
    return jnp.any(flat[..., None] == occ.cells, axis=-1)


# occupancy lookup strategy: "flat" (packed whole-grid bitmap, default) or
# "row" (per-row bitmasks). Both bit-exact; tools/ab_occ.py A/Bs them.
OCC_LOOKUP = "flat"


def _occ_at_rows(occ: OccScene, xy: jnp.ndarray) -> jnp.ndarray:
    """Row-bitmask lookup (the round-4 path; kept for A/B)."""

    width = occ.occ.shape[-1]
    c = grid_coord(xy, width)
    c0, c1 = c[..., 0], c[..., 1]
    # grid_coord clamps the upper side only; negatives (invalid states,
    # checked separately by callers) must read as "no obstacle" exactly
    # like the legacy flat-id compare.
    in_range = (c0 >= 0) & (c1 >= 0)
    sel = c0[..., None] == jnp.arange(width, dtype=c0.dtype)
    word = jnp.sum(jnp.where(sel, occ.row_masks, 0), axis=-1)
    bit = (word >> jnp.maximum(c1, 0)) & 1
    return in_range & (bit != 0)


def _occ_at_flat(occ: OccScene, xy: jnp.ndarray) -> jnp.ndarray:
    """Packed whole-grid bitmap lookup: select 1 of ceil(W^2/32) words by
    flat-id >> 5, then test bit flat-id & 31. Half the compare-select
    width of the row path at W=15 (8 words vs 15 rows)."""

    width = occ.occ.shape[-1]
    c = grid_coord(xy, width)
    c0, c1 = c[..., 0], c[..., 1]
    in_range = (c0 >= 0) & (c1 >= 0)
    flat = jnp.maximum(c0, 0) * width + jnp.maximum(c1, 0)
    n_words = occ.flat_words.shape[0]
    sel = (flat >> 5)[..., None] == jnp.arange(n_words, dtype=flat.dtype)
    word = jnp.sum(jnp.where(sel, occ.flat_words, 0), axis=-1)
    bit = (word >> (flat & 31)) & 1
    return in_range & (bit != 0)


def _occ_at(occ, xy: jnp.ndarray) -> jnp.ndarray:
    if isinstance(occ, OccScene):
        if OCC_LOOKUP == "flat":
            return _occ_at_flat(occ, xy)
        return _occ_at_rows(occ, xy)
    occ = jnp.asarray(occ)
    width = _occ_width(occ)
    c = grid_coord(xy, width)
    return occ[..., c[..., 0], c[..., 1]] != 0


def valid_state(q: jnp.ndarray) -> jnp.ndarray:
    """reference maze_env.py:266-268 (box bounds; theta bound for dim 3)."""

    lim = jnp.asarray(LIMITS[: q.shape[-1]], q.dtype)
    return jnp.all((q >= -lim) & (q <= lim), axis=-1)


def point_free_2d(occ: jnp.ndarray, xy: jnp.ndarray):
    """(free, n_checks) for a 2D point (reference maze_env.py:270-277).

    Invalid states are rejected *without* incrementing the counter.
    """

    valid = valid_state(xy)
    hit = _occ_at(occ, xy)
    free = valid & ~hit
    return free, valid.astype(jnp.int32)


def _segment_checks(occ: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, depth: int):
    """Bisection over segment [a, b], preorder short-circuit semantics.

    Returns (no_collision, n_midpoint_checks). Mirrors
    maze_env.py:301-314 given both endpoints already known free.
    """

    t0, t1, parent = _preorder_tree(depth)
    n = t0.shape[0]
    t0 = jnp.asarray(t0, a.dtype)[:, None]
    t1 = jnp.asarray(t1, a.dtype)[:, None]
    d = b - a
    lefts = a + t0 * d
    rights = a + t1 * d
    mids = a + 0.5 * (t0 + t1) * d

    width = _occ_width(occ)
    lc = grid_coord(lefts, width)
    rc = grid_coord(rights, width)
    coord_spread = jnp.sum(jnp.abs(lc - rc), axis=-1) > 1
    seg_len = jnp.sum(jnp.abs(lefts - rights), axis=-1) > RRT_EPS
    split = coord_spread & seg_len

    # visited[i] = split[i] and visited[parent[i]]; parents precede children
    # in preorder, so a static per-level pass finalises parents first.
    visited = split
    parent_j = jnp.asarray(np.where(parent < 0, 0, parent))
    is_root = jnp.asarray(parent < 0)
    # depth-1 passes reach fixed point for a tree of `depth` levels.
    for _ in range(depth - 1):
        visited = split & (is_root | visited[parent_j])

    mid_hit = _occ_at(occ, mids)  # valid by construction (endpoints valid)
    colliding = visited & mid_hit
    order = jnp.arange(n, dtype=jnp.int32)
    first_fail = jnp.min(jnp.where(colliding, order, _BIG))
    counted = visited & (order <= first_fail)
    return first_fail == _BIG, jnp.sum(counted.astype(jnp.int32))


def edge_free_2d(occ: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """(free, n_checks) for a 2D segment (reference maze_env.py:316-326).

    Order of operations (and hence the counter) matches the reference:
    validity (uncounted) -> endpoint a -> endpoint b -> bisection midpoints,
    each stage short-circuiting.
    """

    valid = valid_state(a) & valid_state(b)
    a_hit = _occ_at(occ, a)
    b_hit = _occ_at(occ, b)
    seg_free, seg_count = _segment_checks(occ, a, b, _DEPTH_2D)

    a_free = ~a_hit
    b_free = ~b_hit
    free = valid & a_free & b_free & seg_free
    count = jnp.where(
        valid,
        1 + jnp.where(a_free, 1 + jnp.where(b_free, seg_count, 0), 0),
        0,
    )
    return free, count.astype(jnp.int32)


def stick_endpoints(q: jnp.ndarray):
    """Stick endpoints from (x, y, theta) (reference maze_env.py:245-264)."""

    theta = q[..., 2] / LIMITS[2] * jnp.pi
    orient = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    center = q[..., :2]
    half = 0.5 * STICK_LENGTH
    return center - half * orient, center + half * orient


def stick_free_3d(occ: jnp.ndarray, q: jnp.ndarray):
    """(free, n_checks) for a stick config (reference maze_env.py:279-291)."""

    valid = valid_state(q)
    a, b = stick_endpoints(q)
    a_free, a_cnt = point_free_2d(occ, a)
    b_free, b_cnt = point_free_2d(occ, b)
    seg_free, seg_cnt = _segment_checks(occ, a, b, _DEPTH_STICK)

    free = valid & a_free & b_free & seg_free
    count = jnp.where(
        valid,
        a_cnt + jnp.where(a_free, b_cnt + jnp.where(b_free, seg_cnt, 0), 0),
        0,
    )
    return free, count.astype(jnp.int32)


def wrap_theta_disp(disp: jnp.ndarray) -> jnp.ndarray:
    """Wrap the angular displacement component (maze_env.py:329-335)."""

    t = disp[..., 2]
    lim = LIMITS[2]
    t = jnp.where(jnp.abs(t) > lim, t - jnp.sign(t) * 2 * lim, t)
    return disp.at[..., 2].set(t)


def maze_distance(a: jnp.ndarray, b: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Euclidean with angular wraparound for dim >= 3 (maze_env.py:137-149)."""

    diff = jnp.abs(b - a)
    if dim >= 3:
        t = jnp.minimum(diff[..., 2], jnp.abs(diff[..., 2] - 2 * LIMITS[2]))
        diff = jnp.concatenate([diff[..., :2], t[..., None]], axis=-1)
    return jnp.sqrt(jnp.sum(diff**2, axis=-1))


def edge_free_3d(occ: jnp.ndarray, q0: jnp.ndarray, q1: jnp.ndarray):
    """(free, n_checks) for a stick-maze edge (reference maze_env.py:316-347).

    Endpoint stick checks, then K = int(d / 0.015) interior sticks, each of
    which runs a *full 2D edge check between its endpoints* (including the
    two endpoint point-checks), short-circuiting at the first collision.
    """

    valid = valid_state(q0) & valid_state(q1)
    s0_free, s0_cnt = stick_free_3d(occ, q0)
    s1_free, s1_cnt = stick_free_3d(occ, q1)

    disp = wrap_theta_disp(q1 - q0)
    d = maze_distance(q0, q1, dim=3)
    K = (d / 0.015).astype(jnp.int32)

    ks = jnp.arange(1, _K_MAX_3D, dtype=q0.dtype)
    active = ks < K.astype(q0.dtype)
    cs = q0[None, :] + (ks / jnp.maximum(K, 1).astype(q0.dtype))[:, None] * disp[None, :]
    ca, cb = stick_endpoints(cs)
    in_free, in_cnt = jax.vmap(lambda x, y: edge_free_2d(occ, x, y))(ca, cb)

    failing = active & ~in_free
    order = jnp.arange(ks.shape[0], dtype=jnp.int32)
    first_fail = jnp.min(jnp.where(failing, order, _BIG))
    counted = active & (order <= first_fail)
    interior_cnt = jnp.sum(jnp.where(counted, in_cnt, 0))
    interior_free = first_fail == _BIG

    free = valid & s0_free & s1_free & interior_free
    count = jnp.where(
        valid,
        s0_cnt
        + jnp.where(s0_free, s1_cnt + jnp.where(s1_free, interior_cnt, 0), 0),
        0,
    )
    return free, count.astype(jnp.int32)


def maze_interpolate(a: jnp.ndarray, b: jnp.ndarray, ratio, dim: int) -> jnp.ndarray:
    """Steering with angular wrap for dim >= 3 (maze_env.py:151-172)."""

    diff = b - a
    if dim >= 3:
        diff = wrap_theta_disp(diff)
    new = a + diff * ratio
    if dim >= 3:
        new = wrap_theta_disp(new)
    return new


def maze_kernels(dim: int):
    """EnvKernels bundle for a maze dim (scene = occupancy grid)."""

    from gnn_motion_planning_tpu.envs.base import EnvKernels

    if dim == 2:
        return EnvKernels(
            state_free=point_free_2d,
            edge_free=edge_free_2d,
            distance=lambda a, b: maze_distance(a, b, 2),
            interpolate=lambda a, b, r: maze_interpolate(a, b, r, 2),
        )
    if dim == 3:
        return EnvKernels(
            state_free=stick_free_3d,
            edge_free=edge_free_3d,
            distance=lambda a, b: maze_distance(a, b, 3),
            interpolate=lambda a, b, r: maze_interpolate(a, b, r, 3),
        )
    raise ValueError(f"maze dim must be 2 or 3, got {dim}")


# ---------------------------------------------------------------------------
# Host wrapper (reference env protocol)
# ---------------------------------------------------------------------------


class MazeEnv:
    """Host-side maze env with the reference protocol (maze_env.py:5-347).

    Geometry runs in vectorised numpy; the per-call API (``_state_fp``,
    ``_edge_fp``) exists for baselines/drivers/tests — compiled planners use
    the device kernels above directly.
    """

    RRT_EPS = RRT_EPS
    voxel_r = 1.0 / 15

    def __init__(self, dim: int, map_file: Optional[str] = None):
        self.dim = dim
        self.config_dim = dim
        self.collision_check_count = 0
        from gnn_motion_planning_tpu.utils.assets import asset_path

        if map_file is None:
            map_file = f"maze_files/mazes_15_{dim}_3000.npz"
        with np.load(asset_path(map_file)) as f:
            self.maps = f["maps"]
            self.init_states = f["init_states"]
            self.goal_states = f["goal_states"]

        self.size = self.maps.shape[0]
        self.width = self.maps.shape[1]
        self.bound = (-1, -1, 1, 1) if dim == 2 else (-1, -1, -0.4, 1, 1, 0.4)
        self.order = list(range(self.size))
        self.episode_i = 0
        self.collision_point = None
        self.rng = None  # host RNG injected by set_random_seed / api layer

    def __str__(self):
        return "maze" + str(self.config_dim)

    # -- problem management -------------------------------------------------

    def init_new_problem(self, index: Optional[int] = None):
        if index is None:
            index = self.episode_i
        self.map = self.maps[self.order[index]]
        self.width = self.map.shape[0]
        self.init_state = self.init_states[self.order[index]]
        self.goal_state = self.goal_states[self.order[index]]
        self.episode_i = (self.episode_i + 1) % len(self.order)
        self.collision_point = None
        occ_idx = np.argwhere(self.map == 1)
        self.obstacles = occ_idx / self.map.shape[0] - 0.5
        self.collision_check_count = 0
        self._occ_scene = None  # rebuilt lazily for the new map
        return self.get_problem()

    def get_problem(self):
        return {
            "map": self.map,
            "init_state": self.init_state,
            "goal_state": self.goal_state,
        }

    def kernels(self):
        return maze_kernels(self.dim)

    def obs_tokens(self):
        """Obstacle tokens for model cross-attention, padded to the static
        per-env maximum (all grid cells)."""

        cap = self.width * self.width
        toks = np.zeros((cap, 2), np.float32)
        mask = np.zeros(cap, bool)
        n = len(self.obstacles)
        toks[:n] = self.obstacles
        mask[:n] = True
        return toks, mask

    def device_scene(self):
        """Scene arg consumed by the device kernels (grid + occupied-cell
        list for the gather-free lookup; cached per problem)."""

        if getattr(self, "_occ_scene", None) is None:
            self._occ_scene = make_occ_scene(self.map)
        return self._occ_scene

    # -- sampling ------------------------------------------------------------

    def _rand(self):
        return self.rng if self.rng is not None else np.random

    def uniform_sample(self, n: int = 1):
        sample = self._rand().uniform(
            -LIMITS[: self.dim], LIMITS[: self.dim], (n, self.dim)
        )
        return sample.reshape(-1) if n == 1 else sample

    @timed(Timer.SAMPLE)
    def sample_n_points(self, n: int, need_negative: bool = False):
        """Rejection sampling, stream-identical to maze_env.py:85-100.

        Vectorised: draws chunks from the owned RandomState and restores the
        state to un-draw overshoot past the n-th acceptance, so the consumed
        stream prefix equals the reference's one-at-a-time loop.
        """

        rng = self.rng
        samples: list = []
        negative: list = []
        if rng is None:
            # Fall back to exact per-sample draws on the global stream.
            while len(samples) < n:
                s = self.uniform_sample()
                if self._accept(s):
                    samples.append(s)
                elif need_negative:
                    negative.append(s)
            return (samples, negative) if need_negative else samples

        need = n
        while need > 0:
            chunk = max(2 * need, 64)
            state = rng.get_state()
            draws = rng.uniform(
                -LIMITS[: self.dim], LIMITS[: self.dim], (chunk, self.dim)
            )
            ok = self._accept_batch(draws, count=False)
            n_acc = int(np.cumsum(ok)[-1]) if len(ok) else 0
            if n_acc >= need:
                # position of the need-th acceptance; un-draw the rest
                stop = int(np.nonzero(np.cumsum(ok) == need)[0][0]) + 1
                rng.set_state(state)
                rng.uniform(
                    -LIMITS[: self.dim], LIMITS[: self.dim], (stop, self.dim)
                )
                draws, ok = draws[:stop], ok[:stop]
                need = 0
            else:
                need -= n_acc
            # replay the counter on the draws actually consumed (the chunked
            # decision pass above is count-free)
            self._accept_batch(draws, count=True)
            samples.extend(draws[ok])
            negative.extend(draws[~ok])
        return (samples, negative) if need_negative else samples

    def _accept(self, s: np.ndarray) -> bool:
        if self.dim == 2:
            return self._point_in_free_space(s)
        return self._stick_in_free_space(s)

    def _accept_batch(self, draws: np.ndarray, count: bool = True) -> np.ndarray:
        if not count:
            saved = self.collision_check_count
            out = np.array([self._accept(d) for d in draws], dtype=bool)
            self.collision_check_count = saved
            return out
        return np.array([self._accept(d) for d in draws], dtype=bool)

    def sample_empty_points(self):
        while True:
            point = self.uniform_sample()
            if self._accept(point):
                return point

    def set_random_init_goal(self):
        while True:
            init, goal = self.sample_empty_points(), self.sample_empty_points()
            if np.sum(np.abs(init - goal)) != 0:
                break
        self.init_state, self.goal_state = init, goal

    # -- metric geometry -----------------------------------------------------

    def distance(self, from_state, to_state):
        diff = np.abs(np.asarray(to_state) - np.asarray(from_state))
        if diff.ndim == 1:
            diff = diff.reshape(1, -1)
        if self.dim >= 3:
            diff[:, 2] = np.minimum(diff[:, 2], np.abs(diff[:, 2] - 2 * LIMITS[2]))
        return np.sqrt(np.sum(diff**2, axis=-1))

    def interpolate(self, from_state, to_state, ratio):
        diff = to_state - from_state
        if self.dim >= 3:
            if np.abs(diff[2]) > LIMITS[2]:
                diff[2] -= np.sign(diff[2]) * 2 * LIMITS[2]
        new_state = from_state + diff * ratio
        if self.dim >= 3:
            if np.abs(new_state[2]) > LIMITS[2]:
                new_state[2] -= np.sign(new_state[2]) * 2 * LIMITS[2]
        return new_state

    def in_goal_region(self, state):
        # distance() returns shape (1,) for single states; coerce so `done`
        # stays a scalar bool through env.step (the other envs already do)
        return bool(
            np.asarray(self.distance(state, self.goal_state)).reshape(-1)[0]
            < RRT_EPS
        ) and self._state_fp(state)

    def step(self, state, action=None, new_state=None, check_collision=True):
        if action is not None:
            new_state = state + action
        new_state[:2] = new_state[:2].clip(-LIMITS[:2], LIMITS[:2])
        if self.dim >= 3:
            if np.abs(new_state[2]) > LIMITS[2]:
                new_state[2] -= np.sign(new_state[2]) * 2 * LIMITS[2]
        action = new_state - state
        if not check_collision:
            return new_state, action
        no_collision = self._edge_fp(state, new_state)
        done = no_collision and self.in_goal_region(new_state)
        return new_state, action, no_collision, done

    # -- map rasters (model inputs) -------------------------------------------

    def obs_map(self, resolution=voxel_r):
        xs = np.arange(-1, 1, resolution)
        xs, ys = np.meshgrid(xs, xs)
        points = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
        coords = self._transform_batch(points)
        obs = self.map[coords[:, 0], coords[:, 1]] == 1
        return points, obs

    def free_map(self, w: int = 15):
        fx, fy = np.nonzero(self.map == 0)
        pts = np.stack([fx, fy], axis=-1) * 2.0 / w + (1.0 / w - 1.0)
        return [p for p in pts]

    def get_robot_points(self, config):
        return [config]

    def plot(self, path, make_gif: bool = False, save_path=None):
        """Headless render of the path sweep over the occupancy map. The
        reference MazeEnv ships no plot method (maze rendering lives in its
        utils/plot.py); this matches the other env families' protocol."""

        from gnn_motion_planning_tpu.utils.plot import plot_maze_path

        return plot_maze_path(self, path, make_gif=make_gif, save_path=save_path)

    # -- collision oracle (numpy host mirror of the device kernels) ----------

    def _transform(self, state, w=None):
        w = self.width if w is None else w
        coord = ((np.asarray(state)[:2].flatten() + 1.0) * w / 2.0).astype(int)
        coord[coord > w - 1] = w - 1
        return coord

    def _transform_batch(self, states: np.ndarray) -> np.ndarray:
        w = self.width
        coords = ((states[:, :2] + 1.0) * w / 2.0).astype(int)
        return np.minimum(coords, w - 1)

    def _valid_state(self, state):
        state = np.asarray(state)
        lim = LIMITS[: state.size]
        return bool((state >= -lim).all() and (state <= lim).all())

    def _point_in_free_space(self, state):
        state = np.asarray(state)
        if not self._valid_state(state):
            self.collision_point = state
            return False
        self.collision_check_count += 1
        c = self._transform(state)
        return self.map[c[0], c[1]] == 0

    def _stick_in_free_space(self, state):
        state = np.asarray(state)
        if not self._valid_state(state):
            return False
        a, b = self._stick_ends(state)
        if not self._point_in_free_space(a) or not self._point_in_free_space(b):
            self.collision_point = state
            return False
        return self._iterative_check_segment(a, b)

    @staticmethod
    def _stick_ends(state):
        theta = state[2] / LIMITS[2] * np.pi
        orient = np.array([np.cos(theta), np.sin(theta)])
        half = STICK_LENGTH / 2.0
        center = np.asarray(state[:2])
        return center - half * orient, center + half * orient

    @timed(Timer.VERTEX_CHECK)
    def _state_fp(self, state):
        state = np.asarray(state)
        if state.size == 2:
            return self._point_in_free_space(state)
        return self._stick_in_free_space(state)

    def _iterative_check_segment(self, left, right):
        lc = self._transform(left)
        rc = self._transform(right)
        if np.sum(np.abs(lc - rc)) > 1 and np.sum(np.abs(left - right)) > RRT_EPS:
            mid = (left + right) / 2.0
            if not self._point_in_free_space(mid):
                self.collision_point = mid
                return False
            return self._iterative_check_segment(
                left, mid
            ) and self._iterative_check_segment(mid, right)
        return True

    def _batch_edge_free(self, a, b):
        """Batched edge oracle (host numpy is already fast for the grid)."""

        free = np.zeros(len(a), bool)
        counts = np.zeros(len(a), np.int32)
        for i in range(len(a)):
            c0 = self.collision_check_count
            free[i] = self._edge_fp(np.asarray(a[i]), np.asarray(b[i]))
            counts[i] = self.collision_check_count - c0
        self.collision_check_count -= int(counts.sum())
        return free, counts

    @timed(Timer.EDGE_CHECK)
    def _edge_fp(self, state, new_state):
        state, new_state = np.asarray(state), np.asarray(new_state)
        if not self._valid_state(state) or not self._valid_state(new_state):
            return False
        if not self._state_fp(state) or not self._state_fp(new_state):
            return False
        if state.size == 2:
            return self._iterative_check_segment(state, new_state)

        disp = new_state - state
        if np.abs(disp[2]) > LIMITS[2]:
            disp[2] -= np.sign(disp[2]) * 2 * LIMITS[2]
        d = self.distance(state, new_state)
        K = int(np.asarray(d).reshape(-1)[0] / 0.015)
        for k in range(1, K):
            c = state + k * 1.0 / K * disp
            ca, cb = self._stick_ends(c)
            if not self._edge_fp(ca, cb):
                return False
        return True
