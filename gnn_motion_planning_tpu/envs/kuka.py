"""KUKA iiwa environments (7-DoF, 13-DoF) — batched capsule collision.

Replaces the reference's PyBullet-backed arm env (reference:
environment/kuka_env.py:10-411): problems are the same pickled
(obstacles(halfExtents, basePosition), start, goal, demo_path) lists, the
robot is a capsule decomposition of the URDF meshes (envs/urdf.py), and the
collision oracle is batched FK + capsule-vs-AABB distance on device. The
host wrapper mirrors the reference protocol including collision-check
counting (kuka_env.py:354-370: every valid-state check counts, free or not)
and the fixed-step edge rule K = int(d / RRT_EPS) with k = 0..K-1
(kuka_env.py:389-411, re-checking the start point at k = 0).
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.base import (
    EnvKernels,
    K_CHEAP,
    make_fixed_step_edge_free,
)
from gnn_motion_planning_tpu.envs.geometry import seg_box_sq_dist
from gnn_motion_planning_tpu.envs.kinematics import (
    ChainParams,
    capsules_world,
    chain_from_model,
    fk_link_frames,
)
from gnn_motion_planning_tpu.envs.urdf import parse_urdf
from gnn_motion_planning_tpu.utils.assets import asset_path
from gnn_motion_planning_tpu.utils.timer import Timer, timed

_BIG = np.int32(1 << 30)
MAX_OBSTACLES = 16


def _apply_calibration(chain: ChainParams, urdf_relpath: str) -> ChainParams:
    """Shrink capsule radii by offsets calibrated against the shipped
    known-free configurations (tools/calibrate_capsules.py)."""

    import json
    from pathlib import Path

    try:
        cal_path = asset_path(f"calibration/{Path(urdf_relpath).stem}.json")
    except FileNotFoundError:
        return chain
    payload = json.loads(Path(cal_path).read_text())
    offsets = np.asarray(payload["radius_offsets"], np.float32)
    if offsets.shape[0] != chain.cap_r.shape[0]:
        return chain  # stale calibration for a different decomposition
    return chain._replace(cap_r=jnp.maximum(chain.cap_r - offsets, 1e-3))


class BoxScene(NamedTuple):
    """Padded axis-aligned obstacle set for one problem."""

    centers: jnp.ndarray  # (B, 3)
    halfs: jnp.ndarray  # (B, 3)
    mask: jnp.ndarray  # (B,) bool


def _coerce_vec3(x) -> np.ndarray:
    """Tolerate the shipped datasets' ragged entries (floats mixed with
    1-element arrays, e.g. ur5s_6_3000.pkl pillar obstacles)."""

    return np.array(
        [float(np.asarray(v).reshape(-1)[0]) for v in x], np.float32
    )


def make_box_scene(obstacles) -> BoxScene:
    centers = np.zeros((MAX_OBSTACLES, 3), np.float32)
    halfs = np.zeros((MAX_OBSTACLES, 3), np.float32)
    mask = np.zeros(MAX_OBSTACLES, bool)
    for i, (half, base) in enumerate(obstacles):
        halfs[i] = _coerce_vec3(half)
        centers[i] = _coerce_vec3(base)
        mask[i] = True
    return BoxScene(jnp.asarray(centers), jnp.asarray(halfs), jnp.asarray(mask))


def chain_state_free(chain: ChainParams, scene: BoxScene, q: jnp.ndarray):
    """(free, n_checks) for one configuration (kuka_env.py:354-370)."""

    valid = jnp.all((q >= chain.lower) & (q <= chain.upper))
    p0, p1, r = capsules_world(chain, q)
    d2 = seg_box_sq_dist(
        p0[:, None, :], p1[:, None, :], scene.centers[None], scene.halfs[None]
    )  # (C, B)
    contact = (d2 < (r[:, None] ** 2)) & scene.mask[None, :]
    free = valid & ~jnp.any(contact)
    return free, valid.astype(jnp.int32)


def make_chain_kernels(chain: ChainParams, rrt_eps: float, k_max: int) -> EnvKernels:
    """EnvKernels for a serial-chain robot among AABB obstacles."""

    def state_free(scene: BoxScene, q: jnp.ndarray):
        return chain_state_free(chain, scene, q)

    def distance(a: jnp.ndarray, b: jnp.ndarray):
        b = jnp.clip(b, chain.lower, chain.upper)
        return jnp.sqrt(jnp.sum((b - a) ** 2, axis=-1))

    def interpolate(a: jnp.ndarray, b: jnp.ndarray, ratio):
        new = a + (b - a) * ratio
        return jnp.clip(new, chain.lower, chain.upper)

    edge_free = make_fixed_step_edge_free(
        state_free, distance, chain.lower, chain.upper, rrt_eps, k_max
    )
    edge_free_cheap = None
    if k_max > K_CHEAP + 16:
        edge_free_cheap = make_fixed_step_edge_free(
            state_free, distance, chain.lower, chain.upper, rrt_eps,
            K_CHEAP, with_overflow=True,
        )

    # whole-batch states-free via the Pallas SoA narrow-phase kernel
    # (ops/pallas_capsule.py): ON by default on TPU — the chip A/B
    # (tools/ab_capsule.py, assets/benchmarks/ab_capsule.json) measures it
    # 1.77x (kuka7) / 1.70x (ur5 capsules) over vmap(state_free) with
    # bit-equal decisions (also pinned by tests/test_pallas_capsule.py).
    # GMP_PALLAS_CAPSULE=0 forces the XLA path; =1 forces Pallas even on
    # CPU (interpreter — tests only).
    batch_state_free = None
    _pallas_flag = os.environ.get("GMP_PALLAS_CAPSULE", "auto")
    if _pallas_flag == "1" or (
        _pallas_flag != "0" and jax.default_backend() == "tpu"
    ):
        from gnn_motion_planning_tpu.ops.pallas_capsule import capsules_hit

        def batch_state_free(scene: BoxScene, qs: jnp.ndarray):
            valid = jnp.all((qs >= chain.lower) & (qs <= chain.upper), axis=1)
            p0, p1, _ = jax.vmap(lambda q: capsules_world(chain, q))(qs)
            hit = capsules_hit(
                p0, p1, chain.cap_r, scene.centers, scene.halfs, scene.mask,
                # Mosaic targets the TPU; CPU (tests) runs the interpreter
                interpret=jax.default_backend() == "cpu",
            )
            return valid & ~hit, valid.astype(jnp.int32)

    return EnvKernels(
        state_free=state_free,
        edge_free=edge_free,
        distance=distance,
        interpolate=interpolate,
        batch_state_free=batch_state_free,
        edge_free_cheap=edge_free_cheap,
        bounds=(chain.lower, chain.upper),
    )


class KukaEnv:
    """Host wrapper with the reference env protocol (kuka_env.py:10-411)."""

    RRT_EPS = 0.5
    voxel_r = 0.1

    def __init__(
        self,
        GUI: bool = False,
        kuka_file: str = "kuka_iiwa/model_0.urdf",
        map_file: str = "maze_files/kukas_7_3000.pkl",
    ):
        self.dim = 3
        self.kuka_file = kuka_file
        self.collision_check_count = 0
        self.collision_point = None
        self.maps = {}
        self.rng = None

        model = parse_urdf(asset_path(kuka_file))
        self.model = model
        self.chain = _apply_calibration(chain_from_model(model), kuka_file)
        self.config_dim = model.config_dim
        self.pose_range = [
            (float(lo), float(hi)) for lo, hi in model.pose_range()
        ]
        self.bound = np.array(self.pose_range).T.reshape(-1)
        self.kukaEndEffectorIndex = self.config_dim - 1

        if map_file is None:
            self.problems = []
        else:
            with open(asset_path(map_file), "rb") as f:
                self.problems = pickle.load(f)
        self.order = list(range(len(self.problems)))
        self.episode_i = 0

        self._batch_state_free = None  # lazily jitted batch oracle
        self._native = None
        if type(self) is KukaEnv:  # single-chain fast path only
            try:
                from gnn_motion_planning_tpu.utils.geomcore import GeomChain

                self._native = GeomChain(self.chain, self.RRT_EPS)
            except Exception:
                self._native = None

    def set_problem_data(self, obstacles, start, goal, path=None):
        """Load a problem directly (dataset generation / ad-hoc scenes)."""

        self.index = -1
        self.collision_check_count = 0
        self.collision_point = None
        self.obstacles = obstacles
        self.init_state = np.asarray(start)
        self.goal_state = np.asarray(goal)
        self.path = path
        self._scene = make_box_scene(obstacles)
        self._set_native_scene()
        self._draw_pos = 0  # per-problem draw counter anchoring _bias_draws

    def __str__(self):
        return "kuka" + str(self.config_dim)

    # -- problem management --------------------------------------------------

    def init_new_problem(self, index: Optional[int] = None):
        if index is None:
            index = self.episode_i
        self.index = index
        obstacles, start, goal, path = self.problems[index]
        self.episode_i = (self.episode_i + 1) % len(self.order)
        self.collision_check_count = 0
        self.collision_point = None
        self.obstacles = obstacles
        self.init_state = np.asarray(start)
        self.goal_state = np.asarray(goal)
        self.path = path
        self._scene = make_box_scene(obstacles)
        self._set_native_scene()
        self._draw_pos = 0  # per-problem draw counter anchoring _bias_draws
        return self.get_problem()

    def _set_native_scene(self):
        if getattr(self, "_native", None) is not None:
            centers = np.stack([_coerce_vec3(b) for _, b in self.obstacles]) if self.obstacles else np.zeros((0, 3))
            halfs = np.stack([_coerce_vec3(h) for h, _ in self.obstacles]) if self.obstacles else np.zeros((0, 3))
            self._native.set_scene(centers, halfs)

    def device_scene(self) -> BoxScene:
        return self._scene

    def kernels(self) -> EnvKernels:
        return _kuka_kernels(self.chain, self.RRT_EPS, self._k_max())

    def _k_max(self) -> int:
        pr = np.array(self.pose_range)
        d_max = float(np.linalg.norm(pr[:, 1] - pr[:, 0]))
        return int(d_max / self.RRT_EPS) + 2

    def obs_tokens(self):
        toks = np.zeros((MAX_OBSTACLES, 6), np.float32)
        mask = np.zeros(MAX_OBSTACLES, bool)
        for i, (half, base) in enumerate(self.obstacles):
            toks[i, :3] = _coerce_vec3(half)
            toks[i, 3:] = _coerce_vec3(base)
            mask[i] = True
        return toks, mask

    def get_problem(self, width: int = 15, index: Optional[int] = None):
        if index is not None:
            return self.maps[index]
        problem = {
            "map": np.asarray(self.obs_map(width)[1]).astype(float),
            "init_state": self.init_state,
            "goal_state": self.goal_state,
        }
        self.maps[self.index] = problem
        return problem

    def obs_map(self, num: int):
        """15^3 voxelization with the z-0.4 translation quirk
        (kuka_env.py:145-166)."""

        resolution = 2.0 / (num - 1)
        grid = [np.linspace(-1.0, 1.0, num=num) for _ in range(3)]
        mesh = np.meshgrid(*grid)
        points_pos = np.concatenate(
            [m.reshape(-1, 1) for m in mesh], axis=-1
        )
        points_obs = np.zeros(points_pos.shape[0], bool)
        for obstacle_size, obstacle_base in self.obstacles:
            lo = _coerce_vec3(obstacle_base) - _coerce_vec3(obstacle_size)
            hi = _coerce_vec3(obstacle_base) + _coerce_vec3(obstacle_size)
            lo = lo.astype(float).copy()
            hi = hi.astype(float).copy()
            lo[2] -= 0.4
            hi[2] -= 0.4
            bools = []
            for i in range(3):
                m = np.zeros(num, bool)
                m[
                    max(int((lo[i] + 1) / resolution), 0) : min(
                        1 + int((hi[i] + 1) / resolution),
                        1 + int(2.0 / resolution),
                    )
                ] = True
                bools.append(m)
            cur = np.meshgrid(*bools)
            cur = np.concatenate([c.reshape(-1, 1) for c in cur], axis=-1)
            points_obs |= np.all(cur, axis=-1)
        return (
            points_pos.reshape((num, num, num, -1)),
            points_obs.reshape((num, num, num)),
        )

    def get_robot_points(self, config, end_point: bool = True):
        """FK workspace points with the z-0.4 shift (kuka_env.py:168-180)."""

        from gnn_motion_planning_tpu.envs.kinematics import link_translations

        ts = link_translations(self.chain, config)
        pts = ts[1:]  # child link frames = PyBullet link states
        pts = pts - np.array([0.0, 0.0, 0.4])
        if end_point:
            return tuple(pts[self.kukaEndEffectorIndex])
        return [tuple(p) for p in pts[: self.kukaEndEffectorIndex + 1]]

    # -- sampling ------------------------------------------------------------

    def _rand(self):
        return self.rng if self.rng is not None else np.random

    def uniform_sample(self, n: int = 1):
        pr = np.array(self.pose_range)
        sample = self._rand().uniform(pr[:, 0], pr[:, 1], (n, self.config_dim))
        return sample.reshape(-1) if n == 1 else sample

    # fraction of draws remapped when sampler_bias = "endpoint" is set
    _ENDPOINT_EVERY = 4

    def _bias_draws(self, draws: np.ndarray, offset: int = 0) -> np.ndarray:
        """Opt-in narrow-pocket sampler bias ("endpoint").

        Motivation: the kuka13 planner_miss triage
        (assets/benchmarks/miss_probe_kuka13.json) showed the failures are
        RGG disconnection at the endpoints — the init configuration has
        ZERO capsule-free straight-line edges to any of the 500 uniform
        samples (a tight C-space pocket), so no explorer can solve them at
        the protocol budget. The fix must put samples *inside the pocket*.

        Every ``_ENDPOINT_EVERY``-th draw (by absolute per-problem draw
        position ``offset`` = ``self._draw_pos`` — chunking-independent,
        like envs/snake.py::_bias_draws) is remapped into a concentrated
        neighborhood of init or goal (alternating): per joint,
        ``anchor + (2u-1)^3 * 0.25 * span`` where u is the original
        uniform draw — a pure per-row function of the stream, so the
        accept-rate chunking's replay stays exact and overall support is
        unchanged (unbiased rows remain uniform over the full box).

        Off by default; the reference-protocol rows never set
        ``env.sampler_bias``.
        """

        if getattr(self, "sampler_bias", None) is None:
            return draws
        if self.sampler_bias != "endpoint":
            raise ValueError(f"unknown sampler_bias {self.sampler_bias!r}")
        draws = draws.copy()
        pos = offset + np.arange(len(draws))
        idx = np.nonzero(pos % self._ENDPOINT_EVERY == 0)[0]
        if not len(idx):
            return draws
        pr = np.array(self.pose_range)
        span = pr[:, 1] - pr[:, 0]
        u = (draws[idx] - pr[:, 0]) / span
        off = (2.0 * u - 1.0) ** 3 * (0.25 * span)
        toward_goal = ((pos[idx] // self._ENDPOINT_EVERY) % 2 == 1)[:, None]
        anchor = np.where(
            toward_goal,
            np.asarray(self.goal_state, np.float64),
            np.asarray(self.init_state, np.float64),
        )
        draws[idx] = np.clip(anchor + off, pr[:, 0], pr[:, 1])
        return draws

    @timed(Timer.SAMPLE)
    def sample_n_points(self, n: int, need_negative: bool = False):
        """Chunked rejection sampling; stream-identical to
        kuka_env.py:194-209 (free/collide decisions from our oracle).

        Precision caveat: with the native core present, decisions come
        from the float64 host oracle; the float32 device kernels may
        disagree at contact boundaries (>99.5% agreement pinned by
        tests/test_geomcore.py), so the accepted-sample stream can
        differ from device-oracle runs recorded before the switch —
        see BASELINE.md "oracle precision" note."""

        rng = self.rng
        pr = np.array(self.pose_range)
        samples: list = []
        negative: list = []
        if rng is None:
            while len(samples) < n:
                s = self.uniform_sample()
                if self._state_fp_nocount(s):
                    self.collision_check_count += 1
                    samples.append(s)
                else:
                    self.collision_check_count += 1
                    if need_negative:
                        negative.append(s)
            return (samples, negative) if need_negative else samples

        need = n
        # accept-rate EMA sizes the chunk so one device RPC usually covers
        # the whole request (the tunnel roundtrip dominates at these batch
        # sizes). The stream is unchanged by chunk size: the consumed
        # prefix is replayed via rng.set_state below. Host-native oracles
        # pay per drawn state, so they keep the minimal 2x chunk.
        rate = getattr(self, "_accept_rate", None)
        adaptive = getattr(self, "_native", None) is None
        while need > 0:
            if adaptive and rate is not None:
                chunk = min(max(int(need / max(rate, 0.02) * 1.4), 512), 16384)
            else:
                chunk = max(2 * need, 512)  # few buckets -> few compiles
            state = rng.get_state()
            draws = self._bias_draws(
                rng.uniform(pr[:, 0], pr[:, 1], (chunk, self.config_dim)),
                offset=getattr(self, "_draw_pos", 0),
            )
            ok = self._batch_free(draws)
            n_acc = int(ok.sum())
            obs = n_acc / chunk
            rate = obs if rate is None else 0.8 * rate + 0.2 * obs
            self._accept_rate = rate
            if n_acc >= need:
                stop = int(np.nonzero(np.cumsum(ok) == need)[0][0]) + 1
                rng.set_state(state)
                rng.uniform(pr[:, 0], pr[:, 1], (stop, self.config_dim))
                draws, ok = draws[:stop], ok[:stop]
                need = 0
            else:
                need -= n_acc
            self._draw_pos = getattr(self, "_draw_pos", 0) + len(draws)
            self.collision_check_count += len(draws)
            samples.extend(draws[ok])
            negative.extend(draws[~ok])
        return (samples, negative) if need_negative else samples

    def sample_empty_points(self):
        while True:
            s = self.uniform_sample()
            if self._state_fp(s):
                return s

    def set_random_init_goal(self):
        while True:
            points = self.sample_n_points(n=2)
            init, goal = points[0], points[1]
            if np.sum(np.abs(init - goal)) != 0:
                break
        self.init_state, self.goal_state = init, goal

    def aug_path(self):
        """RRT_EPS-resolution densification of the stored demo path
        (reference kuka_env.py:118-131)."""

        result = [self.init_state]
        path = np.array(self.path)
        agent = np.array(path[0])
        next_index = 1
        while next_index < len(path):
            if np.linalg.norm(path[next_index] - agent) <= self.RRT_EPS:
                agent = path[next_index]
                next_index += 1
            else:
                agent = agent + self.RRT_EPS * (path[next_index] - agent) / np.linalg.norm(
                    path[next_index] - agent
                )
            result.append(np.array(agent))
        return result

    # -- metric geometry -----------------------------------------------------

    def distance(self, from_state, to_state):
        pr = np.array(self.pose_range)
        to_state = np.clip(to_state, pr[:, 0], pr[:, 1])
        return np.sqrt(np.sum((to_state - from_state) ** 2, axis=-1))

    def interpolate(self, from_state, to_state, ratio):
        pr = np.array(self.pose_range)
        new_state = from_state + (to_state - from_state) * ratio
        return np.clip(new_state, pr[:, 0], pr[:, 1])

    def in_goal_region(self, state):
        return bool(
            self.distance(state, self.goal_state) < self.RRT_EPS
            and self._state_fp(state)
        )

    def step(self, state, action=None, new_state=None, check_collision=True):
        if action is not None:
            new_state = state + action
        pr = np.array(self.pose_range)
        new_state = np.clip(new_state, pr[:, 0], pr[:, 1])
        action = new_state - state
        if not check_collision:
            return new_state, action
        no_collision = self._edge_fp(state, new_state)
        done = no_collision and self.in_goal_region(new_state)
        return new_state, action, no_collision, done

    # -- collision oracle (batched device kernels under the hood) ------------

    def _ensure_batch_fns(self):
        if self._batch_state_free is None:
            kern = self.kernels()

            @jax.jit
            def batch_free(scene, qs):
                if kern.batch_state_free is not None:
                    free, _ = kern.batch_state_free(scene, qs)
                else:
                    free, _ = jax.vmap(lambda q: kern.state_free(scene, q))(qs)
                return free

            self._batch_state_free = batch_free
        if getattr(self, "_edge_fp_dev", None) is None:
            kern = self.kernels()
            self._edge_fp_dev = jax.jit(kern.edge_free)
        if getattr(self, "_batch_edge_dev", None) is None:
            kern = self.kernels()

            @jax.jit
            def batch_edges(scene, a, b):
                return jax.vmap(lambda x, y: kern.edge_free(scene, x, y))(a, b)

            self._batch_edge_dev = batch_edges

    def _batch_edge_free(self, a: np.ndarray, b: np.ndarray):
        """Batched edge oracle: (free (n,), counts (n,)).

        Chunked to <=256 edges per device call: an edge check materialises
        (k_max, caps, boxes) interpolation work, and high-k_max envs
        (ur5/snake, eps=0.1) exceed HBM at larger chunks."""

        self._ensure_batch_fns()
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        n = len(a)
        CH = 256
        free = np.zeros(n, bool)
        cnt = np.zeros(n, np.int32)
        for s0 in range(0, n, CH):
            aa, bb = a[s0 : s0 + CH], b[s0 : s0 + CH]
            m = len(aa)
            if m < CH:
                pad = np.broadcast_to(aa[:1], (CH - m,) + aa.shape[1:])
                aa = np.concatenate([aa, pad])
                bb = np.concatenate([bb, np.broadcast_to(bb[:1], pad.shape)])
            fr, ct = self._batch_edge_dev(self._scene, jnp.asarray(aa), jnp.asarray(bb))
            free[s0 : s0 + m] = np.asarray(fr)[:m]
            cnt[s0 : s0 + m] = np.asarray(ct)[:m]
        return free, cnt

    def _batch_free(self, qs: np.ndarray) -> np.ndarray:
        """Batched point oracle; native core when available (no device
        round trip — the tunnel RPC dominates at planner batch sizes),
        else padded to power-of-two buckets so arbitrary chunk sizes share
        one compiled kernel."""

        if getattr(self, "_native", None) is not None:
            free, _ = self._native.states_free(np.asarray(qs, np.float64))
            return free
        self._ensure_batch_fns()
        qs = np.asarray(qs, np.float32)
        n = len(qs)
        bucket = max(64, 1 << (n - 1).bit_length())
        if bucket != n:
            qs = np.concatenate([qs, np.broadcast_to(qs[:1], (bucket - n,) + qs.shape[1:])])
        out = np.asarray(
            self._batch_state_free(self._scene, jnp.asarray(qs))
        )
        return out[:n]

    def _valid_state(self, state):
        pr = np.array(self.pose_range)
        return bool((state >= pr[:, 0]).all() and (state <= pr[:, 1]).all())

    def _state_fp_nocount(self, state) -> bool:
        if not self._valid_state(state):
            return False
        return bool(self._batch_free(np.asarray(state)[None])[0])

    def _point_in_free_space(self, state) -> bool:
        if not self._valid_state(state):
            return False
        if getattr(self, "_native", None) is not None:
            free_arr, _ = self._native.states_free(np.asarray(state)[None])
            self.collision_check_count += 1
            free = bool(free_arr[0])
        else:
            self.collision_check_count += 1
            free = bool(self._batch_free(np.asarray(state)[None])[0])
        if not free:
            self.collision_point = state
        return free

    @timed(Timer.VERTEX_CHECK)
    def _state_fp(self, state) -> bool:
        return self._point_in_free_space(state)

    @timed(Timer.EDGE_CHECK)
    def _edge_fp(self, state, new_state) -> bool:
        """One fused device call per edge (free/collide + reference count)."""

        state = np.asarray(state)
        new_state = np.asarray(new_state)
        if not self._valid_state(state) or not self._valid_state(new_state):
            return False
        if getattr(self, "_native", None) is not None:
            free, count = self._native.edge_free(state, new_state)
        else:
            self._ensure_batch_fns()
            free, count = self._edge_fp_dev(
                self._scene,
                jnp.asarray(state, jnp.float32),
                jnp.asarray(new_state, jnp.float32),
            )
            free, count = bool(free), int(count)
        self.collision_check_count += count
        if not free:
            self.collision_point = new_state
        return free

    def _render_segments(self, config):
        """World-frame capsule axis segments for rendering."""

        p0, p1, _ = capsules_world(self.chain, jnp.asarray(config, jnp.float32))
        return np.asarray(p0), np.asarray(p1)

    def plot(self, path, make_gif: bool = False, save_path=None):
        """Headless render of the path sweep (reference kuka_env.py:281-346:
        PyBullet GUI + camera frames; here matplotlib 3D off the same FK)."""

        from gnn_motion_planning_tpu.utils.plot import plot_arm_path

        return plot_arm_path(self, path, make_gif=make_gif, save_path=save_path)


def _kuka_kernels(chain: ChainParams, rrt_eps: float, k_max: int) -> EnvKernels:
    # ChainParams holds jnp arrays (unhashable); cache per (id, eps, k_max)
    cache = _kuka_kernels.__dict__.setdefault("_cache", {})
    key = (id(chain), rrt_eps, k_max)
    if key not in cache:
        cache[key] = make_chain_kernels(chain, rrt_eps, k_max)
    return cache[key]
