"""BIT* (Batch Informed Trees) — strongest classical baseline.

Algorithmically equivalent to the reference implementation (reference:
algorithm/bit_star.py:18-334): informed ellipsoid batch sampling, lazily
evaluated edge queue ordered by optimistic solution cost, vertex expansion
within a shrinking RGG radius, pruning on solution improvement.

TPU-native differences: candidate batches are collision-checked in one
device call instead of one PyBullet call per sample (the env's batched
oracle), neighbour scans are vectorised numpy instead of per-sample Python
loops, and the RNG is the owned per-env stream. The search control flow
(heaps, g-scores) stays on the host — it is latency- not compute-bound.
"""

from __future__ import annotations

import heapq
import math
from time import time

import numpy as np

INF = float("inf")


class BITStar:
    def __init__(
        self,
        environment,
        maxIter: int = 5,
        plot_flag: bool = False,
        batch_size: int = 200,
        T: int = 1000,
        sampling=None,
        timer=None,
    ):
        self.env = environment
        self.start = tuple(environment.init_state)
        self.goal = tuple(environment.goal_state)
        self.bounds = np.array(environment.bound).reshape((2, -1)).T
        self.ranges = self.bounds[:, 1] - self.bounds[:, 0]
        self.dimension = environment.config_dim

        self.vertices = []
        self.edges = {}
        self.g_scores = {}
        self.samples = []
        self.vertex_queue = []
        self.edge_queue = []
        self.old_vertices = set()

        self.maxIter = maxIter
        self.r = INF
        self.batch_size = batch_size
        self.T, self.T_max = 0, T
        self.eta = 1.1

        self.c_min = self.distance(self.start, self.goal)
        self.center_point = None
        self.C = None
        self.sampling = sampling if sampling is not None else self.informed_sample

        self.n_collision_points = 0
        self.n_free_points = 2
        self.deadline = None  # wall-clock bound honoured inside sampling

        from gnn_motion_planning_tpu.utils.timer import Timer

        # reference bit_star.py:19-23 timer protocol (tags: SAMPLE on
        # batch sampling, EXPAND on neighbour scans, HEAP on queue rebuilds)
        self.timer = timer if timer is not None else Timer()

    # -- sampling ------------------------------------------------------------

    def _rand(self):
        return self.env.rng if getattr(self.env, "rng", None) is not None else np.random

    def setup_planning(self):
        self.samples.append(self.goal)
        self.g_scores[self.goal] = INF
        self.vertices.append(self.start)
        self.g_scores[self.start] = 0
        self.informed_sample_init()
        return self.radius_init()

    def radius_init(self):
        from scipy import special

        n = self.dimension
        unit_ball_volume = np.pi ** (n / 2.0) / special.gamma(n / 2.0 + 1)
        volume = (
            np.abs(np.prod(self.ranges))
            * self.n_free_points
            / (self.n_collision_points + self.n_free_points)
        )
        gamma = (1.0 + 1.0 / n) * volume / unit_ball_volume
        return 2 * self.eta * (gamma ** (1.0 / n))

    def informed_sample_init(self):
        self.center_point = (np.asarray(self.start) + np.asarray(self.goal)) / 2.0
        a_1 = (np.asarray(self.goal) - np.asarray(self.start)) / self.c_min
        M = np.outer(a_1, np.ones(self.dimension))
        U, S, Vh = np.linalg.svd(M, 1, 1)
        det_scale = np.linalg.det(U) * np.linalg.det(Vh.T)
        self.C = U @ np.diag([1.0] * (self.dimension - 1) + [det_scale]) @ Vh

    def _draw_candidates(self, c_best, n):
        """n candidate points (vectorised informed/uniform draw)."""

        rng = self._rand()
        if c_best < INF:
            c_b = math.sqrt(max(c_best**2 - self.c_min**2, 0.0)) / 2.0
            L = np.diag([c_best / 2.0] + [c_b] * (self.dimension - 1))
            u = rng.normal(0, 1, (n, self.dimension))
            u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-12
            radii = rng.uniform(0, 1, n) ** (1.0 / self.dimension)
            x_ball = u * radii[:, None]
            return x_ball @ (self.C @ L).T + self.center_point
        return self.bounds[:, 0] + rng.uniform(0, 1, (n, self.dimension)) * self.ranges

    def _batch_point_free(self, pts: np.ndarray) -> np.ndarray:
        """Batched _state_fp with reference counting (one count per check)."""

        env = self.env
        if hasattr(env, "_batch_free"):
            free = env._batch_free(pts)
            env.collision_check_count += len(pts)
        else:
            free = np.array([env._state_fp(p) for p in pts], bool)
        self.n_free_points += int(free.sum())
        self.n_collision_points += int((~free).sum())
        return free

    def informed_sample(self, c_best, sample_num, vertices, max_rounds: int = 500):
        self.timer.start()
        out = []
        rounds = 0
        while len(out) < sample_num and rounds < max_rounds:
            rounds += 1
            cand = self._draw_candidates(c_best, max(sample_num - len(out), 32))
            free = self._batch_point_free(cand)
            out.extend(tuple(p) for p in cand[free])
            if self.deadline is not None and time() > self.deadline:
                break
        from gnn_motion_planning_tpu.utils.timer import Timer

        self.timer.finish(Timer.SAMPLE)
        return out[:sample_num]

    # -- scores --------------------------------------------------------------

    def get_g_score(self, point):
        if point == self.start:
            return 0
        if point not in self.edges:
            return INF
        return self.g_scores.get(point)

    def get_f_score(self, point):
        return self.heuristic_cost(self.start, point) + self.heuristic_cost(
            point, self.goal
        )

    def actual_edge_cost(self, point1, point2):
        if not self.env._edge_fp(np.array(point1), np.array(point2)):
            return INF
        return self.distance(point1, point2)

    def heuristic_cost(self, point1, point2):
        return self.distance(point1, point2)

    @staticmethod
    def distance(point1, point2):
        return float(np.linalg.norm(np.asarray(point1) - np.asarray(point2)))

    def get_edge_value(self, edge):
        return (
            self.get_g_score(edge[0])
            + self.heuristic_cost(edge[0], edge[1])
            + self.heuristic_cost(edge[1], self.goal)
        )

    def get_point_value(self, point):
        return self.get_g_score(point) + self.heuristic_cost(point, self.goal)

    # -- queue maintenance ---------------------------------------------------

    def bestVertexQueueValue(self):
        return self.vertex_queue[0][0] if self.vertex_queue else INF

    def bestEdgeQueueValue(self):
        return self.edge_queue[0][0] if self.edge_queue else INF

    def prune(self, c_best):
        self.samples = [p for p in self.samples if self.get_f_score(p) < c_best]
        for point, parent in list(self.edges.items()):
            if self.get_f_score(point) > c_best or self.get_f_score(parent) > c_best:
                self.edges.pop(point)
        vertices_temp = []
        for point in self.vertices:
            if self.get_f_score(point) <= c_best:
                if self.get_g_score(point) == INF:
                    self.samples.append(point)
                else:
                    vertices_temp.append(point)
        self.vertices = vertices_temp

    def expand_vertex(self, point):
        """Vectorised neighbour scan (reference bit_star.py:212-247 does a
        Python loop over every sample/vertex)."""
        from gnn_motion_planning_tpu.utils.timer import Timer

        self.timer.start()

        p = np.asarray(point)
        goal = np.asarray(self.goal)
        start = np.asarray(self.start)
        c_sol = self.g_scores[self.goal]

        if self.samples:
            s_arr = np.asarray(self.samples)
            d = np.linalg.norm(s_arr - p, axis=1)
            near = d <= self.r
            if near.any():
                h_start = np.linalg.norm(p - start)
                h_goal = np.linalg.norm(s_arr[near] - goal, axis=1)
                est_f = h_start + d[near] + h_goal
                g_p = self.get_g_score(point)
                for ok, sample, dd, hg in zip(
                    est_f < c_sol, np.nonzero(near)[0], d[near], h_goal
                ):
                    if ok:
                        nb = self.samples[sample]
                        heapq.heappush(
                            self.edge_queue,
                            (g_p + dd + hg, (point, nb)),
                        )

        if point not in self.old_vertices and self.vertices:
            v_arr = np.asarray(self.vertices)
            d = np.linalg.norm(v_arr - p, axis=1)
            near = np.nonzero(d <= self.r)[0]
            g_p = self.get_g_score(point)
            for vi in near:
                neighbor = self.vertices[vi]
                if neighbor not in self.edges or point != self.edges.get(neighbor):
                    est_f = (
                        self.heuristic_cost(self.start, point)
                        + d[vi]
                        + self.heuristic_cost(neighbor, self.goal)
                    )
                    if est_f < c_sol:
                        if g_p + d[vi] < self.get_g_score(neighbor):
                            heapq.heappush(
                                self.edge_queue,
                                (self.get_edge_value((point, neighbor)), (point, neighbor)),
                            )
        self.timer.finish(Timer.EXPAND)

    def get_best_path(self):
        path = []
        if self.g_scores[self.goal] != INF:
            path.append(self.goal)
            point = self.goal
            while point != self.start:
                point = self.edges[point]
                path.append(point)
            path.reverse()
        return path

    def path_length_calculate(self, path):
        return sum(self.distance(path[i], path[i + 1]) for i in range(len(path) - 1))

    # -- main loop (reference bit_star.py:266-334) ---------------------------

    def plan(self, pathLengthLimit, refine_time_budget=None, time_budget=None):
        collision_checks = self.env.collision_check_count
        if time_budget is None:
            time_budget = INF
        if refine_time_budget is None:
            refine_time_budget = 10

        self.setup_planning()
        init_time = time()
        if time_budget != INF:
            self.deadline = init_time + time_budget

        while self.T < self.T_max and (time() - init_time < time_budget):
            if not self.vertex_queue and not self.edge_queue:
                c_best = self.g_scores[self.goal]
                self.prune(c_best)
                self.samples.extend(self.sampling(c_best, self.batch_size, self.vertices))
                self.T += self.batch_size
                self.old_vertices = set(self.vertices)
                self.timer.start()
                self.vertex_queue = [
                    (self.get_point_value(p), p) for p in self.vertices
                ]
                heapq.heapify(self.vertex_queue)
                from gnn_motion_planning_tpu.utils.timer import Timer

                self.timer.finish(Timer.HEAP)
                q = len(self.vertices) + len(self.samples)
                self.r = self.radius_init() * (
                    (math.log(q) / q) ** (1.0 / self.dimension)
                )

            while self.vertex_queue and (
                self.bestVertexQueueValue() <= self.bestEdgeQueueValue()
            ):
                _, point = heapq.heappop(self.vertex_queue)
                self.expand_vertex(point)
            if not self.edge_queue:
                if not self.vertex_queue:
                    continue
                else:
                    raise RuntimeError("edge queue empty with vertices pending")

            best_edge_value, bestEdge = heapq.heappop(self.edge_queue)

            if best_edge_value < self.g_scores[self.goal]:
                actual_cost_of_edge = self.actual_edge_cost(bestEdge[0], bestEdge[1])
                actual_f_edge = (
                    self.heuristic_cost(self.start, bestEdge[0])
                    + actual_cost_of_edge
                    + self.heuristic_cost(bestEdge[1], self.goal)
                )
                if actual_f_edge < self.g_scores[self.goal]:
                    actual_g = self.get_g_score(bestEdge[0]) + actual_cost_of_edge
                    if actual_g < self.get_g_score(bestEdge[1]):
                        self.g_scores[bestEdge[1]] = actual_g
                        self.edges[bestEdge[1]] = bestEdge[0]
                        if bestEdge[1] not in self.vertices:
                            self.samples.remove(bestEdge[1])
                            self.vertices.append(bestEdge[1])
                            heapq.heappush(
                                self.vertex_queue,
                                (self.get_point_value(bestEdge[1]), bestEdge[1]),
                            )
                        # prune queued edges into the improved vertex that can
                        # no longer better it: keep (v, x) only while
                        # g(v) + c_hat(v, x) < g(x). The reference's filter
                        # (bit_star.py:320-322) self-compares g(v)+h < g(v),
                        # which is always false and silently drops every
                        # queued edge into x; this is the intended semantics.
                        self.edge_queue = [
                            item
                            for item in self.edge_queue
                            if item[1][1] != bestEdge[1]
                            or self.get_g_score(item[1][0])
                            + self.heuristic_cost(item[1][0], item[1][1])
                            < self.get_g_score(bestEdge[1])
                        ]
                        heapq.heapify(self.edge_queue)
            else:
                self.vertex_queue = []
                self.edge_queue = []
            if self.g_scores[self.goal] < pathLengthLimit and (
                time() - init_time > refine_time_budget
            ):
                break
        return (
            self.samples,
            self.edges,
            self.env.collision_check_count - collision_checks,
            self.g_scores[self.goal],
            self.T,
            time() - init_time,
        )
