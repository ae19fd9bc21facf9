"""BIT* variants: supervision recording and multi-start forest.

* :class:`BITStarTrack` — records every explored node/edge including the
  collision points of failed edge checks; used to generate supervision and
  visualisation data (reference: algorithm/bit_star_track.py, diff at
  :145-157).
* :class:`BITStarTree` — plans from a *set* of start states toward one goal
  (tree/forest variant; reference: algorithm/bit_star_tree.py:18-96).
"""

from __future__ import annotations

import numpy as np

from gnn_motion_planning_tpu.planners.bit_star import INF, BITStar


class BITStarTrack(BITStar):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.explored_nodes = []
        self.explored_edges = []

    def actual_edge_cost(self, point1, point2):
        free = self.env._edge_fp(np.array(point1), np.array(point2))
        if point1 not in self.explored_nodes:
            self.explored_nodes.append(point1)
        id0 = self.explored_nodes.index(point1)
        if free:
            if point2 not in self.explored_nodes:
                self.explored_nodes.append(point2)
            id1 = self.explored_nodes.index(point2)
        else:
            collision_point = (
                tuple(self.env.collision_point)
                if self.env.collision_point is not None
                else point2
            )
            if collision_point not in self.explored_nodes:
                self.explored_nodes.append(collision_point)
            id1 = self.explored_nodes.index(collision_point)
        self.explored_edges.append((id0, id1))
        if not free:
            return INF
        return self.distance(point1, point2)


class BITStarTree(BITStar):
    """Multi-start BIT*: g(start_i) = 0 for every start; heuristics use the
    nearest start."""

    def __init__(self, environment, starts, **kwargs):
        super().__init__(environment, **kwargs)
        self.starts = [tuple(s) for s in starts]
        self.start = self.starts[0]
        self.c_min = min(self.distance(s, self.goal) for s in self.starts)

    def setup_planning(self):
        self.samples.append(self.goal)
        self.g_scores[self.goal] = INF
        for start in self.starts:
            self.vertices.append(start)
            self.g_scores[start] = 0
        self.informed_sample_init()
        return self.radius_init()

    def get_g_score(self, point):
        if point in self.starts:
            return 0
        if point not in self.edges:
            return INF
        return self.g_scores.get(point)

    def heuristic_cost(self, point1, point2):
        return self.distance(point1, point2)

    def get_f_score(self, point):
        src = min(self.heuristic_cost(s, point) for s in self.starts)
        return src + self.heuristic_cost(point, self.goal)

    def get_best_path(self):
        path = []
        if self.g_scores[self.goal] != INF:
            path.append(self.goal)
            point = self.goal
            while point not in self.starts:
                point = self.edges[point]
                path.append(point)
            path.reverse()
        return path
