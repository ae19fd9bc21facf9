"""Section timer with the reference's tag taxonomy
(reference: environment/timer.py:6-26).

Append-only [start, end, tag] log; on TPU combine with jax.profiler traces
for device-side timelines (host tags bracket the dispatch sites).
"""

from __future__ import annotations

from time import time


class Timer:
    VERTEX_CHECK = 0
    SAMPLE = 1
    PLAN = 2
    CREATE = 3
    EDGE_CHECK = 4
    FORWARD = 5
    NN = 6
    EXPAND = 7
    HEAP = 8
    GPU = 9
    SHORTEST_PATH = 10

    def __init__(self):
        self.log = []
        self.st = None

    def start(self):
        self.st = time()

    def finish(self, action):
        self.log.append([float(self.st), time(), action])

    def total(self, action=None):
        return sum(
            e - s for s, e, a in self.log if action is None or a == action
        )

    def summary(self):
        tags = {}
        for s, e, a in self.log:
            tags[a] = tags.get(a, 0.0) + (e - s)
        return tags
