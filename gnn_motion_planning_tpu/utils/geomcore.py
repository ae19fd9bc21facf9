"""ctypes bindings for the native host geometry core (runtime/geomcore.cpp).

Builds the shared library on first use (g++ -O3). Host-side planners use it
for per-call collision queries where a device round trip would dominate;
the math matches the JAX device kernels (tests/test_geomcore.py asserts
agreement).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "runtime" / "geomcore.cpp"
_LIB = _REPO / "runtime" / "libgeomcore.so"

_lib = None


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
        check=True,
        capture_output=True,
    )


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    d = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.geom_new_chain.restype = ctypes.c_int64
    lib.geom_new_chain.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int] + [d] * 3 + [i32] * 2 + [i32] + [d] * 5 + [ctypes.c_double]
    lib.geom_new_scene.restype = ctypes.c_int64
    lib.geom_new_scene.argtypes = [ctypes.c_int, d, d]
    lib.geom_free_scene.argtypes = [ctypes.c_int64]
    lib.geom_free_chain.argtypes = [ctypes.c_int64]
    lib.geom_free_dual.argtypes = [ctypes.c_int64]
    lib.geom_states_free.argtypes = [ctypes.c_int64, ctypes.c_int64, d, ctypes.c_int, u8, i32]
    lib.geom_edge_free.argtypes = [ctypes.c_int64, ctypes.c_int64, d, d, u8, i32]
    lib.geom_new_dual.restype = ctypes.c_int64
    lib.geom_new_dual.argtypes = [ctypes.c_int64, d, d]
    lib.geom_dual_states_free.argtypes = [ctypes.c_int64, ctypes.c_int64, d, ctypes.c_int, u8, i32]
    lib.geom_dual_edge_free.argtypes = [ctypes.c_int64, ctypes.c_int64, d, d, u8, i32]
    _lib = lib
    return lib


def _dp(a):
    return np.ascontiguousarray(a, np.float64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)
    )


def _ip(a):
    return np.ascontiguousarray(a, np.int32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int32)
    )


class GeomChain:
    """Native oracle bound to one ChainParams (single serial-chain robot
    among AABB obstacles — the kuka7/kuka13 case)."""

    def __init__(self, chain, rrt_eps: float):
        lib = get_lib()
        o_rot = np.asarray(chain.origin_rot, np.float64).reshape(-1, 9)
        self._keepalive = []

        def keep(a):
            a = np.ascontiguousarray(a)
            self._keepalive.append(a)
            return a

        J = o_rot.shape[0]
        C = np.asarray(chain.cap_r).shape[0]
        dof = np.asarray(chain.lower).shape[0]
        self.dof = dof
        self.handle = lib.geom_new_chain(
            J,
            C,
            dof,
            _dp(keep(o_rot)),
            _dp(keep(np.asarray(chain.origin_trans, np.float64))),
            _dp(keep(np.asarray(chain.axis, np.float64))),
            _ip(keep(np.asarray(chain.q_index, np.int32))),
            _ip(keep(np.asarray(chain.parent_frame, np.int32))),
            _ip(keep(np.asarray(chain.cap_link, np.int32))),
            _dp(keep(np.asarray(chain.cap_p0, np.float64))),
            _dp(keep(np.asarray(chain.cap_p1, np.float64))),
            _dp(keep(np.asarray(chain.cap_r, np.float64))),
            _dp(keep(np.asarray(chain.lower, np.float64))),
            _dp(keep(np.asarray(chain.upper, np.float64))),
            float(rrt_eps),
        )
        self._scene = None

    def set_scene(self, centers: np.ndarray, halfs: np.ndarray):
        lib = get_lib()
        if self._scene is not None:
            lib.geom_free_scene(self._scene)
        self._scene = lib.geom_new_scene(
            len(centers), _dp(np.asarray(centers, np.float64)), _dp(np.asarray(halfs, np.float64))
        )

    def states_free(self, qs: np.ndarray):
        lib = get_lib()
        qs = np.ascontiguousarray(qs, np.float64)
        n = len(qs)
        free = np.zeros(n, np.uint8)
        cnt = np.zeros(n, np.int32)
        lib.geom_states_free(
            self.handle,
            self._scene,
            _dp(qs),
            n,
            free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _ip_out(cnt),
        )
        return free.astype(bool), cnt

    def edge_free(self, qa: np.ndarray, qb: np.ndarray):
        lib = get_lib()
        free = np.zeros(1, np.uint8)
        cnt = np.zeros(1, np.int32)
        lib.geom_edge_free(
            self.handle,
            self._scene,
            _dp(np.asarray(qa, np.float64)),
            _dp(np.asarray(qb, np.float64)),
            free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _ip_out(cnt),
        )
        return bool(free[0]), int(cnt[0])

    def __del__(self):
        # free native handles; guarded because module globals may already be
        # torn down at interpreter shutdown
        try:
            if _lib is not None:
                if self._scene is not None:
                    _lib.geom_free_scene(self._scene)
                    self._scene = None
                _lib.geom_free_chain(self.handle)
        except Exception:
            pass


def _ip_out(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class GeomDual:
    """Native oracle for the dual-arm robot (kuka14): one chain at two base
    translations, box contact over both arms plus cross-arm capsule pairs
    (mirrors envs/kuka2.py::dual_state_free)."""

    def __init__(self, chain, base1, base2, rrt_eps: float):
        lib = get_lib()
        self._single = GeomChain(chain, rrt_eps)
        self.dof = 2 * self._single.dof
        self._b1 = np.ascontiguousarray(base1, np.float64)
        self._b2 = np.ascontiguousarray(base2, np.float64)
        self.handle = lib.geom_new_dual(
            self._single.handle, _dp(self._b1), _dp(self._b2)
        )
        self._scene = None

    def set_scene(self, centers: np.ndarray, halfs: np.ndarray):
        lib = get_lib()
        if self._scene is not None:
            lib.geom_free_scene(self._scene)
        self._scene = lib.geom_new_scene(
            len(centers), _dp(np.asarray(centers, np.float64)),
            _dp(np.asarray(halfs, np.float64)),
        )

    def states_free(self, qs: np.ndarray):
        lib = get_lib()
        qs = np.ascontiguousarray(qs, np.float64)
        n = len(qs)
        free = np.zeros(n, np.uint8)
        cnt = np.zeros(n, np.int32)
        lib.geom_dual_states_free(
            self.handle, self._scene, _dp(qs), n,
            free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _ip_out(cnt),
        )
        return free.astype(bool), cnt

    def edge_free(self, qa: np.ndarray, qb: np.ndarray):
        lib = get_lib()
        free = np.zeros(1, np.uint8)
        cnt = np.zeros(1, np.int32)
        lib.geom_dual_edge_free(
            self.handle, self._scene,
            _dp(np.asarray(qa, np.float64)), _dp(np.asarray(qb, np.float64)),
            free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _ip_out(cnt),
        )
        return bool(free[0]), int(cnt[0])

    def __del__(self):
        # free the dual handle before the owned GeomChain (self._single) is
        # collected — the native Dual references the Chain
        try:
            if _lib is not None:
                if self._scene is not None:
                    _lib.geom_free_scene(self._scene)
                    self._scene = None
                _lib.geom_free_dual(self.handle)
        except Exception:
            pass
