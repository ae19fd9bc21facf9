"""GNN smoothing: model proposals projected onto the free space.

Equivalent of the reference's ``model_smooth`` pipeline (reference:
smoother.py:233-246 + proposed_path_smootherv2 smoother.py:194-216): five
outer iterations of {smoother-GNN proposal (loop=1), clamped steer toward
the proposal with per-node accept tests}. The projection's sequential
per-node accept scan and its K-step outer loop run as one compiled
``lax.while_loop``; collision-check counts are returned explicitly with the
reference's short-circuit semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_motion_planning_tpu.envs.base import EnvKernels


class _PCarry(NamedTuple):
    path: jnp.ndarray
    k: jnp.ndarray
    count: jnp.ndarray
    converged: jnp.ndarray
    overflow: jnp.ndarray


def make_projection_core(
    kernels: EnvKernels, rrt_eps: float, cheap: bool = False
):
    """Unjitted proposed_path_smootherv2 (smoother.py:194-216), vmap-able.

    Returns ``(path, count, overflow)``. With ``cheap=True`` (and the env
    providing ``edge_free_cheap``) every edge check runs at the small
    K_CHEAP interpolation budget — bit-identical results whenever
    ``overflow`` comes back False; True means a consumed check exceeded the
    budget and the caller must redo the whole projection with the full
    kernel. Only checks whose result feeds an accept decision or the count
    can raise the flag (the unconsumed prev-variant never does)."""

    use_cheap = cheap and getattr(kernels, "edge_free_cheap", None) is not None

    def project(scene, old_path, new_path, n_path):
        L = old_path.shape[0]
        idx = jnp.arange(L)
        live = idx < n_path
        disp = jnp.linalg.norm(old_path - new_path, axis=-1)
        K = jnp.ceil(jnp.max(jnp.where(live, disp, 0.0)) / rrt_eps).astype(jnp.int32)

        def cond(c: _PCarry):
            return (c.k < K) & ~c.converged

        def body(c: _PCarry) -> _PCarry:
            new = _body_step(c)
            frozen = (c.k >= K) | c.converged  # freeze finished lanes (vmap)
            return jax.tree.map(
                lambda old_v, new_v: jnp.where(frozen, old_v, new_v), c, new
            )

        def _body_step(c: _PCarry) -> _PCarry:
            # The reference sweep (smoother.py:203-214) is a Gauss-Seidel
            # chain: node i's accept test checks the segment to node i-1's
            # *updated* value. That value has only two possibilities —
            # cand_{i-1} (accepted) or old_{i-1} (kept) — so all edge
            # checks are hoisted out of the chain: ONE batched kernel
            # evaluates both prev variants plus the next-segment check for
            # every node, and a scalar boolean scan resolves acceptance.
            # Bit-identical to the sequential sweep (same checks, same
            # counts, same accumulation order) at ~1/L the sequential depth.
            path = c.path

            dist = jnp.linalg.norm(path - new_path, axis=-1)
            steer = jax.vmap(
                lambda a, b, r: kernels.interpolate(a, b, r)
            )(path, new_path, rrt_eps / jnp.maximum(dist, 1e-30))
            cand = jnp.where((dist < rrt_eps)[:, None], new_path, steer)

            i = jnp.arange(L)
            prev_old = path[jnp.maximum(i - 1, 0)]
            prev_cand = cand[jnp.maximum(i - 1, 0)]
            nxt = path[jnp.minimum(i + 1, L - 1)]
            if use_cheap:
                check = jax.vmap(
                    lambda a, b: kernels.edge_free_cheap(scene, a, b)
                )
                okA, cA, ovA = check(prev_old, cand)  # prev kept old value
                okB, cB, ovB = check(prev_cand, cand)  # prev accepted cand
                ok2, c2, ov2 = check(nxt, cand)
            else:
                check = jax.vmap(lambda a, b: kernels.edge_free(scene, a, b))
                okA, cA = check(prev_old, cand)
                okB, cB = check(prev_cand, cand)
                ok2, c2 = check(nxt, cand)
                ovA = ovB = ov2 = jnp.zeros(L, bool)
            interior = (i >= 1) & (i <= n_path - 2)
            dnorm = jnp.linalg.norm(cand - new_path, axis=-1)

            def resolve(carry, x):
                prev_acc, count, diff, ovf = carry
                (okA_i, cA_i, ovA_i, okB_i, cB_i, ovB_i,
                 ok2_i, c2_i, ov2_i, int_i, dn_i) = x
                ok1 = jnp.where(prev_acc, okB_i, okA_i)
                c1 = jnp.where(prev_acc, cB_i, cA_i)
                ov1 = jnp.where(prev_acc, ovB_i, ovA_i)
                acc = int_i & ok1 & ok2_i
                count = count + jnp.where(
                    int_i, c1 + jnp.where(ok1, c2_i, 0), 0
                )
                ovf = ovf | (int_i & (ov1 | (ok1 & ov2_i)))
                diff = diff + jnp.where(acc, dn_i, 0.0)
                return (acc, count, diff, ovf), acc

            (_, count, diff, ovf), accepted = jax.lax.scan(
                resolve,
                (jnp.asarray(False), c.count, jnp.float32(0.0), c.overflow),
                (okA, cA, ovA, okB, cB, ovB, ok2, c2, ov2, interior, dnorm),
            )
            outs = jnp.where(accepted[:, None], cand, path)
            return _PCarry(
                path=outs,
                k=c.k + 1,
                count=count,
                converged=diff < 1e-5,
                overflow=ovf,
            )

        init = _PCarry(
            path=old_path,
            k=jnp.int32(0),
            count=jnp.int32(0),
            converged=jnp.asarray(False),
            overflow=jnp.asarray(False),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out.path, out.count, out.overflow

    return project


def make_projection(kernels: EnvKernels, rrt_eps: float):
    """Jitted single-path projection (full interpolation budget)."""

    return jax.jit(make_projection_core(kernels, rrt_eps))


def make_projection_batch(
    kernels: EnvKernels, rrt_eps: float, cheap: bool = False
):
    """Jitted multi-lane projection (vmap over paths + scenes)."""

    return jax.jit(jax.vmap(make_projection_core(kernels, rrt_eps, cheap)))


def pad_to_bucket(n: int, step: int = 16) -> int:
    return max(step, ((n + step - 1) // step) * step)


def base_chain_edges(l_pad: int, n_path: int):
    """Path chain (both directions) + self loops with alive mask
    (smoother.py:238-241)."""

    src, dst, alive = [], [], []
    for i in range(1, l_pad):
        src.append(i)
        dst.append(i - 1)
        alive.append(i < n_path)
        src.append(i - 1)
        dst.append(i)
        alive.append(i < n_path)
    for i in range(l_pad):
        src.append(i)
        dst.append(i)
        alive.append(i < n_path)
    return (
        np.asarray(src, np.int32),
        np.asarray(dst, np.int32),
        np.asarray(alive, bool),
    )
