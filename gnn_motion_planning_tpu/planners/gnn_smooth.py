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


class _FCarry(NamedTuple):
    path: jnp.ndarray
    k: jnp.ndarray
    count: jnp.ndarray
    converged: jnp.ndarray
    overflow: jnp.ndarray


def make_projection_core_flat(
    kernels: EnvKernels, rrt_eps: float, slots: int = 4096
):
    """Flat-packed projection sweep: same semantics as
    :func:`make_projection_core`, executed at near the counted-check cost.

    The dense formulation evaluates 3 edge checks x L path slots x a static
    per-edge interpolation budget every Gauss-Seidel step — ~40x more
    collision states than the sweep actually counts (dead lanes, masked
    interpolation tails, non-interior nodes). Here each step packs exactly
    the states the reference sweep checks — per-edge K = int(d/RRT_EPS)
    points plus the two endpoint re-checks, interior nodes only — into one
    fixed ``slots``-wide state batch (TPU-friendly dense shape; the Pallas
    narrow-phase kernel consumes it whole when the env provides
    batch_state_free). Positions use the same f32 arithmetic as
    make_fixed_step_edge_free, so decisions, counts, and accepted waypoints
    are bit-identical. A step needing more than ``slots`` states raises the
    overflow flag and the caller redoes the projection with the full
    kernel (same contract as the cheap-budget path).

    Requires ``kernels.bounds``; returns None-equivalent behavior is the
    caller's job (use make_projection_core when bounds are missing).
    """

    assert kernels.bounds is not None, "flat projection needs kernel bounds"
    lower, upper = kernels.bounds
    state_free = kernels.state_free
    batch_free = kernels.batch_state_free

    def project(scene, old_path, new_path, n_path):
        L = old_path.shape[0]
        idx = jnp.arange(L)
        live = idx < n_path
        disp0 = jnp.linalg.norm(old_path - new_path, axis=-1)
        K_outer = jnp.ceil(
            jnp.max(jnp.where(live, disp0, 0.0)) / rrt_eps
        ).astype(jnp.int32)

        def cond(c: _FCarry):
            return (c.k < K_outer) & ~c.converged

        def body(c: _FCarry) -> _FCarry:
            new = _body_step(c)
            frozen = (c.k >= K_outer) | c.converged
            return jax.tree.map(
                lambda old_v, new_v: jnp.where(frozen, old_v, new_v), c, new
            )

        def _body_step(c: _FCarry) -> _FCarry:
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
            interior = (i >= 1) & (i <= n_path - 2)

            # --- flat-pack the 3L edge checks -------------------------------
            qa = jnp.concatenate([prev_old, prev_cand, nxt])  # (3L, d)
            qb = jnp.tile(cand, (3, 1))
            e_int = jnp.tile(interior, 3)
            valid_e = jnp.all(
                (qa >= lower) & (qa <= upper), axis=-1
            ) & jnp.all((qb >= lower) & (qb <= upper), axis=-1)
            d_e = jax.vmap(kernels.distance)(qa, qb)
            K_e = jnp.where(e_int, (d_e / rrt_eps).astype(jnp.int32), 0)
            n_slot = jnp.where(e_int, K_e + 2, 0)  # [qa, qb, interior...]
            cum = jnp.cumsum(n_slot)
            offs = cum - n_slot
            total = cum[-1]
            step_ovf = total > slots

            s = jnp.arange(slots)
            # edge owning each slot: first e with s < cum[e]
            eid = jnp.searchsorted(cum, s, side="right")
            eid = jnp.minimum(eid, 3 * L - 1)
            t = s - offs[eid]
            in_use = s < total
            qa_s = qa[eid]
            disp_s = (qb - qa)[eid]
            Kf = jnp.maximum(K_e[eid], 1).astype(qa.dtype)
            # t==0 -> qa endpoint, t==1 -> qb endpoint, t>=2 -> interior
            # point (t-2)/K along the segment (same f32 ops as edge_free)
            coeff = (t - 2).astype(qa.dtype) / Kf
            pt = jnp.where(
                (t == 0)[:, None],
                qa_s,
                jnp.where((t == 1)[:, None], qb[eid], qa_s + coeff[:, None] * disp_s),
            )
            if batch_free is not None:
                free_s, _ = batch_free(scene, pt)
            else:
                free_s, _ = jax.vmap(lambda q: state_free(scene, q))(pt)
            free_s = free_s | ~in_use

            # --- per-edge reduction -----------------------------------------
            off_c = jnp.minimum(offs, slots - 1)
            fa = free_s[off_c]
            fb = free_s[jnp.minimum(off_c + 1, slots - 1)]
            fail = in_use & (t >= 2) & ~free_s
            ff = jnp.full((3 * L,), _FBIG, jnp.int32).at[eid].min(
                jnp.where(fail, (t - 2).astype(jnp.int32), _FBIG)
            )
            int_free = ff == _FBIG
            int_cnt = jnp.where(int_free, K_e, ff + 1)
            ok_e = valid_e & fa & fb & int_free
            cnt_e = jnp.where(
                valid_e,
                1 + jnp.where(fa, 1 + jnp.where(fb, int_cnt, 0), 0),
                0,
            ).astype(jnp.int32)

            okA, okB, ok2 = ok_e[:L], ok_e[L : 2 * L], ok_e[2 * L :]
            cA, cB, c2 = cnt_e[:L], cnt_e[L : 2 * L], cnt_e[2 * L :]
            dnorm = jnp.linalg.norm(cand - new_path, axis=-1)

            def resolve(carry, x):
                prev_acc, count, diff = carry
                (okA_i, cA_i, okB_i, cB_i, ok2_i, c2_i, int_i, dn_i) = x
                ok1 = jnp.where(prev_acc, okB_i, okA_i)
                c1 = jnp.where(prev_acc, cB_i, cA_i)
                acc = int_i & ok1 & ok2_i
                count = count + jnp.where(
                    int_i, c1 + jnp.where(ok1, c2_i, 0), 0
                )
                diff = diff + jnp.where(acc, dn_i, 0.0)
                return (acc, count, diff), acc

            (_, count, diff), accepted = jax.lax.scan(
                resolve,
                (jnp.asarray(False), c.count, jnp.float32(0.0)),
                (okA, cA, okB, cB, ok2, c2, interior, dnorm),
            )
            outs = jnp.where(accepted[:, None], cand, path)
            return _FCarry(
                path=outs,
                k=c.k + 1,
                count=count,
                converged=diff < 1e-5,
                overflow=c.overflow | step_ovf,
            )

        init = _FCarry(
            path=old_path,
            k=jnp.int32(0),
            count=jnp.int32(0),
            converged=jnp.asarray(False),
            overflow=jnp.asarray(False),
        )
        out = jax.lax.while_loop(cond, body, init)
        return out.path, out.count, out.overflow

    return project


_FBIG = np.int32(1 << 30)


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
