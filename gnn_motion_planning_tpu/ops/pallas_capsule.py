"""Pallas TPU kernel for batched capsule-vs-AABB collision decisions.

The XLA path (`envs/geometry.py::seg_box_sq_dist` under `jax.vmap`) carries
the 3-vector coordinate axis in the minor dimension, so every elementwise op
runs on (…, 3)-shaped tiles — 3 of 128 VPU lanes do useful work. This kernel
flips the layout to structure-of-arrays: the *state batch* rides the 128-lane
axis, the capsules ride the sublane axis (C = 24–43 for the arm envs), and
only the 3 coordinate axes unroll — every op is a full (C, block) VPU tile.
Box parameters live in SMEM and a `fori_loop` walks the obstacle list, so
kernel code size is independent of the obstacle count.

The distance algorithm is the exact convex-bracket evaluation of
`seg_box_sq_dist` (same candidate set, same guards) so decisions are
bit-comparable; `tests/test_pallas_capsule.py` pins agreement against the
XLA path. Replaces the same PyBullet narrow-phase the XLA kernels replace
(reference environment/kuka_env.py:354-370).

Shipped per VERDICT r2 item 9 ("one production Pallas candidate with real
leverage"); `tools/ab_capsule.py` A/Bs it on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
_LANE = 128


def _seg_box_contact_rows(u, v, h, r2):
    """contact(C, B) for all capsules against one box, in SoA form.

    u, v: 3-tuples of (C, B) arrays — segment start minus box center, and
    segment direction, per axis. h: 3-tuple of scalars (box half-extents),
    r2: (C, 1) squared radii. Mirrors geometry.py::seg_box_sq_dist's
    candidate/bracket/vertex evaluation axis-unrolled.
    """

    zeros = jnp.zeros_like(u[0])
    ones = jnp.ones_like(u[0])

    cands = [zeros, ones]
    for i in range(3):
        ok = jnp.abs(v[i]) > _EPS
        safe = jnp.where(ok, v[i], 1.0)
        cands.append(jnp.clip(jnp.where(ok, (h[i] - u[i]) / safe, 0.0), 0.0, 1.0))
        cands.append(jnp.clip(jnp.where(ok, (-h[i] - u[i]) / safe, 0.0), 0.0, 1.0))

    def f(t):
        acc = zeros
        for i in range(3):
            w = u[i] + t * v[i]
            d = jnp.maximum(jnp.abs(w) - h[i], 0.0)
            acc = acc + d * d
        return acc

    def g(t):
        acc = zeros
        for i in range(3):
            w = u[i] + t * v[i]
            e = jnp.maximum(jnp.abs(w) - h[i], 0.0)
            acc = acc + 2.0 * jnp.sign(w) * e * v[i]
        return acc

    t_lo = zeros
    t_hi = ones
    for t in cands:
        gt = g(t)
        t_lo = jnp.maximum(t_lo, jnp.where(gt < 0, t, 0.0))
        t_hi = jnp.minimum(t_hi, jnp.where(gt > 0, t, 1.0))
    t_hi = jnp.maximum(t_hi, t_lo)

    mid = 0.5 * (t_lo + t_hi)
    num = zeros
    den = zeros
    for i in range(3):
        wm = u[i] + mid * v[i]
        active = jnp.abs(wm) > h[i]
        s = jnp.sign(wm)
        alpha = jnp.where(active, s * v[i], 0.0)
        beta = jnp.where(active, s * u[i] - h[i], 0.0)
        num = num + alpha * beta
        den = den + alpha * alpha
    t_star = jnp.clip(-num / jnp.maximum(den, _EPS), t_lo, t_hi)

    d2 = f(cands[0])
    for t in cands[1:] + [t_lo, t_hi, t_star]:
        d2 = jnp.minimum(d2, f(t))
    return d2 < r2


def _capsules_hit_kernel(boxes_ref, p0_ref, p1_ref, r2_ref, out_ref, *, O):
    """out[0, b] = 1.0 iff any (capsule, active box) pair is in contact.

    p0_ref/p1_ref: (3, C, Bt) SoA endpoints, r2_ref: (C, 1) squared radii
    (VMEM, broadcast over lanes). boxes_ref: (O, 8) SMEM rows
    [cx cy cz hx hy hz mask _], walked by a fori_loop.
    """

    p0 = [p0_ref[i] for i in range(3)]
    v = [p1_ref[i] - p0_ref[i] for i in range(3)]
    r2 = r2_ref[:]  # (C, 1)

    def body(o, hit):
        u = [p0[i] - boxes_ref[o, i] for i in range(3)]
        h = [boxes_ref[o, 3 + i] for i in range(3)]
        contact = _seg_box_contact_rows(u, v, h, r2)  # (C, Bt)
        return jnp.maximum(hit, contact.astype(hit.dtype) * boxes_ref[o, 6])

    hit = jax.lax.fori_loop(0, O, body, jnp.zeros_like(p0[0]))
    out_ref[0, :] = jnp.max(hit, axis=0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def capsules_hit(p0, p1, r, centers, halfs, mask, block: int = 1024,
                 interpret: bool = False):
    """Batched any-contact decision: (B,) bool from (B, C, 3) endpoints.

    p0, p1: (B, C, 3) capsule endpoints, r: (C,) radii,
    centers/halfs: (O, 3), mask: (O,) active-obstacle flags.
    """

    B, C, _ = p0.shape
    O = centers.shape[0]
    bp = max(block, _LANE)
    Bp = -(-B // bp) * bp

    # SoA relayout: (B, C, 3) -> (3, C, Bp); one transpose feeding a kernel
    # that then runs every op at full (C, block) tile width
    def soa(x):
        x = jnp.transpose(x, (2, 1, 0))
        return jnp.pad(x, ((0, 0), (0, 0), (0, Bp - B)))

    boxes = jnp.concatenate(
        [
            centers.astype(jnp.float32),
            halfs.astype(jnp.float32),
            mask.astype(jnp.float32)[:, None],
            jnp.zeros((O, 1), jnp.float32),
        ],
        axis=1,
    )
    r2 = (r.astype(jnp.float32) ** 2)[:, None]

    out = pl.pallas_call(
        functools.partial(_capsules_hit_kernel, O=O),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        grid=(Bp // bp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, C, bp), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, bp), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, soa(p0), soa(p1), r2)
    return out[0, :B] > 0.5
