"""A/B the capsule-vs-AABB batch kernel on the real chip: XLA vs Pallas.

Measures the batched states-free primitive (FK + narrow-phase) at planner
shapes on kuka7 and ur5 — the two single-chain envs whose hot loop is this
kernel (VERDICT r2 item 9). Three timed variants:

  xla       — jax.vmap(chain_state_free): (…, 3)-minor layout, XLA fusion
  pallas    — same FK, narrow-phase via ops/pallas_capsule.py (SoA lanes)
  pallas-np — narrow-phase only (endpoints precomputed), isolates the
              kernel from the shared FK cost

Writes assets/benchmarks/ab_capsule.json with ms/call and checks/s, and
asserts decision equality between the paths on every measured batch.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from time import time

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B = 1 << 16  # states per call (≈ one planner round's edge interior checks)
REPS = 30
INTERPRET = False  # --interpret: CPU smoke mode (tiny B, no timing value)


def bench(fn, *args):
    out = fn(*args)
    jax_block(out)
    t0 = time()
    for _ in range(REPS):
        out = fn(*args)
    jax_block(out)
    return (time() - t0) / REPS, out


def jax_block(x):
    import jax

    jax.tree.map(lambda a: a.block_until_ready(), x)


def main():
    import jax
    import jax.numpy as jnp

    from gnn_motion_planning_tpu.api.registry import str2env
    from gnn_motion_planning_tpu.envs.kinematics import capsules_world
    from gnn_motion_planning_tpu.envs.kuka import chain_state_free
    from gnn_motion_planning_tpu.ops.pallas_capsule import capsules_hit

    results = {"B": B, "reps": REPS, "device": str(jax.devices()[0])}
    for name in sys.argv[1:] or ["kuka7", "ur5"]:
        env, indexes = str2env(name)
        env.init_new_problem(int(indexes[0]))
        chain, scene = env.chain, env._scene
        rng = np.random.RandomState(0)
        lo, hi = np.asarray(chain.lower), np.asarray(chain.upper)
        qs = jnp.asarray(rng.uniform(lo, hi, (B, lo.shape[0])).astype(np.float32))

        xla_fn = jax.jit(
            lambda qs, scene=scene: jax.vmap(
                lambda q: chain_state_free(chain, scene, q)[0]
            )(qs)
        )

        fk = jax.jit(jax.vmap(lambda q: capsules_world(chain, q)[:2]))

        def pallas_full(qs, scene=scene, fk=fk):
            p0, p1 = fk(qs)
            return ~capsules_hit(
                p0, p1, chain.cap_r, scene.centers, scene.halfs, scene.mask,
                interpret=INTERPRET,
            )

        t_xla, free_xla = bench(xla_fn, qs)
        t_pal, free_pal = bench(jax.jit(pallas_full), qs)
        p0, p1 = fk(qs)
        jax_block((p0, p1))
        t_np, hit_np = bench(
            lambda p0, p1: capsules_hit(
                p0, p1, chain.cap_r, scene.centers, scene.halfs, scene.mask,
                interpret=INTERPRET,
            ),
            p0, p1,
        )

        # joint-limit validity is part of chain_state_free but not the
        # narrow-phase kernel; qs are sampled in-limits so decisions match
        agree = bool(jnp.all(free_xla == ~hit_np) & jnp.all(free_xla == free_pal))
        row = {
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "pallas_narrowphase_ms": round(t_np * 1e3, 3),
            "xla_Mchecks_s": round(B / t_xla / 1e6, 1),
            "pallas_Mchecks_s": round(B / t_pal / 1e6, 1),
            "speedup": round(t_xla / t_pal, 3),
            "decisions_agree": agree,
        }
        results[name] = row
        print(name, json.dumps(row), flush=True)
        assert agree, f"{name}: pallas/XLA decisions diverge"

    if not INTERPRET:
        out = REPO / "assets" / "benchmarks" / "ab_capsule.json"
        out.write_text(json.dumps(results, indent=1))
        print("->", out)


if __name__ == "__main__":
    if "--interpret" in sys.argv:
        sys.argv.remove("--interpret")
        INTERPRET = True
        B = 256
        REPS = 1
    main()
