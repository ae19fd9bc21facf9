"""gnn_motion_planning_tpu — a TPU-native motion-planning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rainorangelemon/gnn-motion-planning (Yu & Gao, NeurIPS 2021): GNN-guided
sampling-based motion planning with lazy collision checking, plus the
classical baselines (BIT*, LazySP, RRT*/NEXT, PRM+Dijkstra), over six robot
environments (2D/3D maze, 7-DoF snake, 6-DoF UR5, 7/13-DoF KUKA, 14-DoF
dual-KUKA).

Design principles (TPU-first, not a port):
  * collision checking / forward kinematics are batched, jit-compiled JAX
    kernels (the reference calls PyBullet one configuration at a time —
    reference: environment/kuka_env.py:354-411);
  * the GNN explorer/smoother are pure-functional JAX models with a
    torch-state-dict converter so the shipped checkpoints reproduce the
    reference numerics (reference: model.py:48-150, model_smoother.py:46-142);
  * planner search loops are lax.while_loop programs running entirely on
    device (reference: eval_gnn.py:168-276 is a Python loop);
  * scaling is SPMD: problems are sharded over a jax.sharding.Mesh, training
    is data-parallel via pjit (the reference is single-process only).
"""

__version__ = "0.1.0"

# Checkpoint numerical parity with the torch reference requires true-f32
# matmuls on the parity-sensitive paths (model linears/attention, FK, kNN
# Gram). Those call sites pass precision=HIGHEST explicitly (models/mlp.py
# PARITY_PRECISION, envs/kinematics.py, graphs/knn.py); everything else
# keeps default MXU precision.

# Honor JAX_PLATFORMS=cpu reliably: importing torch (the checkpoint
# converter does) re-registers the experimental axon TPU plugin, which
# overrides the env var unless the platform is also pinned via jax.config.
import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for every driver (eval, batched, serve,
# training), not just the test suite. Cold-process compiles dominate
# small-batch serving runs (profile_batched_kuka13.json: 96.7 of 160.9 s at
# lane width 8 is first-group compiles; steady-state lanes beat the scalar
# path 0.17 vs 0.46 s/problem) — the cache makes every process after the
# first start warm. Opt out with GNN_TPU_NO_COMPILE_CACHE=1; JAX's own
# JAX_COMPILATION_CACHE_DIR env var takes precedence when set.
if not _os.environ.get("GNN_TPU_NO_COMPILE_CACHE"):
    if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        import jax as _jax_cc

        _jax_cc.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        _jax_cc.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
