from gnn_motion_planning_tpu.api.registry import str2env, str2name
from gnn_motion_planning_tpu.api.eval_gnn import eval_gnn, eval_gnn_pure, explore, path_cost

__all__ = ["str2env", "str2name", "eval_gnn", "eval_gnn_pure", "explore", "path_cost"]
