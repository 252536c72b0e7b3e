from .nbp_planning import NBPPlanningRollout, RolloutResult, test_nbp_planning
from .random_walk import random_walk_rollout
from .macarons_nbv import macarons_nbv_rollout
