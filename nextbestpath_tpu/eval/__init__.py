from .nbp_planning import NBPPlanningRollout, RolloutResult, test_nbp_planning
