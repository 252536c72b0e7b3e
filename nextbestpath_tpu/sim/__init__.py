from .sensor import FramePoints, PointBuffer, backproject_sample, capture_depth
from .rollout import (
    TrajectoryBuffer,
    interpolate_pose,
    move_and_capture,
    observe_current,
)
from .tables import SceneTables, build_scene_tables
