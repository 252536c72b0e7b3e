from .replay import Experience, ReplayDB
from .collection import collect_trajectory
from .train_nbp import (
    PlateauScheduler,
    TrainState,
    init_train_state,
    train_epoch,
    train_nbp,
    validate,
)
