from vcagan.train.models import VCAGANModules
from vcagan.train.schedule import multistep_schedule
from vcagan.train.state import GANTrainState, create_train_state
from vcagan.train.step import Batch, make_eval_step, make_train_step

__all__ = [
    "Batch",
    "GANTrainState",
    "VCAGANModules",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "multistep_schedule",
]
