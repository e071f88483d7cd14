from rave_tpu.train.state import RaveTrainState, create_train_state
from rave_tpu.train.steps import build_train_steps, pick_phase
from rave_tpu.train.schedules import beta_factor

__all__ = [
    "RaveTrainState",
    "create_train_state",
    "build_train_steps",
    "pick_phase",
    "beta_factor",
]
