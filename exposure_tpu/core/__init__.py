from exposure_tpu.core.train_state import EmaState, TrainState, make_optimizer
from exposure_tpu.core.replay import PoolState
