from exposure_tpu.utils.config import load_config, load_config_file
from exposure_tpu.utils.dict_util import Dict, merge_dict
from exposure_tpu.utils.logging_util import MedianWindow, MetricLogger, Tee
from exposure_tpu.utils.ops import (
    STATE_REWARD_DIM,
    STATE_STOPPED_DIM,
    STATE_STEP_DIM,
    STATE_DROPOUT_BEGIN,
    lerp,
    lrelu,
    rgb2lum,
    tanh01,
    tanh_range,
)
